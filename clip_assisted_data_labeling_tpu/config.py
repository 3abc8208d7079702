"""Shared dataclass config layer for all pipeline stages.

The reference scatters configuration across per-script argparse surfaces and
hardcoded module constants (e.g. crop subsets at _4_train_model.py:266-274, canvas
size at _3_label_images.py:96). Here every stage consumes typed dataclasses with a
single source of truth for defaults, while the stage CLIs mirror the reference's
flag names for drop-in familiarity.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


# Canonical crop names. The reference writes plain "subcrop1"/"subcrop2" keys in
# stage 1 (_1_embed_with_CLIP.py:200) but the trainer expects suffixed names
# ("subcrop1_0.15", _4_train_model.py:266). We standardize on the suffixed names
# (the trainer is the consumer that matters) and readers accept the plain names as
# aliases (see store.sidecar.resolve_crop_key).
CROP_CENTRE = "centre_crop"
CROP_SQUARE_PADDED = "square_padded_crop"
CROP_SUB1 = "subcrop1_0.15"
CROP_SUB2 = "subcrop2_0.1"
ALL_CROPS = (CROP_CENTRE, CROP_SQUARE_PADDED, CROP_SUB1, CROP_SUB2)
CROP_ALIASES = {"subcrop1": CROP_SUB1, "subcrop2": CROP_SUB2}

# Fractional areas of the two subcrops (reference utils/embedder.py:216).
SUBCROP_AREA_FRACTIONS = (0.15, 0.1)

# CLIP preprocessing normalization constants (reference utils/embedder.py:121-124).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# SigLIP checkpoints normalize with 0.5/0.5 (open_clip preprocess_cfg; the
# reference inherits whatever create_model_and_transforms returns, _1:72-75).
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".JPEG", ".JPG", ".PNG")

# CSV label database schema (reference _3_label_images.py:285).
DB_COLUMNS = ("uuid", "label", "timestamp", "predicted_label")


@dataclasses.dataclass(frozen=True)
class EmbedConfig:
    """Stage-1 embedding configuration (reference _1_embed_with_CLIP.py:186-215)."""

    models_to_use: Sequence[str] = ("ViT-L-14-336/openai",)
    batch_size: int = 64
    num_workers: int = 8
    force_reencode: bool = False
    model_path: str | None = None  # local weights dir
    crop_names: Sequence[str] = ALL_CROPS
    canvas_size: int = 1024  # host canvas; images larger than this get pre-downscaled
    # int8_static is the stage default (the headline fast path, ~39% over
    # bf16 at ViT-L-224): calibrated activation scales persist to
    # <root_dir>/<model>.calib.npz (calibration="auto" below) so embeddings
    # are dataset-order- and resume-independent, and the measured cosine
    # error vs f32 (9.1e-5, tests/test_quant.py) is far inside the ≤1e-3
    # parity budget. "bfloat16"/"float32" for strict-parity runs; conv
    # towers (RN*) downgrade to bfloat16 with a warning.
    compute_dtype: str = "int8_static"
    with_image_stats: bool = True
    exact_stats: bool = False  # host cv2 img_stat path (reference-exact values)
    host_index: int = 0  # multi-host scale-out: this host's shard of the file list
    host_count: int = 1
    shuffle_filenames: bool = True
    write_sidecars: bool = True  # reference-compatible .pt files alongside the store
    # int8_static calibration persistence: "auto" = <root_dir>/<model>.calib.npz,
    # "none" = in-memory only (order-dependent), else an explicit npz path
    calibration: str = "auto"
    # "native" (naflex towers only): additionally embed each image at its
    # NATIVE aspect ratio via the masked variable-patch-grid path
    # (models/naflex.py) and store it as a fifth pseudo-crop named
    # "native_aspect" in both the sidecar and the columnar store. Requires
    # compute_dtype bfloat16/float32 (the masked path has no int8
    # formulation). The 4 square crops are unchanged.
    aspect: str = "square"


@dataclasses.dataclass(frozen=True)
class DedupConfig:
    """Stage-2 near-duplicate removal (reference _2_remove_duplicates.py:128-144)."""

    threshold: float = 0.96
    mode: str = "copy"  # copy | move
    sim_type: str = "cosine"  # cosine | euclidean
    clip_model_to_use: str | None = None
    crop_to_use: str = CROP_SQUARE_PADDED
    chunk_size: int = 0  # 0 = no chunking (mesh-sharded path lifts the reference's 10k cap)
    test: bool = False
    max_pairs_per_row: int = 16  # fixed-capacity on-device pair emission per row block
    # on-device embedding format: int8 (half the H2D bytes; exact pair set via
    # f32 host recheck) or fp16 (reference parity format)
    wire: str = "int8"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Stage-4 regressor training (reference _4_train_model.py:240-276)."""

    clip_models_to_use: Sequence[str] = ("all",)
    crop_names: Sequence[str] = (CROP_CENTRE, CROP_SUB2)
    use_img_stat_features: bool = False
    test_fraction: float = 0.25
    n_epochs: int = 60
    batch_size: int = 16
    lr: float = 2e-4
    min_lr: float = 1e-6
    restart_epochs: int = 10
    weight_decay: float = 6e-4
    dropout_prob: float = 0.5
    hidden_sizes: Sequence[int] = (264, 128, 64)
    random_seed: int = 42
    model_name: str = "regressor"
    dont_save: bool = False
    export_torch: bool = False  # also write a reference-loadable .pth pickle
    print_network_layout: bool = False
    # classification head (reference README TODO "class labels +
    # classification"): distinct label values become softmax classes;
    # predictions are softmax-expected label values (CSV contract unchanged)
    classification: bool = False


@dataclasses.dataclass(frozen=True)
class PredictConfig:
    """Stage-5 batch prediction (reference _5_predict_labels.py:192-210)."""

    batch_size: int = 512
    copy_imgs_fraction: float = 0.01
    num_workers: int = 4


@dataclasses.dataclass(frozen=True)
class SubsetConfig:
    """Stage-6 subset export (reference _6_create_subset.py:76-88)."""

    min_score: float = 0.0
    max_score: float = 1.0
    extensions: Sequence[str] = (".jpg", ".txt", ".pt", ".pth")
    min_aspect_ratio: float = 0.25
    max_aspect_ratio: float = 4.0
    min_n_pixels: int = 512 * 512
    test: bool = False
