"""--exact_stats: host cv2 stats land in sidecars/store, matching the reference
implementation exactly."""
import os

import numpy as np
from PIL import Image

from clip_assisted_data_labeling_tpu.config import EmbedConfig
from clip_assisted_data_labeling_tpu.ops.image_stats import (
    IMG_STAT_KEYS,
    image_stats_reference,
)
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

MODEL = "ViT-Test/tiny"


def test_exact_stats_match_reference(tmp_path, rng):
    root = tmp_path / "ds"
    root.mkdir()
    arrs = {}
    for i in range(3):
        arr = rng.integers(0, 256, (90, 120, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"u{i}.jpg", quality=95)
        arrs[f"u{i}"] = np.asarray(Image.open(root / f"u{i}.jpg").convert("RGB"))

    cfg = EmbedConfig(
        models_to_use=(MODEL,), batch_size=2, num_workers=1, canvas_size=256,
        compute_dtype="float32", shuffle_filenames=False, exact_stats=True,
    )
    embed_dataset(str(root), cfg)

    for uuid, arr in arrs.items():
        d = read_sidecar(str(root / f"{uuid}.pt"))[MODEL]
        golden = image_stats_reference(arr)
        for key in IMG_STAT_KEYS:
            assert abs(float(d[key]) - golden[key]) < 1e-5, (uuid, key)
