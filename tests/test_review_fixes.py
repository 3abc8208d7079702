"""Regression tests for the round-1 code-review findings."""
import os

import numpy as np
import pytest
from PIL import Image

from clip_assisted_data_labeling_tpu.config import DedupConfig, EmbedConfig
from clip_assisted_data_labeling_tpu.data.loader import BatchedImageLoader
from clip_assisted_data_labeling_tpu.pipeline.dedup import load_embeddings, run_dedup
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.pipeline.label import label_dataset
from clip_assisted_data_labeling_tpu.store.sidecar import write_sidecar
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend

MODEL = "ViT-Test/tiny"


def _make_imgs(directory, names, rng, size=(80, 100)):
    os.makedirs(directory, exist_ok=True)
    for name in names:
        arr = rng.integers(0, 256, (*size, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(directory, f"{name}.jpg"))


def test_nested_dataset_dedup_paths(tmp_path, rng):
    """Finding 1+4: store keeps relative paths; nested datasets dedup correctly."""
    root = tmp_path / "ds"
    _make_imgs(root, ["a"], rng)
    _make_imgs(root / "sub", ["b", "c"], rng)
    # plant duplicate of sub/b at top level
    img = np.asarray(Image.open(root / "sub" / "b.jpg"))
    Image.fromarray(img).save(root / "bdup.jpg", quality=98)

    cfg = EmbedConfig(models_to_use=(MODEL,), batch_size=4, num_workers=2,
                      canvas_size=256, compute_dtype="float32",
                      shuffle_filenames=False, with_image_stats=False)
    embed_dataset(str(root), cfg)

    paths, emb = load_embeddings(str(root), DedupConfig())
    assert len(paths) == 4
    assert all(os.path.exists(p) for p in paths), paths  # incl. sub/ entries

    res = run_dedup(str(root), DedupConfig(threshold=0.98, mode="copy"), use_mesh=False)
    assert len(res.rows) >= 1
    out = tmp_path / "near_duplicates_cosine_0.98"
    assert out.is_dir() and len(list(out.iterdir())) >= 2  # files actually copied


def test_duplicate_basenames_skipped_loudly(tmp_path, rng, caplog):
    root = tmp_path / "dupnames"
    _make_imgs(root, ["x"], rng)
    _make_imgs(root / "sub", ["x"], rng)  # same basename, different image
    cfg = EmbedConfig(models_to_use=(MODEL,), batch_size=2, num_workers=1,
                      canvas_size=256, compute_dtype="float32",
                      shuffle_filenames=False, with_image_stats=False)
    import logging

    with caplog.at_level(logging.WARNING):
        stores = embed_dataset(str(root), cfg)
    assert stores[MODEL].meta["n"] == 1
    assert any("Duplicate basename" in r.message for r in caplog.records)


def test_label_loop_terminates_when_all_labeled(tmp_path, rng):
    """Finding 2: fully-labeled dataset must not busy-spin forever."""
    root = tmp_path / "labeled"
    _make_imgs(root, ["u1", "u2"], rng)
    backend = HeadlessBackend(["5", "6", "quit"])
    db = label_dataset(str(root), backend, sort="uuid")
    assert db.n_labeled() == 2
    # second session with skip_labeled_files: nothing left — must return
    backend2 = HeadlessBackend(["9"])
    db2 = label_dataset(str(root), backend2, sort="uuid", skip_labeled_files=True)
    assert db2.n_labeled() == 2
    assert backend2.shown == []  # nothing displayed, clean exit


def test_backfill_resolves_reference_crop_names(tmp_path, rng):
    """Finding 3: sidecars written with plain subcrop names must backfill."""
    root = tmp_path / "refnames"
    _make_imgs(root, ["r1"], rng)
    # simulate a reference-toolkit sidecar: plain crop keys, all 4 crops
    write_sidecar(
        str(root / "r1.pt"), MODEL,
        {
            "centre_crop": rng.normal(0, 1, 16).astype(np.float32),
            "square_padded_crop": rng.normal(0, 1, 16).astype(np.float32),
            "subcrop1": rng.normal(0, 1, 16).astype(np.float32),
            "subcrop2": rng.normal(0, 1, 16).astype(np.float32),
        },
    )
    cfg = EmbedConfig(models_to_use=(MODEL,), batch_size=2, num_workers=1,
                      canvas_size=256, compute_dtype="float32",
                      shuffle_filenames=False, with_image_stats=False)
    stores = embed_dataset(str(root), cfg)  # skip-detected, then backfilled
    store = stores[MODEL]
    assert bool(store.valid[store.index_of("r1")])


def test_loader_abandoned_iteration_no_leak(tmp_path, rng):
    """Finding 8: breaking out of iteration must not wedge the producer."""
    import threading

    from tests.test_loader import make_dataset

    paths = make_dataset(tmp_path, rng, n=12)
    before = threading.active_count()
    loader = BatchedImageLoader(paths, canvas_size=256, out_size=56, batch_size=2,
                                prefetch_batches=1)
    for batch in loader:
        break  # abandon immediately
    # producer must wind down promptly
    import time

    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_encoder_standard_checkpoint_names(tmp_path):
    """Finding 5: pytorch_model.bin in --model_path must be found and converted."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from tests.test_vit_parity import SMALL, make_hf_model

    model = make_hf_model("quick_gelu")
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")

    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.models.vit import MODEL_REGISTRY, VitConfig

    MODEL_REGISTRY.setdefault(
        "ViT-Small/test",
        VitConfig(width=SMALL["hidden_size"], layers=SMALL["num_hidden_layers"],
                  heads=SMALL["num_attention_heads"], patch_size=SMALL["patch_size"],
                  image_size=SMALL["image_size"], embed_dim=SMALL["projection_dim"]),
    )
    enc = CLIPImageEncoder("ViT-Small/test", model_path=str(tmp_path),
                           compute_dtype="float32")
    # converted (not random): patch kernel matches the torch weights
    ref = model.state_dict()["vision_model.embeddings.patch_embedding.weight"]
    got = np.asarray(enc.params["patch_kernel"])
    np.testing.assert_allclose(
        got, ref.permute(2, 3, 1, 0).reshape(-1, ref.shape[0]).numpy(), atol=1e-6
    )


def test_find_model_prefers_newest(tmp_path):
    """Substring lookup must pick the newest checkpoint, not the first listing
    hit (stale-model prediction bug found in the round-1 system run)."""
    import time as _time

    from clip_assisted_data_labeling_tpu.pipeline.predict import find_model

    mdir = tmp_path / "models"
    mdir.mkdir()
    old = mdir / "regressor_2026-01-01_old.npz"
    old.write_bytes(b"old")
    new = mdir / "regressor_2026-06-01_new.npz"
    new.write_bytes(b"new")
    os.utime(old, (1, 1))
    assert find_model("regressor", str(mdir)) == str(new)
    assert find_model("missing", str(mdir)) is None


def test_aesthetic_with_img_stats(tmp_path, rng):
    """Finding 7: stats-trained regressors work in the standalone scorer."""
    import jax

    from clip_assisted_data_labeling_tpu.models.aesthetic import AestheticRegressor
    from clip_assisted_data_labeling_tpu.models.regressor import (
        RegressorMeta,
        SimpleFCRegressor,
    )

    meta = RegressorMeta(
        clip_models=(MODEL,), crop_names=("centre_crop",),
        input_size=16 + 22, hidden_sizes=(8,), use_img_stat_features=True,
    )
    model = SimpleFCRegressor.create(jax.random.key(0), meta)
    path = str(tmp_path / "statreg.npz")
    model.save(path)

    scorer = AestheticRegressor(path, canvas_size=256, verbose=0)
    img = Image.fromarray(rng.integers(0, 256, (80, 100, 3)).astype(np.uint8))
    score, feats = scorer.predict_score(img)
    assert feats.shape == (1, 38)
    assert 0.0 <= score <= 1.0


def test_encoder_dir_with_wrong_checkpoints_raises(tmp_path):
    """Round-3 self-review: a weights dir holding only OTHER models'
    checkpoints is a lookup MISS — random-init fallthrough would embed
    garbage. Also: the bare-architecture stem ('ViT-L-14.pt') must match
    'ViT-L-14/openai'."""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder

    # two files: a single checkpoint is (deliberately) assumed to be the model
    (tmp_path / "ViT-B-32.pt").write_bytes(b"not really a checkpoint")
    (tmp_path / "ViT-B-16.pt").write_bytes(b"not really a checkpoint")
    with pytest.raises(FileNotFoundError, match="none matches"):
        CLIPImageEncoder("ViT-Test/tiny", model_path=str(tmp_path),
                         compute_dtype="float32")


def test_stable_seed_distinct_per_model_name():
    """Round-3 self-review: random-init seeds must hash the WHOLE model name
    (a 4-byte prefix seed made every 'ViT-…' variant embed identically)."""
    from clip_assisted_data_labeling_tpu.models.encoders import _stable_seed

    names = ["ViT-L-14/openai", "ViT-L-14/laion2b_s32b_b82k",
             "ViT-L-14-336/openai", "ViT-B-32/openai"]
    seeds = {_stable_seed(n) for n in names}
    assert len(seeds) == len(names)


def test_regressor_predict_empty_matrix():
    """Round-3 self-review: zero rows (everything already labeled) must
    return an empty score array, not crash np.concatenate."""
    import jax

    from clip_assisted_data_labeling_tpu.models.regressor import (
        RegressorMeta,
        SimpleFCRegressor,
    )

    meta = RegressorMeta(clip_models=(MODEL,), crop_names=("centre_crop",),
                         input_size=8, hidden_sizes=(4,))
    model = SimpleFCRegressor.create(jax.random.key(0), meta)
    out = model.predict(np.zeros((0, 8), np.float32))
    assert out.shape == (0,) and out.dtype == np.float32


def test_check_calibration_rejects_foreign_npz(tmp_path):
    """Round-3 self-review: a non-calibration npz passed as --calibration must
    get the diagnostic ValueError, not a bare KeyError; a same-geometry file
    recorded for another model must be rejected by NAME."""
    from clip_assisted_data_labeling_tpu.models.encoders import (
        check_calibration,
        load_calibration,
        save_calibration,
    )
    from clip_assisted_data_labeling_tpu.models.vit import resolve_config

    cfg = resolve_config("ViT-Test/tiny")
    with pytest.raises(ValueError, match="not a calibration file"):
        check_calibration({"foo": np.zeros(3)}, cfg, "x.npz")
    p = str(tmp_path / "c.npz")
    save_calibration(p, {"act_amax": np.ones((cfg.layers, 4), np.float32)},
                     "PE-Same-Geometry/other")
    with pytest.raises(ValueError, match="calibrated for"):
        check_calibration(load_calibration(p), cfg, p, "ViT-Test/tiny")
