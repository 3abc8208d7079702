"""Detail behaviors: preview copies, dedup move mode, labeling navigation."""
import os

import numpy as np
from PIL import Image

from clip_assisted_data_labeling_tpu.config import DedupConfig, EmbedConfig
from clip_assisted_data_labeling_tpu.models.regressor import (
    RegressorMeta,
    SimpleFCRegressor,
)
from clip_assisted_data_labeling_tpu.pipeline.dedup import run_dedup
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.pipeline.label import label_dataset
from clip_assisted_data_labeling_tpu.pipeline.predict import predict_labels
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend

MODEL = "ViT-Test/tiny"


def _dataset(tmp_path, rng, n=5, plant_dup=False):
    root = tmp_path / "ds"
    root.mkdir()
    arrs = []
    for i in range(n):
        arr = rng.integers(0, 256, (70, 90, 3)).astype(np.uint8)
        arr[:, :45] = (50 * i) % 255
        arrs.append(arr)
        Image.fromarray(arr).save(root / f"u{i}.jpg", quality=95)
    if plant_dup:
        Image.fromarray(arrs[1]).save(root / "udup.jpg", quality=90)
    cfg = EmbedConfig(models_to_use=(MODEL,), batch_size=4, num_workers=1,
                      canvas_size=128, compute_dtype="float32",
                      shuffle_filenames=False, with_image_stats=False)
    embed_dataset(str(root), cfg)
    return root


def test_predict_preview_copies(tmp_path, rng):
    """copy_imgs_fraction=1.0 copies score-prefixed previews (reference _5:170-177)."""
    import jax

    root = _dataset(tmp_path, rng)
    meta = RegressorMeta(clip_models=(MODEL,), crop_names=("centre_crop",),
                         input_size=16, hidden_sizes=(8,))
    model = SimpleFCRegressor.create(jax.random.key(0), meta)
    mpath = str(tmp_path / "m.npz")
    model.save(mpath)

    n = predict_labels(str(root), mpath, batch_size=4, copy_imgs_fraction=1.0)
    assert n == 5
    preview = str(root) + "_predicted_scores"
    copies = sorted(os.listdir(preview))
    assert len(copies) == 5
    # names are "{score:.3f}_{uuid}.jpg"
    assert all(c.split("_", 1)[1].startswith("u") for c in copies)
    assert all(0.0 <= float(c.split("_", 1)[0]) <= 1.0 for c in copies)


def test_dedup_move_mode(tmp_path, rng):
    """move quarantines the TARGET file group out of the dataset (_2:102-125)."""
    root = _dataset(tmp_path, rng, plant_dup=True)
    n_before = len([f for f in os.listdir(root) if f.endswith(".jpg")])
    res = run_dedup(str(root), DedupConfig(threshold=0.98, mode="move"),
                    use_mesh=False)
    assert len(res.rows) >= 1
    out = tmp_path / "near_duplicates_cosine_0.98"
    moved = [f for f in os.listdir(out) if "_target_" in f and f.endswith(".jpg")]
    assert len(moved) >= 1
    n_after = len([f for f in os.listdir(root) if f.endswith(".jpg")])
    assert n_after == n_before - len(moved)  # targets gone from the dataset
    # source copies are NOT made in move mode (reference keeps the source)
    assert not any("_source_" in f and f.endswith(".jpg") for f in os.listdir(out))


def test_dedup_group_is_exact_stem(tmp_path, rng):
    """A duplicate's file group is its EXACT basename stem: sidecars/extras of
    unrelated files whose names merely CONTAIN the stem stay put (the
    reference's `stem in f` substring match swept them — PARITY #7)."""
    from clip_assisted_data_labeling_tpu.pipeline.dedup import fix_duplicate

    d = tmp_path / "grp"
    d.mkdir()
    for name in ("img_1.jpg", "img_1.txt", "img_10.jpg", "img_10.txt",
                 "ximg_1.jpg"):
        (d / name).write_bytes(b"x")
    out = tmp_path / "out"
    out.mkdir()
    fix_duplicate(0, (str(d / "img_10.jpg"), str(d / "img_1.jpg")),
                  str(out), 0.99, "move")
    left = sorted(os.listdir(d))
    # only img_1.* (the target group) moved; img_10.* and ximg_1.jpg stayed
    assert left == ["img_10.jpg", "img_10.txt", "ximg_1.jpg"]
    assert sorted(os.listdir(out)) == [
        "0.990_00000000_target_img_1.jpg", "0.990_00000000_target_img_1.txt"
    ]


def test_label_navigation_and_overwrite(tmp_path, rng):
    """left-arrow returns to the previous image; relabeling overwrites in place."""
    root = _dataset(tmp_path, rng, n=3)
    # label u0=3, go right past u1, come back left, label u1=9, label u1 again=2
    backend = HeadlessBackend(["3", "right", "left", "9", "2", "quit"])
    db = label_dataset(str(root), backend, sort="uuid", skip_labeled_files=False)
    assert db.get_label("u0") == 0.3
    # "9" labeled u1 (after right+left we're back on u1), "2" then labeled u2
    assert db.get_label("u1") == 0.9
    assert db.get_label("u2") == 0.2
    assert db.n_labeled() == 3
    # relabel u0 in a fresh session
    backend2 = HeadlessBackend(["7", "quit"])
    db2 = label_dataset(str(root), backend2, sort="uuid", skip_labeled_files=False)
    assert db2.get_label("u0") == 0.7
    assert len(db2.df) == 3  # upsert, no duplicate rows


def test_embed_int8_static_mode(tmp_path):
    """int8_static end-to-end through embed_dataset: lazy first-batch
    calibration engages, embeddings are unit-norm and close to the f32 run."""
    import numpy as np
    from PIL import Image

    from clip_assisted_data_labeling_tpu.config import EmbedConfig
    from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset

    root = tmp_path / "ds"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (90, 110, 3), dtype=np.uint8)
        ).save(root / f"img_{i:02d}.jpg", quality=95)

    base = dict(models_to_use=("ViT-Test/tiny",), batch_size=3, num_workers=1,
                canvas_size=128, shuffle_filenames=False,
                with_image_stats=False)
    s32 = embed_dataset(str(root), EmbedConfig(compute_dtype="float32", **base))["ViT-Test/tiny"]
    e32 = np.asarray(s32.embeddings[:])
    for f in root.glob("*.pt"):
        f.unlink()
    s8 = embed_dataset(
        str(root), EmbedConfig(compute_dtype="int8_static",
                               force_reencode=True, **base)
    )["ViT-Test/tiny"]
    e8 = np.asarray(s8.embeddings[:])
    assert e8.shape == e32.shape
    norms = np.linalg.norm(e8, axis=-1)
    np.testing.assert_allclose(norms[np.asarray(s8.valid)], 1.0, atol=2e-2)
    cos = np.sum(e8 * e32, axis=-1)[np.asarray(s8.valid)]
    assert np.all(cos > 0.99), cos.min()


def test_label_thumbnail_cache_one_read_per_image(tmp_path, rng, monkeypatch):
    """VERDICT r2 #9: back-and-forth navigation must hit the thumbnail LRU —
    exactly ONE disk read per distinct image across the whole script (the
    reference re-reads every view, _3_label_images.py:246-266)."""
    import clip_assisted_data_labeling_tpu.pipeline.label as label_mod

    root = _dataset(tmp_path, rng, n=3)
    reads: list[str] = []
    real_loader = label_mod.load_image_and_prompt

    def counting_loader(uuid, root_dir):
        reads.append(uuid)
        return real_loader(uuid, root_dir)

    monkeypatch.setattr(label_mod, "load_image_and_prompt", counting_loader)
    # visit u0,u1,u2 then bounce back and forth across all three twice
    keys = ["right", "right", "left", "left", "right", "right", "left",
            "left", "5", "quit"]
    backend = HeadlessBackend(keys)
    label_mod.label_dataset(str(root), backend, sort="uuid",
                            skip_labeled_files=False)
    assert len(backend.shown) == len(keys)  # every key saw a frame
    assert sorted(set(reads)) == ["u0", "u1", "u2"]
    assert len(reads) == 3, f"repeat views re-read from disk: {reads}"


def test_thumbnail_cache_eviction_and_none(tmp_path):
    """LRU capacity bounds memory; unloadable images cache as None (no
    re-probing) and evict like any entry."""
    from clip_assisted_data_labeling_tpu.pipeline.label import ThumbnailCache

    calls: list[str] = []

    def loader(uuid, root_dir):
        calls.append(uuid)
        if uuid == "broken":
            return None, ""
        return np.zeros((10, 20, 3), np.uint8), f"p-{uuid}"

    cache = ThumbnailCache(capacity=2, loader=loader)
    t0, p0 = cache.get("a", ".")
    assert t0.shape[2] == 3 and p0 == "p-a"
    cache.get("b", ".")
    cache.get("a", ".")          # hit — refreshes 'a'
    cache.get("c", ".")          # evicts 'b' (LRU)
    cache.get("a", ".")          # still cached
    cache.get("b", ".")          # re-load after eviction
    thumb, _ = cache.get("broken", ".")
    assert thumb is None
    assert cache.get("broken", ".")[0] is None  # cached None, not re-probed
    assert calls == ["a", "b", "c", "b", "broken"]
    assert cache.hits == 3 and cache.misses == 5


def test_embed_stage_default_dtype_is_int8_static(tmp_path, rng):
    """The embed stage defaults to the headline fast path (int8_static with
    pinned 'auto' calibration) — VERDICT r3 #7. A default-config run must
    produce unit embeddings plus the pinned <root>/<model>.calib.npz so
    re-runs are order- and resume-independent."""
    import torch

    assert EmbedConfig().compute_dtype == "int8_static"
    assert EmbedConfig().calibration == "auto"

    root = tmp_path / "fresh"
    root.mkdir()
    for i in range(3):
        arr = rng.integers(0, 256, (70, 90, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"u{i}.jpg", quality=95)
    embed_dataset(str(root), EmbedConfig(
        models_to_use=(MODEL,), batch_size=2, canvas_size=256,
        shuffle_filenames=False, with_image_stats=False))
    calib = [f for f in os.listdir(root) if f.endswith(".calib.npz")]
    assert calib, "int8_static default must pin its calibration file"
    pt = next(str(root / f) for f in os.listdir(root) if f.endswith(".pt"))
    d = torch.load(pt, weights_only=False)
    v = d[MODEL]["centre_crop"].numpy()
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-2)
