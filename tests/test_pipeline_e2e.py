"""End-to-end pipeline on a synthetic ~16-image dataset (SURVEY.md §4 test plan):
prep → embed → dedup(dry-run) → headless labeling → train → predict → subset,
exercising the CLIs' Python entry points and checking the on-disk contract after
every stage."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from clip_assisted_data_labeling_tpu.config import (
    ALL_CROPS,
    DedupConfig,
    EmbedConfig,
    SubsetConfig,
    TrainConfig,
)
from clip_assisted_data_labeling_tpu.pipeline.dedup import run_dedup
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.pipeline.label import label_dataset
from clip_assisted_data_labeling_tpu.pipeline.predict import predict_labels
from clip_assisted_data_labeling_tpu.pipeline.prep import prep_dataset_directory
from clip_assisted_data_labeling_tpu.pipeline.subset import copy_subset
from clip_assisted_data_labeling_tpu.pipeline.train import (
    load_training_data,
    save_model,
    train_regressor,
)
from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend

MODEL = "ViT-Test/tiny"


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    raw = base / "raw"
    raw.mkdir()
    rng = np.random.default_rng(11)
    # 14 distinct-ish images + one near-duplicate pair, with prompt sidecars
    imgs = []
    for i in range(14):
        w, h = int(rng.integers(600, 900)), int(rng.integers(400, 700))
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        arr[:, : w // 2] = (30 * i) % 255  # make images distinguishable
        imgs.append(arr)
        Image.fromarray(arr).save(raw / f"photo_{i:02d}.jpg", quality=95)
        (raw / f"photo_{i:02d}.txt").write_text(f"prompt number {i}")
    # plant a near-duplicate of image 3
    dup = np.clip(imgs[3].astype(int) + rng.integers(-2, 3, imgs[3].shape), 0, 255)
    Image.fromarray(dup.astype(np.uint8)).save(raw / "photo_dup.jpg", quality=95)

    data = base / "data"
    prep_dataset_directory(
        str(raw), str(data / "mydata"), mode="copy",
        max_n_pixels=640 * 640, convert_imgs_to_jpg=True, shuffle_file_order=False,
    )
    return base, data / "mydata"


def test_0_prep(pipeline_dirs):
    _base, root = pipeline_dirs
    jpgs = [f for f in os.listdir(root) if f.endswith(".jpg")]
    txts = [f for f in os.listdir(root) if f.endswith(".txt")]
    assert len(jpgs) == 15
    assert len(txts) == 14  # the planted duplicate has no prompt sidecar
    # uuid naming: 32-hex stems, image+sidecar share the stem
    stems = {os.path.splitext(f)[0] for f in jpgs}
    assert all(len(s) == 32 and all(c in "0123456789abcdef" for c in s) for s in stems)
    assert {os.path.splitext(f)[0] for f in txts} <= stems
    # resized below max_n_pixels
    for f in jpgs:
        with Image.open(root / f) as img:
            assert img.size[0] * img.size[1] <= 640 * 640 * 1.02


def test_1_embed(pipeline_dirs):
    _base, root = pipeline_dirs
    cfg = EmbedConfig(
        models_to_use=(MODEL,), batch_size=4, num_workers=2,
        canvas_size=768, compute_dtype="float32", shuffle_filenames=False,
    )
    stores = embed_dataset(str(root), cfg)
    store = stores[MODEL]
    assert store.meta["n"] == 15
    assert np.asarray(store.valid).all()

    # sidecars in reference layout
    pts = [f for f in os.listdir(root) if f.endswith(".pt")]
    assert len(pts) == 15
    d = read_sidecar(str(root / pts[0]))
    assert MODEL in d
    assert set(ALL_CROPS) <= set(d[MODEL].keys())
    assert d[MODEL]["centre_crop"].shape == (1, 16)
    assert "img_stat_mean_color" in d[MODEL]

    # store rows match sidecar values
    uuid = os.path.splitext(pts[0])[0]
    row = store.index_of(uuid)
    np.testing.assert_allclose(
        np.asarray(store.embeddings[row, 0], np.float32),
        d[MODEL]["centre_crop"].reshape(-1),
        atol=2e-3,
    )

    # incremental skip: second run embeds nothing new (all have the model key)
    stores2 = embed_dataset(str(root), cfg)
    assert np.asarray(stores2[MODEL].valid).all()


def test_2_dedup(pipeline_dirs):
    _base, root = pipeline_dirs
    # random-init tiny-ViT features cluster, so pick a threshold that isolates
    # the planted near-duplicate: just below the max pairwise cosine
    store = EmbeddingStore.open(str(root), MODEL)
    emb = np.asarray(store.embeddings[:, 1], np.float32)  # square_padded_crop
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = normed @ normed.T
    iu, ju = np.triu_indices(len(emb), k=1)
    thr = float(np.sort(sims[iu, ju])[-2] + 1e-4)  # keep exactly the top pair
    oracle = set(zip(iu[sims[iu, ju] > thr].tolist(), ju[sims[iu, ju] > thr].tolist()))
    assert len(oracle) == 1

    cfg = DedupConfig(threshold=thr, test=True, max_pairs_per_row=64)
    res = run_dedup(str(root), cfg, use_mesh=False)
    assert set(zip(res.rows.tolist(), res.cols.tolist())) == oracle
    res_sharded = run_dedup(str(root), cfg, use_mesh=True)
    assert set(zip(res_sharded.rows.tolist(), res_sharded.cols.tolist())) == oracle
    assert not res_sharded.overflow_rows.size


def test_3_label_headless(pipeline_dirs):
    _base, root = pipeline_dirs
    keys = [str(d) for d in [8, 2, 7, 3, 9, 1, 6, 4, 5, 8, 2, 7]] + ["quit"]
    backend = HeadlessBackend(keys)
    db = label_dataset(str(root), backend, sort="uuid")
    assert db.n_labeled() == 12
    assert len(backend.shown) == 13
    # autosave + final save produced the CSV next to root
    assert os.path.exists(db.path)
    # labels are key/10
    labels = db.df["label"].dropna().astype(float).values
    assert set(np.round(labels * 10).astype(int)) <= set(range(10))


def test_4_train(pipeline_dirs):
    base, root = pipeline_dirs
    cfg = TrainConfig(
        clip_models_to_use=("all",),
        crop_names=("centre_crop", "subcrop2_0.1"),
        n_epochs=6, batch_size=4, test_fraction=0.25, hidden_sizes=(16, 8),
        dropout_prob=0.2,
    )
    feats, labels, models = load_training_data(
        str(base / "data"), ["mydata"], ["all"], list(cfg.crop_names), False
    )
    assert models == [MODEL]
    assert feats.shape == (12, 32)  # 12 labeled, 2 crops × 16 dims
    model, history = train_regressor(feats, labels, cfg, models, plot_dir=str(base))
    assert len(history["train"]) == 6
    assert np.isfinite(history["train"]).all()
    assert (base / "training_progress.png").exists()

    os.makedirs(base / "models", exist_ok=True)
    path = save_model(model, history, cfg, out_dir=str(base / "models"))
    assert os.path.exists(path)
    assert "_imgs_6_epochs_" in os.path.basename(path)
    # stash for later stages
    pipeline_state["model_path"] = path


pipeline_state: dict = {}


def test_5_predict(pipeline_dirs):
    _base, root = pipeline_dirs
    # add a json sidecar to check predicted_label writeback
    some_uuid = next(
        os.path.splitext(f)[0] for f in sorted(os.listdir(root)) if f.endswith(".jpg")
    )
    with open(root / f"{some_uuid}.json", "w") as f:
        json.dump({"text_input": "hello"}, f)

    n = predict_labels(
        str(root), pipeline_state["model_path"], batch_size=8, copy_imgs_fraction=0.0
    )
    assert n == 15
    db = LabelDatabase.load_or_create(str(root))
    assert db.df["predicted_label"].notna().sum() == 15
    preds = db.df["predicted_label"].astype(float)
    assert ((preds >= 0) & (preds <= 1)).all()
    # human labels untouched
    assert db.n_labeled() == 12
    with open(root / f"{some_uuid}.json") as f:
        assert "predicted_label" in json.load(f)
    # histogram artifact
    parent = os.path.dirname(str(root))
    assert any("label_distribution" in f for f in os.listdir(parent))


def test_5b_predict_chunked_matches_single_chunk(pipeline_dirs, monkeypatch):
    """Multi-chunk prefetched assembly must score identically to the stage-5
    single-chunk run (same model, same stores, 4 chunks of 4)."""
    from clip_assisted_data_labeling_tpu.pipeline import predict as P

    _base, root = pipeline_dirs
    baseline = (
        LabelDatabase.load_or_create(str(root))
        .df.set_index("uuid")["predicted_label"].astype(float)
    )

    monkeypatch.setattr(P, "ASSEMBLE_CHUNK", 4)  # 15 imgs -> 4 chunks
    n = predict_labels(str(root), pipeline_state["model_path"],
                       batch_size=4, copy_imgs_fraction=0.0)
    assert n == 15
    got = (
        LabelDatabase.load_or_create(str(root))
        .df.set_index("uuid")["predicted_label"].astype(float)
    )
    np.testing.assert_allclose(
        got[baseline.index].values, baseline.values, rtol=0, atol=1e-6,
        err_msg="chunked predict diverged from the single-chunk scores",
    )


def test_prefetched_chunks_surfaces_worker_errors(monkeypatch):
    """A failure inside the background assembly thread must raise in the
    consumer (never hang the queue or silently truncate the run)."""
    import pytest

    from clip_assisted_data_labeling_tpu.pipeline import predict as P

    def fake_gather(root_dir, uuids, model, stores):
        if uuids[0] == "b":
            raise RuntimeError("boom in worker")
        return (list(uuids), None)

    monkeypatch.setattr(P, "_gather_features", fake_gather)
    gen = P._prefetched_chunks("root", ["a", "b", "c"], None, None, 1)
    assert next(gen)[0] == ["a"]
    with pytest.raises(RuntimeError, match="boom in worker"):
        list(gen)


def test_6_subset(pipeline_dirs):
    _base, root = pipeline_dirs
    cfg = SubsetConfig(min_score=0.0, max_score=1.0, min_n_pixels=100,
                       extensions=(".jpg", ".txt"))
    out = copy_subset(str(root), cfg)
    assert out is not None and os.path.isdir(out)
    assert out.endswith("_imgs")
    n_copied = len([f for f in os.listdir(out) if f.endswith(".jpg")])
    assert n_copied == 15

    # dry-run must copy nothing
    cfg_test = SubsetConfig(min_score=0.0, max_score=1.0, test=True)
    assert copy_subset(str(root), cfg_test) is None


def test_7_multi_model_embed_and_train(pipeline_dirs):
    """Second encoder merges into the same sidecars (reference multi-model loop,
    _1:207-215); training with both models concatenates their features."""
    base, root = pipeline_dirs
    cfg = EmbedConfig(
        models_to_use=("ViT-Test2/tiny",), batch_size=4, num_workers=2,
        canvas_size=768, compute_dtype="float32", shuffle_filenames=False,
    )
    embed_dataset(str(root), cfg)

    pts = [f for f in os.listdir(root) if f.endswith(".pt")]
    d = read_sidecar(str(root / pts[0]))
    assert set(d.keys()) == {MODEL, "ViT-Test2/tiny"}  # both models, merged

    feats, labels, models = load_training_data(
        str(base / "data"), ["mydata"], ["all"], ["centre_crop", "subcrop2_0.1"], False
    )
    assert sorted(models) == [MODEL, "ViT-Test2/tiny"]
    assert feats.shape[1] == 2 * 16 + 2 * 24  # crops × dims across both models


def test_8_embed_store_from_sidecars(pipeline_dirs):
    """A dataset embedded elsewhere (sidecars only) can build its store."""
    _base, root = pipeline_dirs
    import shutil

    store_dir = root / ".ctpu_store"
    shutil.rmtree(store_dir)
    uuid_paths = {
        os.path.splitext(f)[0]: str(root / f)
        for f in os.listdir(root)
        if f.endswith(".pt")
    }
    store = EmbeddingStore.from_sidecars(str(root), "auto", uuid_paths)
    assert store.meta["model_name"] == MODEL
    assert np.asarray(store.valid).sum() == 15
