"""Tools: similarity search, dataset merge, subset copy, quarantine."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from clip_assisted_data_labeling_tpu.store.sidecar import write_sidecar
from clip_assisted_data_labeling_tpu.tools.find_similar_imgs import find_similar_imgs
from clip_assisted_data_labeling_tpu.tools.fix_img_dir import quarantine_unreadable
from clip_assisted_data_labeling_tpu.tools.merge_datasets import merge_datasets
from clip_assisted_data_labeling_tpu.tools.move_subset_of_files import (
    copy_files,
    group_by_stem,
)

MODEL = "ViT-B-32/openai"


def _write_img_and_sidecar(directory, name, emb, rng):
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    Image.fromarray(img).save(directory / f"{name}.jpg")
    write_sidecar(str(directory / f"{name}.pt"), MODEL, {"square_padded_crop": emb})


def test_find_similar_imgs(tmp_path, rng):
    ctx = tmp_path / "ctx"
    search = tmp_path / "search"
    out = tmp_path / "out"
    ctx.mkdir()
    search.mkdir()
    base = rng.normal(0, 1, 8).astype(np.float32)
    for i in range(3):
        _write_img_and_sidecar(ctx, f"c{i}", base + rng.normal(0, 0.01, 8).astype(np.float32), rng)
    # one near-context image, two far
    _write_img_and_sidecar(search, "near", base + rng.normal(0, 0.01, 8).astype(np.float32), rng)
    _write_img_and_sidecar(search, "far1", -base, rng)
    _write_img_and_sidecar(search, "far2", rng.normal(5, 1, 8).astype(np.float32), rng)

    results = find_similar_imgs(
        str(ctx), str(search), str(out), ["all"], "square_padded_crop", "cosine", 1
    )
    assert len(results) == 1
    assert results[0][1].endswith("near.jpg")
    assert len(os.listdir(out)) == 1

    results_l2 = find_similar_imgs(
        str(ctx), str(search), str(tmp_path / "out2"), [MODEL],
        "square_padded_crop", "l2", 2
    )
    assert results_l2[0][1].endswith("near.jpg")


def test_find_similar_imgs_store_backed(tmp_path, rng):
    """With a columnar store present, the search-dir gather skips the sidecar
    walk and returns the same winner; an invalid store row is excluded."""
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore

    ctx = tmp_path / "ctx"
    search = tmp_path / "search"
    ctx.mkdir()
    search.mkdir()
    base = rng.normal(0, 1, 8).astype(np.float32)
    for i in range(2):
        _write_img_and_sidecar(ctx, f"c{i}", base + rng.normal(0, 0.01, 8).astype(np.float32), rng)
    # search dir: store only (no .pt sidecars needed on this path) + images
    names = ["near", "far1", "badrow"]
    embs = np.stack([
        base + rng.normal(0, 0.01, 8).astype(np.float32),
        -base,
        base,  # most similar of all — but its row is invalid
    ])[:, None, :]
    st = EmbeddingStore.create(str(search), MODEL, ["square_padded_crop"], 8,
                               names, with_stats=False)
    st.write_rows(0, embs, valid=np.asarray([True, True, False]))
    st.flush()
    for u in names:
        Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(
            search / f"{u}.jpg"
        )

    results = find_similar_imgs(
        str(ctx), str(search), str(tmp_path / "out"), ["all"],
        "square_padded_crop", "cosine", 1
    )
    assert len(results) == 1
    assert results[0][1].endswith("near.jpg")  # badrow excluded despite sim=1


def test_merge_datasets(tmp_path, rng):
    data = tmp_path / "data"
    out = tmp_path / "merged"
    for name, labels in [("ds1", [0.5, None]), ("ds2", [None, 0.8])]:
        d = data / name
        d.mkdir(parents=True)
        rows = []
        for i, label in enumerate(labels):
            uuid = f"{name}_u{i}"
            Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(
                d / f"{uuid}.jpg"
            )
            rows.append({"uuid": uuid, "label": label, "timestamp": 1, "predicted_label": 0.1})
        pd.DataFrame(rows).to_csv(data / f"{name}.csv", index=False)

    labeled, unlabeled = merge_datasets(str(data), str(out))
    assert len(labeled) == 2
    assert len(unlabeled) == 2
    assert sorted(os.listdir(out / "labeled")) == ["ds1_u0.jpg", "ds2_u1.jpg"]
    assert (out / "labeled.csv").exists()
    assert "source_datadir" in pd.read_csv(out / "labeled.csv").columns


def test_move_subset(tmp_path, rng):
    root = tmp_path / "root"
    (root / "sub").mkdir(parents=True)
    for i in range(10):
        (root / "sub" / f"f{i}.jpg").write_bytes(b"x")
        (root / "sub" / f"f{i}.txt").write_bytes(b"y")
    files = group_by_stem(str(root), [".jpg", ".txt"])
    assert len(files) == 10
    n = copy_files(files, str(root), str(tmp_path / "out"), fraction=1.0, seed=0)
    assert n == 10
    assert (tmp_path / "out" / "sub" / "f0.jpg").exists()
    assert (tmp_path / "out" / "sub" / "f0.txt").exists()


def test_quarantine_unreadable(tmp_path, rng):
    src = tmp_path / "imgs"
    src.mkdir()
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(src / "ok.jpg")
    (src / "bad.jpg").write_bytes(b"junk")
    moved = quarantine_unreadable(str(src), str(tmp_path / "errored"))
    assert moved == ["bad.jpg"]
    assert (tmp_path / "errored" / "bad.jpg").exists()
    assert (src / "ok.jpg").exists()
