"""Multi-host file sharding: two shard runs compose into the full dataset."""
import os

import numpy as np
from PIL import Image

from clip_assisted_data_labeling_tpu.config import EmbedConfig
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

MODEL = "ViT-Test/tiny"


def test_host_shards_compose(tmp_path, rng):
    root = tmp_path / "ds"
    root.mkdir()
    for i in range(7):
        Image.fromarray(rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)).save(
            root / f"u{i}.jpg"
        )

    base = dict(models_to_use=(MODEL,), batch_size=2, num_workers=1,
                canvas_size=128, compute_dtype="float32", shuffle_filenames=False)
    # two "hosts" embed disjoint shards (sidecars only)
    for idx in (0, 1):
        embed_dataset(str(root), EmbedConfig(**base, host_index=idx, host_count=2))

    pts = sorted(f for f in os.listdir(root) if f.endswith(".pt"))
    assert len(pts) == 7  # every image embedded exactly once across shards
    for f in pts:
        assert MODEL in read_sidecar(str(root / f))

    # the combined store builds from the sidecars
    uuid_paths = {os.path.splitext(f)[0]: str(root / f) for f in pts}
    store = EmbeddingStore.from_sidecars(str(root), MODEL, uuid_paths)
    assert int(np.asarray(store.valid).sum()) == 7

    # a single-host follow-up run sees everything already embedded
    stores = embed_dataset(str(root), EmbedConfig(**base))
    assert np.asarray(stores[MODEL].valid).all()


def test_incremental_embed_after_new_images(tmp_path, rng):
    """Reference resume semantics (_1:117-128): adding images to an embedded
    dataset re-embeds only the new ones; the store backfills the old rows."""
    root = tmp_path / "grow"
    root.mkdir()
    base = dict(models_to_use=(MODEL,), batch_size=2, num_workers=1,
                canvas_size=128, compute_dtype="float32", shuffle_filenames=False)
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)).save(
            root / f"a{i}.jpg"
        )
    embed_dataset(str(root), EmbedConfig(**base))
    first = {
        f: np.asarray(read_sidecar(str(root / f))[MODEL]["centre_crop"])
        for f in os.listdir(root) if f.endswith(".pt")
    }

    for i in range(2):  # grow the dataset
        Image.fromarray(rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)).save(
            root / f"b{i}.jpg"
        )
    stores = embed_dataset(str(root), EmbedConfig(**base))
    store = stores[MODEL]
    assert store.meta["n"] == 6
    assert np.asarray(store.valid).all()  # old rows backfilled, new rows embedded
    # previously embedded sidecars untouched (not re-encoded)
    for f, emb in first.items():
        np.testing.assert_array_equal(
            np.asarray(read_sidecar(str(root / f))[MODEL]["centre_crop"]), emb
        )


def test_int8_static_shards_share_one_calibration(tmp_path, rng, monkeypatch):
    """Round-3 self-review: multi-host int8_static shards must embed with ONE
    set of static scales. Host 0 publishes the calibration npz; a non-zero
    host with no published file times out loudly instead of calibrating its
    own shard with different scales."""
    import pytest

    from clip_assisted_data_labeling_tpu.models.encoders import (
        calibration_file,
    )
    from clip_assisted_data_labeling_tpu.pipeline import embed as embed_mod

    root = tmp_path / "ds"
    root.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)).save(
            root / f"u{i}.jpg"
        )
    base = dict(models_to_use=(MODEL,), batch_size=2, num_workers=1,
                canvas_size=128, compute_dtype="int8_static",
                shuffle_filenames=False)

    # host 1 first, nothing published -> bounded wait then TimeoutError
    monkeypatch.setattr(embed_mod, "CALIB_WAIT_S", 0.2)
    with pytest.raises(TimeoutError, match="never published"):
        embed_dataset(str(root), EmbedConfig(**base, host_index=1, host_count=2))

    # host 0 embeds its shard and publishes the scales
    embed_dataset(str(root), EmbedConfig(**base, host_index=0, host_count=2))
    calib = calibration_file(MODEL, str(root))
    assert os.path.exists(calib)
    published = open(calib, "rb").read()

    # host 1 now proceeds, loading host 0's scales — the npz must be
    # byte-identical afterwards (a recalibrate-and-overwrite regression on
    # host 1's own shard is the exact bug this test pins)
    embed_dataset(str(root), EmbedConfig(**base, host_index=1, host_count=2))
    assert open(calib, "rb").read() == published
    pts = sorted(f for f in os.listdir(root) if f.endswith(".pt"))
    assert len(pts) == 4

    # fully-embedded re-run: host 1 (empty todo) must NOT wait on a missing
    # calibration it will never consume, and host 0 must re-publish the
    # fleet's scales from an already-embedded batch
    os.remove(calib)
    embed_dataset(str(root), EmbedConfig(**base, host_index=1, host_count=2))
    assert not os.path.exists(calib)  # host 1 neither waited nor calibrated
    embed_dataset(str(root), EmbedConfig(**base, host_index=0, host_count=2))
    assert os.path.exists(calib)
