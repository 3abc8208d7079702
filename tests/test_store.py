"""On-disk contract: sidecar .pt interop, CSV database semantics, columnar store."""
import os

import numpy as np
import pytest

from clip_assisted_data_labeling_tpu.store import (
    EmbeddingStore,
    LabelDatabase,
    assemble_features,
    has_model_key,
    read_sidecar,
    resolve_crop_key,
    write_sidecar,
)

MODEL = "ViT-B-32/openai"


def test_sidecar_roundtrip_and_merge(tmp_path, rng):
    path = str(tmp_path / "abc.pt")
    crops = {
        "centre_crop": rng.normal(0, 1, 16).astype(np.float32),
        "subcrop1_0.15": rng.normal(0, 1, 16).astype(np.float32),
    }
    stats = {"img_stat_mean_color": 0.5, "img_stat_std_color": 0.1}
    write_sidecar(path, MODEL, crops, stats)
    assert has_model_key(path, MODEL)
    assert not has_model_key(path, "other/model")

    # incremental merge of a second model must keep the first intact
    write_sidecar(path, "second/model", {"centre_crop": np.ones(8, np.float32)})
    d = read_sidecar(path)
    assert set(d.keys()) == {MODEL, "second/model"}
    np.testing.assert_allclose(
        d[MODEL]["centre_crop"].reshape(-1), crops["centre_crop"], atol=1e-7
    )
    assert d[MODEL]["centre_crop"].shape == (1, 16)  # reference [1, D] layout
    assert abs(float(d[MODEL]["img_stat_mean_color"]) - 0.5) < 1e-7


def test_sidecar_readable_by_plain_torch(tmp_path, rng):
    """A consumer using raw torch.load (like the reference scripts) must see the
    reference layout."""
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "x.pt")
    write_sidecar(path, MODEL, {"centre_crop": np.arange(4, dtype=np.float32)})
    raw = torch.load(path, weights_only=False)
    assert isinstance(raw[MODEL]["centre_crop"], torch.Tensor)
    assert raw[MODEL]["centre_crop"].dtype == torch.float32


def test_crop_key_aliases():
    d = {"subcrop1": 1, "subcrop2_0.1": 2}
    assert resolve_crop_key(d, "subcrop1_0.15") == "subcrop1"
    assert resolve_crop_key(d, "subcrop1") == "subcrop1"
    assert resolve_crop_key(d, "subcrop2") == "subcrop2_0.1"
    assert resolve_crop_key(d, "centre_crop") is None


def test_assemble_features_reference_semantics(rng):
    sidecar = {
        "m1": {
            "centre_crop": np.ones((1, 4), np.float32),
            "subcrop2_0.1": np.full((1, 4), 2, np.float32),
            "img_stat_a": 0.5,
            "img_stat_b": 0.25,
        },
        "m2": {"centre_crop": np.full((1, 4), 3, np.float32),
               "subcrop2_0.1": np.full((1, 4), 4, np.float32)},
    }
    feats = assemble_features(sidecar, ["m1", "m2"], ["centre_crop", "subcrop2_0.1"])
    assert feats.shape == (16,)
    np.testing.assert_allclose(feats[:4], 1)
    np.testing.assert_allclose(feats[12:], 4)

    with_stats = assemble_features(sidecar, ["m1"], ["centre_crop"], use_img_stat_features=True)
    assert with_stats.shape == (6,)

    with pytest.raises(KeyError):
        assemble_features(sidecar, ["m1"], ["square_padded_crop"])


def test_database_upsert_and_merge(tmp_path):
    root = tmp_path / "mydata"
    root.mkdir()
    db = LabelDatabase.load_or_create(str(root))
    assert len(db) == 0
    assert db.path == str(tmp_path / "mydata.csv")

    db.relabel("u1", 0.7)
    db.relabel("u2", 0.3)
    db.relabel("u1", 0.9)  # update, not duplicate
    assert len(db) == 2
    assert db.get_label("u1") == 0.9

    db.merge_predictions(["u2", "u3"], np.array([0.42, 0.11]))
    assert len(db) == 3
    assert db.get_label("u2") == 0.3  # human label untouched
    assert abs(db.get_predicted_label("u2") - 0.42) < 1e-9
    assert abs(db.get_predicted_label("u3") - 0.11) < 1e-9

    db.fix_database()
    assert db.get_predicted_label("u1") == 0.9

    db.save()
    db2 = LabelDatabase.load_or_create(str(root))
    assert list(db2.df.columns[:4]) == ["uuid", "label", "timestamp", "predicted_label"]
    assert db2.n_labeled() == 2

    backup = db2.create_backup()
    assert backup and os.path.exists(backup)
    backup2 = db2.create_backup()  # single-slot: old backup replaced
    assert not os.path.exists(backup) or backup == backup2
    assert os.path.exists(backup2)


def test_columnar_store_roundtrip(tmp_path, rng):
    root = str(tmp_path)
    uuids = [f"u{i}" for i in range(10)]
    emb = rng.normal(0, 1, (10, 2, 8)).astype(np.float32)
    store = EmbeddingStore.create(root, MODEL, ["centre_crop", "subcrop2_0.1"], 8, uuids)
    store.write_rows(0, emb[:6])
    store.write_rows(6, emb[6:])
    store.flush()

    loaded = EmbeddingStore.open(root, MODEL)
    assert loaded.uuids == uuids
    assert loaded.index_of("u7") == 7
    np.testing.assert_allclose(
        np.asarray(loaded.embeddings), emb.astype(np.float16), rtol=2e-3, atol=1e-3
    )
    assert loaded.crop_index("subcrop2") == 1


def test_columnar_from_sidecars(tmp_path, rng):
    root = str(tmp_path)
    paths = {}
    embs = {}
    for i in range(5):
        u = f"img{i}"
        p = os.path.join(root, f"{u}.pt")
        e = rng.normal(0, 1, 6).astype(np.float32)
        write_sidecar(p, MODEL, {"centre_crop": e}, {"img_stat_mean_color": 0.5})
        paths[u] = p
        embs[u] = e
    store = EmbeddingStore.from_sidecars(root, MODEL, paths)
    for u in paths:
        i = store.index_of(u)
        np.testing.assert_allclose(
            np.asarray(store.embeddings[i, 0], np.float32), embs[u], rtol=2e-3, atol=1e-3
        )
    assert store.img_stats is not None


def test_store_recreate_without_stats_after_stats_run(tmp_path, rng):
    """Round-3 self-review: re-creating a store with with_stats=False over a
    previous with-stats run must not crash on (or serve) the stale
    img_stats.npy."""
    root = str(tmp_path)
    uuids = [f"u{i}" for i in range(4)]
    s1 = EmbeddingStore.create(root, MODEL, ["centre_crop"], 8, uuids,
                               with_stats=True)
    s1.write_rows(0, rng.normal(0, 1, (4, 1, 8)).astype(np.float32),
                  rng.normal(0, 1, (4, 22)).astype(np.float32))
    s1.flush()
    s2 = EmbeddingStore.create(root, MODEL, ["centre_crop"], 8, uuids,
                               with_stats=False)
    assert s2.img_stats is None
    s2.write_rows(0, rng.normal(0, 1, (4, 1, 8)).astype(np.float32))
    s2.flush()
    assert EmbeddingStore.open(root, MODEL).img_stats is None


def test_assemble_from_stores_shared_helper(tmp_path, rng):
    """Train and predict assemble features through ONE helper; a stats recipe
    against a stats-less store raises (not a silent per-uuid skip)."""
    import pytest

    from clip_assisted_data_labeling_tpu.store.columnar import (
        assemble_from_stores,
    )

    root = str(tmp_path)
    store = EmbeddingStore.create(root, MODEL, ["centre_crop"], 8, ["u0"],
                                  with_stats=False)
    store.write_rows(0, rng.normal(0, 1, (1, 1, 8)).astype(np.float32))
    store.flush()
    stores = {MODEL: EmbeddingStore.open(root, MODEL)}
    feats = assemble_from_stores(stores, [MODEL], ["centre_crop"], False, "u0")
    assert feats.shape == (8,)
    with pytest.raises(KeyError, match="img stats"):
        assemble_from_stores(stores, [MODEL], ["centre_crop"], True, "u0")


def test_list_models(tmp_path, rng):
    from clip_assisted_data_labeling_tpu.store.columnar import list_models

    root = str(tmp_path)
    assert list_models(root) == []
    EmbeddingStore.create(root, MODEL, ["centre_crop"], 8, ["u0"])
    EmbeddingStore.create(root, "Other-Model/x", ["centre_crop"], 8, ["u0"])
    assert list_models(root) == ["Other-Model/x", MODEL] or set(
        list_models(root)) == {MODEL, "Other-Model/x"}
