"""pipeline.store CLI: rebuild from sidecars + info."""
import numpy as np

from clip_assisted_data_labeling_tpu.pipeline import store as store_cli
from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
from clip_assisted_data_labeling_tpu.store.sidecar import write_sidecar


def _make_sidecars(root, rng, n=6, dim=8, model="ViT-Test/tiny"):
    uuids = [f"{i:032x}" for i in range(n)]
    for u in uuids:
        crops = {
            "centre_crop": rng.normal(0, 1, (1, dim)).astype(np.float32),
            "square_padded_crop": rng.normal(0, 1, (1, dim)).astype(np.float32),
        }
        (root / f"{u}.jpg").write_bytes(b"x")
        write_sidecar(str(root / f"{u}.pt"), model, crops,
                      img_stats={"img_stat_width": 0.5})
    return uuids


def test_rebuild_all_models_and_info(tmp_path, rng, capsys):
    root = tmp_path / "ds"
    root.mkdir()
    uuids = _make_sidecars(root, rng)

    (rebuilt,) = store_cli.rebuild(str(root), None)  # models auto-discovered
    assert rebuilt.meta["n"] == 6 and int(rebuilt.valid.sum()) == 6
    assert rebuilt.meta["crop_names"] == ["centre_crop", "square_padded_crop"]

    opened = EmbeddingStore.open(str(root), "ViT-Test/tiny")
    assert opened.uuids == sorted(uuids)

    store_cli.info(str(root), None)
    out = capsys.readouterr().out
    assert "6 rows (6 valid)" in out


def test_rebuild_cli_main(tmp_path, rng):
    root = tmp_path / "ds"
    root.mkdir()
    _make_sidecars(root, rng, n=3)
    store_cli.main(["rebuild", "--root_dir", str(root),
                    "--models_to_use", "ViT-Test/tiny"])
    assert EmbeddingStore.exists(str(root), "ViT-Test/tiny")


def test_rebuild_no_sidecars_errors(tmp_path):
    import pytest

    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit):
        store_cli.rebuild(str(tmp_path / "empty"), None)
