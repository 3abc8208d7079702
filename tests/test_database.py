"""LabelDatabase semantics after the O(batch) merge_predictions rewrite.

The reference's outer-merge contract (_5_predict_labels.py:144-155) is pinned
here against the in-place implementation: existing rows get
predicted_label/timestamp updated and keep their human label, new uuids get
appended rows, row order is stable (existing order, then new uuids in batch
order). The old full-frame merge cost 178 ms per 64-row batch at 200k rows —
hours over a 1M-row predict (BENCH_NOTES 'Feature assembly' sibling entry).
"""
import numpy as np
import pandas as pd
import pytest

from clip_assisted_data_labeling_tpu.store.database import LabelDatabase


def _db(tmp_path, rows=None):
    root = tmp_path / "ds"
    root.mkdir(exist_ok=True)
    db = LabelDatabase.load_or_create(str(root))
    if rows:
        db.df = pd.DataFrame(rows)
        for c in ("label", "timestamp", "predicted_label"):
            if c not in db.df.columns:
                db.df[c] = np.nan
    return db


def test_merge_updates_existing_and_appends_new(tmp_path):
    db = _db(tmp_path, [
        {"uuid": "a", "label": 0.7, "timestamp": 1.0, "predicted_label": np.nan},
        {"uuid": "b", "label": np.nan, "timestamp": 1.0, "predicted_label": 0.2},
    ])
    db.merge_predictions(["b", "c", "a"], np.asarray([0.9, 0.4, 0.1]))
    df = db.df
    # row order: existing rows first (original order), then new uuids
    assert list(df["uuid"]) == ["a", "b", "c"]
    # human label untouched, prediction written
    assert df.loc[df["uuid"] == "a", "label"].values[0] == 0.7
    assert df.loc[df["uuid"] == "a", "predicted_label"].values[0] == 0.1
    assert df.loc[df["uuid"] == "b", "predicted_label"].values[0] == 0.9
    # new row: no label, fresh timestamp, prediction set
    c = df.loc[df["uuid"] == "c"]
    assert np.isnan(c["label"].values[0])
    assert c["predicted_label"].values[0] == 0.4
    assert c["timestamp"].values[0] > 1.0
    # existing rows' timestamps refreshed too (reference semantics)
    assert df.loc[df["uuid"] == "a", "timestamp"].values[0] > 1.0


def test_merge_after_external_df_replacement(tmp_path):
    """Wholesale db.df replacement invalidates the uuid-position cache."""
    db = _db(tmp_path)
    db.merge_predictions(["a"], np.asarray([0.5]))
    db.df = db.df.iloc[::-1].reset_index(drop=True)  # outside mutation
    db.df = pd.concat(
        [pd.DataFrame([{"uuid": "z", "label": np.nan, "timestamp": np.nan,
                        "predicted_label": np.nan}]), db.df],
        ignore_index=True,
    )
    db.merge_predictions(["a", "z"], np.asarray([0.8, 0.3]))
    assert db.df.loc[db.df["uuid"] == "a", "predicted_label"].values[0] == 0.8
    assert db.df.loc[db.df["uuid"] == "z", "predicted_label"].values[0] == 0.3
    assert len(db.df) == 2


def test_ensure_rows_then_merge_never_concats(tmp_path):
    db = _db(tmp_path)
    uuids = [f"u{i}" for i in range(40)]
    assert db.ensure_rows(uuids) == 40
    assert db.ensure_rows(uuids) == 0
    frame_id = id(db.df)
    for s in range(0, 40, 8):
        db.merge_predictions(uuids[s:s + 8], np.full(8, s / 40.0))
    assert id(db.df) == frame_id  # in-place: the frame was never replaced
    assert db.df["predicted_label"].notna().all()
    assert list(db.df["uuid"]) == uuids


def test_relabel_and_getters_roundtrip(tmp_path):
    db = _db(tmp_path)
    assert db.get_label("x") is None and db.get_predicted_label("x") is None
    db.relabel("x", 0.6)
    assert db.get_label("x") == 0.6
    db.relabel("x", 0.9)  # overwrite, no duplicate row
    assert db.get_label("x") == 0.9 and len(db.df) == 1
    db.merge_predictions(["x"], np.asarray([0.25]))
    assert db.get_label("x") == 0.9  # human label survives predictions
    assert db.get_predicted_label("x") == 0.25


@pytest.mark.parametrize("n", [20_000])
def test_merge_predictions_scales(tmp_path, n):
    """Per-batch merge must not re-touch the whole frame: time the same batch
    count against a 10x larger db and demand sub-linear growth (the old
    full-frame merge was ~10x slower; in-place is ~flat)."""
    import time as _t

    def run(n_rows):
        db = _db(tmp_path)
        db.ensure_rows([f"u{i:06d}" for i in range(n_rows)])
        db.merge_predictions(["u000000"], np.asarray([0.5]))  # warm cache+jit
        t0 = _t.perf_counter()
        for s in range(0, 6400, 64):
            db.merge_predictions(
                [f"u{i:06d}" for i in range(s, s + 64)], np.full(64, 0.5)
            )
        return _t.perf_counter() - t0

    small, big = run(n // 10), run(n)
    assert big < small * 4 + 0.25, (
        f"merge_predictions scaled with frame size: {small:.3f}s @ {n//10} "
        f"rows vs {big:.3f}s @ {n} rows"
    )
