"""Vectorized batch feature assembly (store/columnar.assemble_batch_from_stores).

The batch gather must be row-for-row identical to the per-uuid
``assemble_from_stores`` sibling — same part order (per-model crops, then the
22 img stats), same skip set (uuid missing from a store / invalid row), same
loud error for a stats recipe against a stats-less store. It exists because
the per-uuid loop is the host-side bound of a production-scale predict
(~6.3k rows/s vs ~82k batched on a warm 100k-row store; ROADMAP
'Environment-limited measurements').
"""
import numpy as np
import pytest

from clip_assisted_data_labeling_tpu.store.columnar import (
    EmbeddingStore,
    assemble_batch_from_stores,
    assemble_from_stores,
)

MODEL_A = "ViT-Test/a"
MODEL_B = "ViT-Test/b"
CROPS = ["centre_crop", "square_padded_crop", "subcrop1_0.15"]


def _make_store(root, model, uuids, rng, with_stats=True, dim=8,
                invalid=()):
    st = EmbeddingStore.create(root, model, CROPS, dim, uuids,
                               dtype="float16", with_stats=with_stats)
    n = len(uuids)
    valid = np.ones(n, bool)
    for i in invalid:
        valid[i] = False
    st.write_rows(
        0,
        rng.normal(0, 1, (n, len(CROPS), dim)).astype(np.float16),
        stats=(rng.normal(0, 1, (n, 22)).astype(np.float32)
               if with_stats else None),
        valid=valid,
    )
    st.flush()
    return EmbeddingStore.open(root, model)


def test_batch_matches_per_uuid(tmp_path, rng):
    """Multi-model, crop subset with plain-name alias, stats on: every kept
    row equals the per-uuid sibling; missing/invalid rows are the skip set."""
    root = str(tmp_path)
    uuids = [f"u{i}" for i in range(12)]
    # store B lacks u11 entirely; u3 is invalid in A, u7 invalid in B
    sa = _make_store(root, MODEL_A, uuids, rng, invalid=(3,))
    sb = _make_store(root, MODEL_B, uuids[:-1], rng, invalid=(7,))
    stores = {MODEL_A: sa, MODEL_B: sb}
    models = [MODEL_A, MODEL_B]
    # 'subcrop1' must resolve to the suffixed stored name (read-alias contract)
    crops = ["square_padded_crop", "subcrop1"]
    query = uuids + ["ghost"]

    kept, feats = assemble_batch_from_stores(stores, models, crops, True, query)
    expect_skip = {3, 7, 11, 12}  # invalid-A, invalid-B, missing-B, missing-both
    assert [i for i, k in enumerate(kept) if not k] == sorted(expect_skip)
    assert feats.shape == (len(query) - len(expect_skip), 2 * (2 * 8 + 22))
    assert feats.dtype == np.float32

    row = 0
    for i, u in enumerate(query):
        if not kept[i]:
            with pytest.raises(KeyError):
                assemble_from_stores(stores, models, crops, True, u)
            continue
        ref = assemble_from_stores(stores, models, crops, True, u)
        np.testing.assert_array_equal(feats[row], ref)
        row += 1


def test_batch_no_stats_and_loud_stats_error(tmp_path, rng):
    root = str(tmp_path)
    uuids = ["u0", "u1"]
    st = _make_store(root, MODEL_A, uuids, rng, with_stats=False)
    stores = {MODEL_A: st}

    kept, feats = assemble_batch_from_stores(stores, [MODEL_A], CROPS, False,
                                             uuids)
    assert kept.all() and feats.shape == (2, 3 * 8)
    for i, u in enumerate(uuids):
        np.testing.assert_array_equal(
            feats[i], assemble_from_stores(stores, [MODEL_A], CROPS, False, u)
        )
    # config error is loud up front, not a silent skip-every-row
    with pytest.raises(KeyError, match="img stats"):
        assemble_batch_from_stores(stores, [MODEL_A], CROPS, True, uuids)


def test_batch_empty_and_all_skipped(tmp_path, rng):
    root = str(tmp_path)
    st = _make_store(root, MODEL_A, ["u0"], rng)
    stores = {MODEL_A: st}
    kept, feats = assemble_batch_from_stores(stores, [MODEL_A], CROPS, True, [])
    assert kept.shape == (0,) and feats.shape == (0, 3 * 8 + 22)
    kept, feats = assemble_batch_from_stores(stores, [MODEL_A], CROPS, True,
                                             ["ghost1", "ghost2"])
    assert not kept.any() and feats.shape == (0, 3 * 8 + 22)
