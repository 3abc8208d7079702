"""Dedup: blocked single-device and mesh-sharded ring vs a brute-force oracle."""
import numpy as np
import pytest

import jax

from clip_assisted_data_labeling_tpu.ops.diversity import farthest_point_order
from clip_assisted_data_labeling_tpu.ops.similarity import (
    cosine_similarity_matrix,
    find_duplicate_pairs,
    normalize_rows,
)
from clip_assisted_data_labeling_tpu.parallel import (
    find_duplicate_pairs_sharded,
    get_mesh,
)


def make_embeddings(rng, n=200, d=32, n_dupes=12, threshold=0.97):
    emb = rng.normal(0, 1, (n, d)).astype(np.float32)
    emb = normalize_rows(emb)
    expected = set()
    for t in range(n_dupes):
        i = int(rng.integers(0, n - 1))
        j = int(rng.integers(i + 1, n))
        # make j a slightly perturbed copy of i
        noise = rng.normal(0, 0.01, d).astype(np.float32)
        emb[j] = normalize_rows((emb[i] + noise)[None])[0]
    sims = normalize_rows(emb) @ normalize_rows(emb).T
    iu, ju = np.triu_indices(n, k=1)
    mask = sims[iu, ju] > threshold
    expected = set(zip(iu[mask].tolist(), ju[mask].tolist()))
    return emb, expected


def test_blocked_dedup_matches_oracle(rng):
    emb, expected = make_embeddings(rng)
    res = find_duplicate_pairs(emb, threshold=0.97, row_block=64)
    got = set(zip(res.rows.tolist(), res.cols.tolist()))
    assert got == expected
    assert len(res.overflow_rows) == 0
    # metrics are the actual cosines (computed in half precision on device,
    # matching the reference's fp16 dedup embeddings)
    normed = normalize_rows(emb)
    for i, j, m in res.pairs():
        assert abs(float(normed[i] @ normed[j]) - m) < 2e-3


def test_sharded_dedup_matches_oracle(rng):
    mesh = get_mesh()  # 8 virtual CPU devices from conftest
    assert np.prod(mesh.devices.shape) == 8
    emb, expected = make_embeddings(rng, n=203)  # non-divisible by 8 on purpose
    res = find_duplicate_pairs_sharded(emb, threshold=0.97, mesh=mesh)
    got = set(zip(res.rows.tolist(), res.cols.tolist()))
    assert got == expected
    assert len(res.overflow_rows) == 0


def test_sharded_matches_blocked(rng):
    emb, _ = make_embeddings(rng, n=160, n_dupes=20, threshold=0.9)
    a = find_duplicate_pairs(emb, threshold=0.9, row_block=32)
    b = find_duplicate_pairs_sharded(emb, threshold=0.9, mesh=get_mesh())
    assert set(zip(a.rows.tolist(), a.cols.tolist())) == set(
        zip(b.rows.tolist(), b.cols.tolist())
    )


def test_overflow_auto_escalates(rng):
    # 40 identical embeddings: every row matches every later row (39 > k=4).
    # Capacity must escalate itself — ALL C(40,2) pairs recovered, no re-run.
    emb = np.tile(normalize_rows(rng.normal(0, 1, (1, 16))), (40, 1))
    res = find_duplicate_pairs(emb, threshold=0.99, row_block=64, max_per_row=4)
    assert len(res.overflow_rows) > 0  # escalation is reported
    got = set(zip(res.rows.tolist(), res.cols.tolist()))
    iu, ju = np.triu_indices(40, k=1)
    assert got == set(zip(iu.tolist(), ju.tolist()))


def test_overflow_auto_escalates_sharded(rng):
    # >16 near-duplicates of one image (the VERDICT repro): plant 24 copies of
    # row 0 among distinct rows and require every planted pair back, sharded.
    emb = normalize_rows(rng.normal(0, 1, (64, 16)))
    dup_idx = list(range(0, 48, 2))  # 24 rows
    for j in dup_idx[1:]:
        emb[j] = emb[dup_idx[0]]
    res = find_duplicate_pairs_sharded(
        emb, threshold=0.9999, mesh=get_mesh(), max_per_row=16
    )
    got = set(zip(res.rows.tolist(), res.cols.tolist()))
    expected = {
        (i, j) for a, i in enumerate(dup_idx) for j in dup_idx[a + 1:]
    }
    assert got >= expected
    assert len(res.overflow_rows) > 0


def test_euclidean_replicates_reference_semantics(rng):
    """Reference selects DISTANCE > threshold on normalized embeddings (a quirk)."""
    emb, _ = make_embeddings(rng, n=60, n_dupes=0)
    res = find_duplicate_pairs(emb, threshold=1.2, sim_type="euclidean", row_block=64)
    normed = normalize_rows(emb)
    d = np.sqrt(np.maximum(2 - 2 * normed @ normed.T, 0))
    iu, ju = np.triu_indices(60, k=1)
    expected = set(zip(iu[(d[iu, ju] > 1.2)].tolist(), ju[(d[iu, ju] > 1.2)].tolist()))
    got = set(zip(res.rows.tolist(), res.cols.tolist()))
    # capacity-limited: got must be a subset; with k=16 and few matches, equal
    if not res.overflow_rows.size:
        assert got == expected


def test_wire_scan_threshold_superset_bound():
    """The euclidean scan threshold must be a CONVERTED cosine-error bound,
    not a plain subtraction: d = sqrt(2−2s), so a wire whose cosine error is
    bounded by ``slack`` can read a just-above-threshold distance as low as
    sqrt(t²−2·slack) — strictly below the naive t−slack whenever t < 1
    (Δd ≈ slack/d), which let such pairs silently skip the exact recheck."""
    from clip_assisted_data_labeling_tpu.ops.similarity import (
        wire_scan_threshold,
    )

    # cosine metric: unchanged plain subtraction
    assert wire_scan_threshold(0.96, False, 0.02) == pytest.approx(0.94)
    # euclidean: for any exact pair with d > t and |s_wire − s| <= slack the
    # wire distance sqrt(max(d² − 2·slack, 0)) must stay above the scan bound
    for t, slack in [(0.283, 2e-3), (0.3, 0.02), (1.2, 0.02), (1.9, 2e-3)]:
        scan = wire_scan_threshold(t, True, slack)
        worst_wire = np.sqrt(max(t * t - 2 * slack, 0.0))  # d → t⁺ limit
        assert scan <= worst_wire + 1e-12
        # the naive subtraction sat ABOVE the worst wire reading for t < 1
        if t < 1.0 and t * t > 2 * slack:
            assert scan < t - slack
    # degenerate: t² <= 2·slack — clamped wire distances can read exactly 0,
    # so the scan must count every pair (threshold −1, distances are >= 0)
    assert wire_scan_threshold(0.1, True, 0.02) == -1.0


def test_euclidean_int8_wire_matches_oracle_at_small_threshold(rng):
    """End-to-end superset check at a euclidean threshold small enough that
    the old unconverted slack (t − 0.02 = 0.23) sat ABOVE what a boundary
    pair can read over the int8 wire (sqrt(t² − 2·0.02) ≈ 0.156)."""
    n, d = 96, 32
    emb = normalize_rows(rng.normal(0, 1, (n, d)).astype(np.float32))
    # plant pairs with exact distances straddling the threshold
    t = 0.25
    for j, dist in ((1, 0.251), (3, 0.26), (5, 0.24)):
        s = 1.0 - dist * dist / 2.0
        perp = rng.normal(0, 1, d).astype(np.float32)
        perp -= (perp @ emb[0]) * emb[0]
        perp /= np.linalg.norm(perp)
        emb[j] = s * emb[0] + np.sqrt(1.0 - s * s) * perp
    normed = normalize_rows(emb)
    sims = normed @ normed.T
    dist = np.sqrt(np.maximum(2.0 - 2.0 * sims, 0.0))
    iu, ju = np.triu_indices(n, k=1)
    expected = set(zip(iu[dist[iu, ju] > t].tolist(),
                       ju[dist[iu, ju] > t].tolist()))
    for wire in ("int8", "fp16"):
        res = find_duplicate_pairs(emb, threshold=t, sim_type="euclidean",
                                   row_block=32, wire=wire)
        got = set(zip(res.rows.tolist(), res.cols.tolist()))
        assert got == expected, wire
    mesh = get_mesh()
    res = find_duplicate_pairs_sharded(emb, threshold=t, sim_type="euclidean",
                                       mesh=mesh, wire="int8")
    assert set(zip(res.rows.tolist(), res.cols.tolist())) == expected


def test_farthest_point_order(rng):
    # three tight clusters; a diverse prefix of 3 must hit all clusters
    centers = normalize_rows(rng.normal(0, 1, (3, 16)))
    emb = np.concatenate(
        [normalize_rows(c + rng.normal(0, 0.01, (10, 16))) for c in centers]
    )
    order = farthest_point_order(emb, n_order=3, seed_idx=0)
    clusters = set(int(i) // 10 for i in order[:3])
    assert clusters == {0, 1, 2}
    # full permutation property
    assert sorted(farthest_point_order(emb, n_order=30).tolist()) == list(range(30))


def test_cosine_similarity_matrix(rng):
    a = rng.normal(0, 1, (5, 8)).astype(np.float32)
    m = np.asarray(cosine_similarity_matrix(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)


def test_int8_wire_pair_set_identical_to_fp16(rng):
    """VERDICT r2 #5: the int8 dedup wire (scan at threshold-INT8_SLACK +
    exact f32 host recheck) must report the IDENTICAL pair set as the fp16
    wire on both the planted-pair corpus and a pure-random corpus, for both
    sim types."""
    emb, expected = make_embeddings(rng, n=300, d=64, n_dupes=15)
    for sim_type in ("cosine", "euclidean"):
        thr = 0.97 if sim_type == "cosine" else 1.9
        a = find_duplicate_pairs(emb, threshold=thr, sim_type=sim_type,
                                 row_block=64, wire="int8")
        b = find_duplicate_pairs(emb, threshold=thr, sim_type=sim_type,
                                 row_block=64, wire="fp16")
        assert (set(zip(a.rows.tolist(), a.cols.tolist()))
                == set(zip(b.rows.tolist(), b.cols.tolist()))), sim_type
    # int8 metrics are the exact f32 recheck values
    a = find_duplicate_pairs(emb, threshold=0.97, row_block=64, wire="int8")
    normed = normalize_rows(emb)
    for i, j, m in a.pairs():
        assert abs(float(normed[i] @ normed[j]) - m) < 1e-6

    # random corpus (no duplicates): both wires must agree on "no pairs"
    clean = rng.normal(0, 1, (256, 64)).astype(np.float32)
    a = find_duplicate_pairs(clean, threshold=0.96, row_block=64, wire="int8")
    b = find_duplicate_pairs(clean, threshold=0.96, row_block=64, wire="fp16")
    assert len(a.rows) == len(b.rows) == 0

    with pytest.raises(ValueError, match="wire"):
        find_duplicate_pairs(emb, wire="fp8")


def test_sharded_int8_wire_matches_fp16(rng):
    """The int8 ring (quantized panels + scales riding the ppermute ring)
    must report the identical exact pair set as the fp16 ring and the
    single-device path."""
    emb, expected = make_embeddings(rng, n=240, d=48, n_dupes=10)
    mesh = get_mesh()
    a = find_duplicate_pairs_sharded(emb, threshold=0.97, mesh=mesh,
                                     wire="int8")
    b = find_duplicate_pairs_sharded(emb, threshold=0.97, mesh=mesh,
                                     wire="fp16")
    c = find_duplicate_pairs(emb, threshold=0.97, row_block=64)
    sa = set(zip(a.rows.tolist(), a.cols.tolist()))
    assert sa == set(zip(b.rows.tolist(), b.cols.tolist()))
    assert sa == set(zip(c.rows.tolist(), c.cols.tolist())) == expected
    # metrics come from the exact f32 recheck on every path
    normed = normalize_rows(emb)
    for i, j, m in a.pairs():
        assert abs(float(normed[i] @ normed[j]) - m) < 1e-6


def test_chunked_extraction_matches_unchunked(rng, monkeypatch):
    """A tiny extraction budget forces many hit chunks; the pair set and
    metrics must be identical to the single-panel result (chunk-order
    invariance of per-row top-k)."""
    import clip_assisted_data_labeling_tpu.ops.similarity as S

    emb, expected = make_embeddings(rng, n=300, d=32, n_dupes=30,
                                    threshold=0.95)
    ref = find_duplicate_pairs(emb, threshold=0.95, row_block=64)
    # budget of 64*k elems → chunk floor of 128 rows → ≥2 chunks over the hits
    monkeypatch.setattr(S, "EXTRACT_BUDGET_ELEMS", 1)
    for wire in ("int8", "fp16"):
        res = find_duplicate_pairs(emb, threshold=0.95, row_block=64,
                                   wire=wire)
        assert (set(zip(res.rows.tolist(), res.cols.tolist()))
                == set(zip(ref.rows.tolist(), ref.cols.tolist()))
                == expected), wire
    sharded = find_duplicate_pairs_sharded(emb, threshold=0.95,
                                           mesh=get_mesh())
    assert (set(zip(sharded.rows.tolist(), sharded.cols.tolist()))
            == expected)


def test_degenerate_cone_is_memory_bounded(rng, monkeypatch, capsys):
    """Every row a duplicate of every other (narrow-cone data at a too-low
    threshold — the failure that OOM'd the 100k chain run): extraction must
    chunk, warn, and still return the exact full pair set."""
    import clip_assisted_data_labeling_tpu.ops.similarity as S

    base = normalize_rows(rng.normal(0, 1, (1, 32)))
    emb = normalize_rows(base + rng.normal(0, 0.02, (512, 32)))
    monkeypatch.setattr(S, "EXTRACT_BUDGET_ELEMS", 1)
    res = find_duplicate_pairs(emb, threshold=0.9, row_block=128)
    normed = normalize_rows(emb)
    sims = normed @ normed.T
    iu, ju = np.triu_indices(512, k=1)
    mask = sims[iu, ju] > 0.9
    assert (set(zip(res.rows.tolist(), res.cols.tolist()))
            == set(zip(iu[mask].tolist(), ju[mask].tolist())))
    # the warning fires only past the 1M-candidate absolute floor
    S.warn_if_degenerate(np.full(512, 1000), 512, 0.9, 0.88)
    assert "near-degenerate" not in capsys.readouterr().out
    S.warn_if_degenerate(np.full(100_000, 40), 100_000, 0.999, 0.979)
    assert "near-degenerate" in capsys.readouterr().out
