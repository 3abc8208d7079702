"""All-pairs similarity with on-device pair emission — the dedup compute core.

The reference materializes a full N×N similarity matrix on one GPU and runs
``torch.where(triu > threshold)`` (_2_remove_duplicates.py:63-77), which caps a
pass at ~10k images (README.md:70-71). Two properties make that design wrong for
TPU: the O(N²) HBM footprint, and data-dependent pair extraction inside the
device program.

Here the matrix is never materialized. The computation is tiled into
``[row_block × row_block]`` MXU matmuls; each tile immediately reduces to a
fixed-capacity per-row top-k (duplicates per row are rare, k≈16 covers them) plus
an exact above-threshold count so capacity overflow is *detected*, never silent.
Only [N, k] values/indices ever leave the device; the host applies the threshold
and assembles pairs. Upper-triangle masking (j > i) happens in-tile via global
offsets.

``sim_type='euclidean'`` replicates the reference's literal (buggy) semantics:
it computes pairwise distances of the *normalized* embeddings and still selects
``metric > threshold`` (_2:71-74) — i.e. it finds the most DISSIMILAR pairs.
Kept for parity; cosine is the default and the sane choice.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DedupResult:
    rows: np.ndarray  # i indices (global)
    cols: np.ndarray  # j indices (global, j > i)
    metrics: np.ndarray  # similarity (cosine) or distance (euclidean)
    # rows whose match count exceeded the configured per-row capacity; their
    # extraction capacity was auto-escalated to fit (informational only)
    overflow_rows: np.ndarray

    def pairs(self) -> list[tuple[int, int, float]]:
        return [
            (int(i), int(j), float(m))
            for i, j, m in zip(self.rows, self.cols, self.metrics)
        ]


# fp rounding slack between the count pass and the extract pass (their matmuls
# have different reduction shapes); boundary pairs are kept, never dropped
THRESHOLD_SLACK = 1e-5

# Wire-format scan slacks: the device scan runs at a LOWERED threshold (see
# wire_scan_threshold) so the candidate set is a SUPERSET of the exact pass,
# and every candidate pair is re-checked in f32 on the host before being
# reported — the final pair set is exact for EITHER wire. Both slacks bound
# the COSINE error |s_wire − s|. int8: per-row-quantized cosine error is
# ~1e-3 at D=768 (measured ~6e-4 rms). fp16: element rounding is 2^-11, which
# bounds the cosine error near ~1e-3 — an exact-duplicate pair can read
# 0.99987 in fp16 and silently miss a 0.9999 threshold without the
# slack+recheck.
INT8_SLACK = 0.02
FP16_SLACK = 2e-3


def wire_scan_threshold(threshold: float, euclidean: bool, slack: float) -> float:
    """Device-scan threshold that makes the candidate set a SUPERSET of the
    exact pass given a wire whose COSINE error is bounded by ``slack``.

    Cosine metric: scan at ``threshold − slack``. Euclidean metric
    d = sqrt(2 − 2s): the slack must be CONVERTED, not subtracted —
    d_wire² = 2 − 2·s_wire ≥ d² − 2·slack, so any pair with exact d > t reads
    at least sqrt(max(t² − 2·slack, 0)) over the wire and the scan runs at
    that bound. When t² ≤ 2·slack the bound degenerates to 0 and a clamped
    wire distance (quantized sim of a near-duplicate can read > 1) could
    still tie it, so the scan must count every pair (−1: distances are ≥ 0)."""
    if not euclidean:
        return threshold - slack
    t2 = threshold * threshold - 2.0 * slack
    return float(np.sqrt(t2)) if t2 > 0.0 else -1.0


def normalize_rows(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.where(norms == 0, 1.0, norms)


@functools.partial(jax.jit, static_argnames=("k", "euclidean"))
def _tile_topk(rows, cols, row_off, col_off, n_real, threshold, k: int, euclidean: bool):
    """One [b, b] tile: matmul → metric → triu mask → per-row top-k + exact count.

    rows/cols: [b, D] normalized f32. Returns (vals [b,k], idx [b,k], counts [b]).
    """
    sim = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
    metric = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0)) if euclidean else sim

    b = rows.shape[0]
    gi = row_off + jnp.arange(b)[:, None]
    gj = col_off + jnp.arange(cols.shape[0])[None, :]
    valid = (gj > gi) & (gj < n_real) & (gi < n_real)
    masked = jnp.where(valid, metric, -jnp.inf)

    vals, idx = jax.lax.top_k(masked, k)
    counts = jnp.sum(masked > threshold, axis=1)
    return vals, idx + col_off, counts


def _tile_metric(rows, cols, euclidean: bool):
    # inputs may arrive as fp16 (the reference also dedups in half precision,
    # _2_remove_duplicates.py:38, and host→device bandwidth matters); the MXU
    # accumulates in f32 either way
    sim = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0)) if euclidean else sim


@functools.partial(jax.jit, static_argnames=("euclidean",))
def _scan_row_panel(stacked, bi, n_real, threshold, euclidean: bool):
    """First pass for one row panel: exact above-threshold counts vs every
    column panel bj ≥ bi, as ONE jitted fori_loop (one dispatch per row panel —
    the naive per-tile top-k is both sort-bound and dispatch-bound).

    stacked: [P, b, D] panel-stacked normalized embeddings; bi traced.
    """
    p, b, _ = stacked.shape
    rows = jax.lax.dynamic_index_in_dim(stacked, bi, 0, keepdims=False)
    gi = bi * b + jnp.arange(b)[:, None]

    def body(bj, acc):
        cols = jax.lax.dynamic_index_in_dim(stacked, bj, 0, keepdims=False)
        metric = _tile_metric(rows, cols, euclidean)
        gj = bj * b + jnp.arange(b)[None, :]
        valid = (gj > gi) & (gj < n_real) & (gi < n_real)
        return acc + jnp.sum(valid & (metric > threshold), axis=1)

    return jax.lax.fori_loop(bi, p, body, jnp.zeros((b,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "euclidean"))
def _extract_hits(stacked, hit_rows, hit_gidx, n_real, threshold, k: int,
                  euclidean: bool):
    """Second pass: exact top-k matches for the (few) hit rows against every
    panel, merged in one fori_loop. hit_gidx carries global row indices for the
    triangle mask (sentinel ≥ n_real disables padding rows)."""
    p, b, _ = stacked.shape
    k_tile = min(k, b)

    def body(bj, carry):
        run_vals, run_idx = carry
        cols = jax.lax.dynamic_index_in_dim(stacked, bj, 0, keepdims=False)
        metric = _tile_metric(hit_rows, cols, euclidean)
        gj = bj * b + jnp.arange(b)[None, :]
        valid = (gj > hit_gidx[:, None]) & (gj < n_real)
        vals, idx = jax.lax.top_k(jnp.where(valid, metric, -jnp.inf), k_tile)
        cat_v = jnp.concatenate([run_vals, vals], axis=1)
        cat_i = jnp.concatenate([run_idx, idx + bj * b], axis=1)
        run_vals, sel = jax.lax.top_k(cat_v, k)
        run_idx = jnp.take_along_axis(cat_i, sel, axis=1)
        return run_vals, run_idx

    h = hit_rows.shape[0]
    init = (jnp.full((h, k), -jnp.inf, jnp.float32), jnp.zeros((h, k), jnp.int32))
    del threshold
    return jax.lax.fori_loop(0, p, body, init)


def quantize_rows_int8(normed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization of normalized embeddings.

    Halves the dominant H2D wire cost of large-N dedup vs the fp16 format
    (~75 s of the 1M pass's 143 s was the tunnel moving fp16 embeddings,
    BENCH_NOTES.md). Returns (int8 [N, D], f32 per-row scale [N])."""
    amax = np.maximum(np.abs(normed).max(axis=1, keepdims=True), 1e-8)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(normed / scale), -127, 127).astype(np.int8)
    return q, scale[:, 0]


def _tile_metric_q(rows_q, rows_s, cols_q, cols_s, euclidean: bool):
    """int8-wire tile metric: int8×int8 MXU matmul (int32 accumulate), then
    the per-row scale outer product on the VPU."""
    acc = jax.lax.dot_general(
        rows_q, cols_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sim = acc.astype(jnp.float32) * rows_s[:, None] * cols_s[None, :]
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0)) if euclidean else sim


@functools.partial(jax.jit, static_argnames=("euclidean",))
def _scan_row_panel_q(stacked_q, scales, bi, n_real, threshold,
                      euclidean: bool):
    """int8-wire variant of :func:`_scan_row_panel` (same structure; the
    caller lowers ``threshold`` via :func:`wire_scan_threshold` — the
    metric-converted INT8_SLACK bound — so counts are a superset)."""
    p, b, _ = stacked_q.shape
    rows_q = jax.lax.dynamic_index_in_dim(stacked_q, bi, 0, keepdims=False)
    rows_s = jax.lax.dynamic_index_in_dim(scales, bi, 0, keepdims=False)
    gi = bi * b + jnp.arange(b)[:, None]

    def body(bj, acc):
        cols_q = jax.lax.dynamic_index_in_dim(stacked_q, bj, 0, keepdims=False)
        cols_s = jax.lax.dynamic_index_in_dim(scales, bj, 0, keepdims=False)
        metric = _tile_metric_q(rows_q, rows_s, cols_q, cols_s, euclidean)
        gj = bj * b + jnp.arange(b)[None, :]
        valid = (gj > gi) & (gj < n_real) & (gi < n_real)
        return acc + jnp.sum(valid & (metric > threshold), axis=1)

    return jax.lax.fori_loop(bi, p, body, jnp.zeros((b,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "euclidean"))
def _extract_hits_q(stacked_q, scales, hit_rows_q, hit_scales, hit_gidx,
                    n_real, threshold, k: int, euclidean: bool):
    """int8-wire variant of :func:`_extract_hits`."""
    p, b, _ = stacked_q.shape
    k_tile = min(k, b)

    def body(bj, carry):
        run_vals, run_idx = carry
        cols_q = jax.lax.dynamic_index_in_dim(stacked_q, bj, 0, keepdims=False)
        cols_s = jax.lax.dynamic_index_in_dim(scales, bj, 0, keepdims=False)
        metric = _tile_metric_q(hit_rows_q, hit_scales, cols_q, cols_s,
                                euclidean)
        gj = bj * b + jnp.arange(b)[None, :]
        valid = (gj > hit_gidx[:, None]) & (gj < n_real)
        vals, idx = jax.lax.top_k(jnp.where(valid, metric, -jnp.inf), k_tile)
        cat_v = jnp.concatenate([run_vals, vals], axis=1)
        cat_i = jnp.concatenate([run_idx, idx + bj * b], axis=1)
        run_vals, sel = jax.lax.top_k(cat_v, k)
        run_idx = jnp.take_along_axis(cat_i, sel, axis=1)
        return run_vals, run_idx

    h = hit_rows_q.shape[0]
    init = (jnp.full((h, k), -jnp.inf, jnp.float32), jnp.zeros((h, k), jnp.int32))
    del threshold
    return jax.lax.fori_loop(0, p, body, init)


# Per-buffer f32-element budget for pass 2 (~256 MB): bounds both the
# [h_chunk, b] metric/sort tiles and the [h_chunk, k] running top-k, so
# extraction never OOMs no matter how many rows hit. A narrow embedding cone
# at a tight threshold can make EVERY row a hit — observed on 100k random-init
# ViT-L embeddings at threshold 0.999 over the int8 wire (scan at 0.979):
# the unchunked [131072, 8192] sort buffers alone exceed a v5e's 16 GB HBM.
EXTRACT_BUDGET_ELEMS = 64 * 1024 * 1024


def _bucket(n: int, lo: int = 128) -> int:
    """Round up to a power of two (bounded recompilation across hit counts)."""
    size = lo
    while size < n:
        size *= 2
    return size


def _required_k(counts: np.ndarray, max_per_row: int) -> int:
    """Per-row extraction capacity that fits the worst pass-1 count.

    ``max_per_row`` is the configured floor; rows needing more escalate it to
    the next power of two ≥ the max count (bounded recompilation), so every
    above-threshold pair is extracted in one pass regardless of duplicate
    multiplicity."""
    need = int(counts.max(initial=0))
    if need <= max_per_row:
        return max_per_row
    return _bucket(need, lo=max(128, max_per_row))


def build_hit_panel(hit: np.ndarray, normed: np.ndarray, n_pad: int,
                    dtype=np.float32):
    """Gather hit rows into a padded panel + global-index array (sentinel
    ≥ n_pad disables padding rows in the triangle mask)."""
    h_pad = _bucket(len(hit))
    gidx = np.full(h_pad, n_pad + 1, np.int32)
    gidx[: len(hit)] = hit
    panel = np.zeros((h_pad, normed.shape[1]), dtype)
    panel[: len(hit)] = normed[hit]
    return panel, gidx


def build_hit_panel_q(hit: np.ndarray, q: np.ndarray, s_row: np.ndarray,
                      n_pad: int):
    """int8-wire :func:`build_hit_panel`: slices the already-quantized rows
    and their scales (quantization is per-row, so q[hit]/s_row[hit] are
    exactly what re-quantizing normed[hit] would produce — no second pass)."""
    panel, gidx = build_hit_panel(hit, q, n_pad, dtype=np.int8)
    scales = np.zeros(len(panel), np.float32)
    scales[: len(hit)] = s_row[hit]
    return panel, scales, gidx


def _exact_metric_host(normed: np.ndarray, rows: np.ndarray, cols: np.ndarray,
                       euclidean: bool) -> np.ndarray:
    """f32 host metric for candidate pairs (the int8 wire's exact recheck).

    Sliced: the fancy-index gathers materialize [P, D] f32 copies, and a
    degenerate scan can emit millions of candidates per chunk — slicing keeps
    the recheck's host footprint to ~0.8 GB regardless of candidate count."""
    out = np.empty(len(rows), np.float32)
    step = 1 << 18
    for s in range(0, len(rows), step):
        out[s:s + step] = np.einsum(
            "ij,ij->i", normed[rows[s:s + step]], normed[cols[s:s + step]])
    if euclidean:
        return np.sqrt(np.maximum(2.0 - 2.0 * out, 0.0))
    return out


def filter_and_recheck(v: np.ndarray, j: np.ndarray, hit_global: np.ndarray,
                       normed: np.ndarray, scan_threshold: float,
                       threshold: float, euclidean: bool):
    """Host side of pass 2 for one hit chunk: slack-banded candidate filter,
    then the exact f32 recheck that makes the reported pair set and metrics
    wire-independent. v/j: [h, k] extracted values/global col indices;
    hit_global: [h] global row indices. Returns (rows, cols, metrics)."""
    # small slack: pass 2's matmul has a different reduction shape than pass
    # 1's count tiles, so a pair exactly at the threshold could otherwise
    # round below it here after rounding above it there and silently vanish
    hit_r, hit_k = np.nonzero(v > scan_threshold - THRESHOLD_SLACK)
    rows = hit_global[hit_r].astype(np.int64)
    cols = j[hit_r, hit_k].astype(np.int64)
    metrics = v[hit_r, hit_k].astype(np.float32)
    if len(rows):
        # exact f32 recheck of the (few) candidates: drops the slack band's
        # false positives and replaces approximate metrics with exact ones
        exact = _exact_metric_host(normed, rows, cols, euclidean)
        keep = exact > threshold - THRESHOLD_SLACK
        rows, cols, metrics = rows[keep], cols[keep], exact[keep]
    return rows, cols, metrics


def extract_chunk_size(tile_elems: int, k: int) -> int:
    """Hit-panel chunk size that keeps every pass-2 device buffer within
    EXTRACT_BUDGET_ELEMS f32 elements: the per-tile sort buffers scale with
    ``tile_elems`` (the column-tile width) and the running top-k with ``k``."""
    return max(128, min(8192, EXTRACT_BUDGET_ELEMS // max(tile_elems, k, 1)))


def warn_if_degenerate(counts: np.ndarray, n: int, threshold: float,
                       scan_threshold: float) -> None:
    """Loud, non-fatal notice when the device scan marks a large share of all
    pairs as candidates: extraction is memory-bounded (chunked) but the run
    degrades to O(N²) work and a large host recheck — almost always a
    too-low threshold for the embedding distribution, not real duplicates."""
    total = int(counts.sum())
    if total > max(1_000_000, 32 * n):
        print(
            f"[dedup] WARNING: {total:,} candidate pairs above the device-scan "
            f"threshold {scan_threshold:.4f} (threshold {threshold} minus the "
            f"wire slack) across {n:,} rows — the embedding distribution is "
            f"near-degenerate at this threshold. Extraction is memory-bounded "
            f"and exact but slow; consider a higher --threshold or the fp16 "
            f"wire (10x tighter scan slack).", flush=True,
        )


def find_duplicate_pairs(
    embeddings: np.ndarray,
    threshold: float = 0.96,
    sim_type: str = "cosine",
    row_block: int = 8192,
    max_per_row: int = 16,
    wire: str = "int8",
) -> DedupResult:
    """Single-device blocked all-pairs near-duplicate search, two passes:

    1. scan — every tile runs matmul + threshold + row-count only (MXU-bound;
       the full-tile top-k the naive design needs is ~30× slower than the
       matmul on TPU),
    2. extract — rows with a nonzero count (rare: actual duplicates) are
       gathered into one padded panel and get an exact per-row top-k against
       every column panel.

    ``wire`` selects the on-device embedding format:
      * ``"int8"`` (default) — per-row-quantized int8, HALF the fp16 wire's
        host→device bytes (the dominant cost of the 1M pass on this tunnel,
        BENCH_NOTES.md) and the MXU's fastest input format.
      * ``"fp16"`` — the round-2 format (reference parity:
        _2_remove_duplicates.py:38 also dedups in half precision).

    Both wires lose precision, so both scan at a lowered threshold (superset)
    and every candidate pair is re-checked in f32 on the host: the REPORTED
    pair set and metrics are exact and wire-independent (tests/test_dedup.py;
    without the recheck, an exact-duplicate pair can read 0.99987 over the
    fp16 wire and silently miss a 0.9999 threshold).

    Peak device memory is O(row_block² + N·D) at any N.
    """
    if wire not in ("int8", "fp16"):
        raise ValueError(f"wire must be 'int8' or 'fp16', got {wire!r}")
    euclidean = sim_type == "euclidean"
    n = len(embeddings)
    normed = normalize_rows(embeddings)
    b = min(row_block, max(128, n))
    n_pad = ((n + b - 1) // b) * b
    if n_pad != n:
        normed = np.pad(normed, ((0, n_pad - n), (0, 0)))

    empty = DedupResult(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.float32), np.empty(0, np.int64),
    )
    if n < 2:
        return empty

    n_panels = n_pad // b
    int8_wire = wire == "int8"
    # the scan must over-capture by the wire's quantization error bound so the
    # exact recheck below can only REMOVE false positives, never miss a pair
    # (metric-aware: the cosine-error slack is converted for euclidean)
    scan_threshold = wire_scan_threshold(
        threshold, euclidean, INT8_SLACK if int8_wire else FP16_SLACK)
    if int8_wire:
        q, s_row = quantize_rows_int8(normed)
        stacked_q = jnp.asarray(q.reshape(n_panels, b, -1))
        scales = jnp.asarray(s_row.reshape(n_panels, b))
        count_chunks = [
            _scan_row_panel_q(stacked_q, scales, jnp.int32(bi), n,
                              scan_threshold, euclidean)
            for bi in range(n_panels)
        ]
    else:
        stacked = jnp.asarray(normed.reshape(n_panels, b, -1).astype(np.float16))
        count_chunks = [
            _scan_row_panel(stacked, jnp.int32(bi), n, scan_threshold, euclidean)
            for bi in range(n_panels)
        ]
    counts = np.concatenate([np.asarray(c) for c in count_chunks]).astype(np.int64)

    hit = np.nonzero(counts > 0)[0]
    if hit.size == 0:
        return empty

    # pass 2: exact top-k for hit rows only. Pass 1's counts bound the true
    # match count from above, so the capacity escalates itself: if any row has
    # more matches than max_per_row, extract with a (power-of-two-bucketed) k
    # that fits the worst row — no user re-run needed, overflow_rows is
    # informational only. Hit rows are processed in bounded chunks so device
    # and host memory stay O(chunk · max(b, k)) even when EVERY row hits (a
    # degenerate dataset / too-low threshold); results are chunk-order
    # invariant because each row's top-k is independent.
    warn_if_degenerate(counts, n, threshold, scan_threshold)
    k = min(_required_k(counts, max_per_row), n_pad)
    chunk = extract_chunk_size(b, k)
    rows_l, cols_l, metrics_l = [], [], []
    for c0 in range(0, len(hit), chunk):
        hc = hit[c0:c0 + chunk]
        if int8_wire:
            hit_q, hit_s, gidx = build_hit_panel_q(hc, q, s_row, n_pad)
            run_vals, run_idx = _extract_hits_q(
                stacked_q, scales, jnp.asarray(hit_q), jnp.asarray(hit_s),
                jnp.asarray(gidx), n, scan_threshold, k, euclidean,
            )
        else:
            hit_panel, gidx = build_hit_panel(hc, normed, n_pad,
                                              dtype=np.float16)
            run_vals, run_idx = _extract_hits(
                stacked, jnp.asarray(hit_panel), jnp.asarray(gidx), n,
                scan_threshold, k, euclidean,
            )
        v = np.asarray(run_vals)[: len(hc)]
        j = np.asarray(run_idx)[: len(hc)]
        r, c, m = filter_and_recheck(v, j, hc, normed, scan_threshold,
                                     threshold, euclidean)
        rows_l.append(r)
        cols_l.append(c)
        metrics_l.append(m)
    return DedupResult(
        rows=np.concatenate(rows_l),
        cols=np.concatenate(cols_l),
        metrics=np.concatenate(metrics_l),
        overflow_rows=np.nonzero(counts > max_per_row)[0].astype(np.int64),
    )


def cosine_similarity_matrix(a: np.ndarray, b: np.ndarray) -> jnp.ndarray:
    """Small-scale dense cosine matrix (labeling-UI / tools use)."""
    an = jnp.asarray(normalize_rows(a))
    bn = jnp.asarray(normalize_rows(b))
    return jnp.dot(an, bn.T, preferred_element_type=jnp.float32)
