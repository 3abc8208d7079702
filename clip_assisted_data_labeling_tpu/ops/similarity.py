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
    overflow_rows: np.ndarray  # rows whose above-threshold matches exceeded capacity

    def pairs(self) -> list[tuple[int, int, float]]:
        return [
            (int(i), int(j), float(m))
            for i, j, m in zip(self.rows, self.cols, self.metrics)
        ]


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


def find_duplicate_pairs(
    embeddings: np.ndarray,
    threshold: float = 0.96,
    sim_type: str = "cosine",
    row_block: int = 8192,
    max_per_row: int = 16,
) -> DedupResult:
    """Single-device blocked all-pairs near-duplicate search.

    Streams [row_block, D] panels through the device; peak device memory is
    O(row_block² + row_block·D) regardless of N.
    """
    euclidean = sim_type == "euclidean"
    n = len(embeddings)
    normed = normalize_rows(embeddings)
    b = min(row_block, max(128, n))
    n_pad = ((n + b - 1) // b) * b
    if n_pad != n:
        normed = np.pad(normed, ((0, n_pad - n), (0, 0)))
    k = min(max_per_row, b)

    all_rows, all_cols, all_vals = [], [], []
    overflow = []
    panels = [jnp.asarray(normed[s : s + b]) for s in range(0, n_pad, b)]
    for bi, rows in enumerate(panels):
        row_off = bi * b
        # running per-row top-k across column panels (upper triangle only)
        run_vals = None
        run_idx = None
        counts = jnp.zeros((b,), jnp.int32)
        for bj in range(bi, len(panels)):
            vals, idx, cnt = _tile_topk(
                rows, panels[bj], row_off, bj * b, n, threshold, k, euclidean
            )
            counts = counts + cnt
            if run_vals is None:
                run_vals, run_idx = vals, idx
            else:
                cat_v = jnp.concatenate([run_vals, vals], axis=1)
                cat_i = jnp.concatenate([run_idx, idx], axis=1)
                run_vals, sel = jax.lax.top_k(cat_v, k)
                run_idx = jnp.take_along_axis(cat_i, sel, axis=1)
        v = np.asarray(run_vals)
        j = np.asarray(run_idx)
        c = np.asarray(counts)
        hit_r, hit_k = np.nonzero(v > threshold)
        all_rows.append(hit_r + row_off)
        all_cols.append(j[hit_r, hit_k])
        all_vals.append(v[hit_r, hit_k])
        overflow.append(np.nonzero(c > k)[0] + row_off)

    return DedupResult(
        rows=np.concatenate(all_rows) if all_rows else np.empty(0, np.int64),
        cols=np.concatenate(all_cols) if all_cols else np.empty(0, np.int64),
        metrics=np.concatenate(all_vals) if all_vals else np.empty(0, np.float32),
        overflow_rows=np.concatenate(overflow) if overflow else np.empty(0, np.int64),
    )


def cosine_similarity_matrix(a: np.ndarray, b: np.ndarray) -> jnp.ndarray:
    """Small-scale dense cosine matrix (labeling-UI / tools use)."""
    an = jnp.asarray(normalize_rows(a))
    bn = jnp.asarray(normalize_rows(b))
    return jnp.dot(an, bn.T, preferred_element_type=jnp.float32)
