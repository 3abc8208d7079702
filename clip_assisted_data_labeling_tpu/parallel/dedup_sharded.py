"""Mesh-sharded all-pairs near-duplicate search — the component that lifts the
reference's ~10k-image dedup cap (README.md:70-71, _2_remove_duplicates.py:140).

Layout: embeddings are row-sharded over a 1-D device mesh. Each device keeps its
row panel resident and a column panel rides the ring: at step s, device p holds
the panel originally owned by device (p−s) mod d, computes its local
[m×m] similarity tile (MXU matmul), folds it into a running per-row top-k, and
``ppermute``s the panel to its right neighbor over ICI. After d steps every
global tile has been visited exactly once; only [N, k] survives on host.

This is the similarity-matrix analog of ring attention (SURVEY.md §5): compute
scales N²/d per device, memory N·D/d + one in-flight panel, communication
overlaps with the matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX ≥ 0.8 public API, with fallback for older releases
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from clip_assisted_data_labeling_tpu.ops.similarity import (
    DedupResult,
    normalize_rows,
)


def _tile(rows, cols, row_off, col_off, n_real, threshold, k, euclidean):
    """Same tile computation as ops.similarity._tile_topk but trace-friendly for
    use inside shard_map (offsets are traced)."""
    sim = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
    metric = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0)) if euclidean else sim
    gi = row_off + jnp.arange(rows.shape[0])[:, None]
    gj = col_off + jnp.arange(cols.shape[0])[None, :]
    valid = (gj > gi) & (gj < n_real) & (gi < n_real)
    masked = jnp.where(valid, metric, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, k)
    counts = jnp.sum(masked > threshold, axis=1)
    return vals, idx + col_off, counts


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_devices", "k", "euclidean", "axis")
)
def _ring_dedup(
    normed, n_real, threshold, mesh: Mesh, n_devices: int, k: int, euclidean: bool,
    axis: str = "data",
):
    m = normed.shape[0] // n_devices

    # per-tile top-k cannot exceed the tile width m, but the *running* capacity
    # is the requested k — merging across the d ring steps accumulates up to d·m
    # candidates per row, so small shards don't silently shrink capacity.
    k_tile = min(k, m)

    def ring_fn(local):
        local = local.reshape(m, local.shape[-1])
        p = jax.lax.axis_index(axis)
        row_off = p * m
        col_block = local
        run_vals = jnp.full((m, k), -jnp.inf, jnp.float32)
        run_idx = jnp.zeros((m, k), jnp.int32)
        counts = jnp.zeros((m,), jnp.int32)
        perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
        for s in range(n_devices):
            src = (p - s) % n_devices
            vals, idx, cnt = _tile(
                local, col_block, row_off, src * m, n_real, threshold, k_tile, euclidean
            )
            counts = counts + cnt
            cat_v = jnp.concatenate([run_vals, vals], axis=1)
            cat_i = jnp.concatenate([run_idx, idx], axis=1)
            run_vals, sel = jax.lax.top_k(cat_v, k)
            run_idx = jnp.take_along_axis(cat_i, sel, axis=1)
            if s < n_devices - 1:
                col_block = jax.lax.ppermute(col_block, axis, perm)
        return run_vals, run_idx, counts

    return shard_map(
        ring_fn,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )(normed)


def find_duplicate_pairs_sharded(
    embeddings: np.ndarray,
    threshold: float = 0.96,
    sim_type: str = "cosine",
    mesh: Mesh | None = None,
    max_per_row: int = 16,
    axis: str = "data",
) -> DedupResult:
    if mesh is None:
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
    n_devices = int(np.prod(mesh.devices.shape))
    n = len(embeddings)
    normed = normalize_rows(embeddings)
    m = (n + n_devices - 1) // n_devices
    n_pad = m * n_devices
    if n_pad != n:
        normed = np.pad(normed, ((0, n_pad - n), (0, 0)))
    k = min(max_per_row, n_pad)

    # fp16 over the wire and around the ring: halves H2D + ICI traffic (the
    # reference dedups in half precision too, _2_remove_duplicates.py:38)
    sharded = jax.device_put(
        jnp.asarray(normed.astype(np.float16)), NamedSharding(mesh, P(axis, None))
    )
    vals, idx, counts = _ring_dedup(
        sharded, n, threshold, mesh, n_devices, k, sim_type == "euclidean", axis
    )
    v = np.asarray(vals)
    j = np.asarray(idx)
    c = np.asarray(counts)
    hit_r, hit_k = np.nonzero(v > threshold)
    return DedupResult(
        rows=hit_r.astype(np.int64),
        cols=j[hit_r, hit_k].astype(np.int64),
        metrics=v[hit_r, hit_k],
        overflow_rows=np.nonzero(c > k)[0].astype(np.int64),
    )
