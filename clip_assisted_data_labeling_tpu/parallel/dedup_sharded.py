"""Mesh-sharded all-pairs near-duplicate search — the component that lifts the
reference's ~10k-image dedup cap (README.md:70-71, _2_remove_duplicates.py:140).

Layout: embeddings are row-sharded over a 1-D device mesh, fp16 over the wire.
Two passes (same shape as the single-device ops/similarity.py design):

  1. counts — each device keeps its row panel resident while column panels ride
     the ring: at step s, device p holds the panel originally owned by device
     (p−s) mod d, computes its [m×m] metric tile (MXU matmul) and accumulates
     exact above-threshold counts, then ``ppermute``s the panel onward over ICI.
     No top-k anywhere in the O(N²) part.
  2. extract — the (rare) rows with matches are gathered on host, replicated to
     every device, and each device computes their top-k against its OWN resident
     shard only (embarrassingly parallel, no ring); the host merges d partial
     top-k lists.

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

from clip_assisted_data_labeling_tpu.parallel.mesh import (
    compat_shard_map as shard_map,
)

from clip_assisted_data_labeling_tpu.ops.similarity import (
    FP16_SLACK,
    INT8_SLACK,
    DedupResult,
    _required_k,
    extract_chunk_size,
    filter_and_recheck,
    warn_if_degenerate,
    _tile_metric as _metric,
    _tile_metric_q as _metric_q,
    build_hit_panel,
    build_hit_panel_q,
    normalize_rows,
    quantize_rows_int8,
    wire_scan_threshold,
)


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of other processes (multi-host SPMD:
    every host must run this module's calls simultaneously with the same data)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _put_row_sharded(normed: np.ndarray, mesh: Mesh, axis: str):
    """Row-shard the (host-complete) embedding panel over the mesh. On a
    multi-host mesh each process feeds only its addressable shards."""
    sharding = NamedSharding(mesh, P(axis, *([None] * (normed.ndim - 1))))
    if not _spans_processes(mesh):
        return jax.device_put(jnp.asarray(normed), sharding)
    arrays = [
        jax.device_put(normed[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(normed.shape).items()
    ]
    return jax.make_array_from_single_device_arrays(normed.shape, sharding, arrays)


def _put_replicated(x: np.ndarray, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    if not _spans_processes(mesh):
        return jax.device_put(jnp.asarray(x), sharding)
    arrays = [jax.device_put(x, d) for d in sharding.addressable_devices]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, arrays)


def _fetch(x, mesh: Mesh) -> np.ndarray:
    """Device→host fetch of a (possibly cross-process-sharded) array."""
    if _spans_processes(mesh):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_devices", "euclidean", "axis")
)
def _ring_counts(
    normed, n_real, threshold, mesh: Mesh, n_devices: int, euclidean: bool,
    axis: str = "data",
):
    """Pass 1: exact above-threshold count per row. Row panels stay resident,
    column panels ride the ring (ppermute over ICI) — matmul + compare + row-sum
    only; the expensive top-k runs later on the (rare) hit rows."""
    m = normed.shape[0] // n_devices

    def ring_fn(local):
        local = local.reshape(m, local.shape[-1])
        p = jax.lax.axis_index(axis)
        gi = p * m + jnp.arange(m)[:, None]
        col_block = local
        counts = jnp.zeros((m,), jnp.int32)
        perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
        for s in range(n_devices):
            src = (p - s) % n_devices
            metric = _metric(local, col_block, euclidean)
            gj = src * m + jnp.arange(m)[None, :]
            valid = (gj > gi) & (gj < n_real) & (gi < n_real)
            counts = counts + jnp.sum(valid & (metric > threshold), axis=1)
            if s < n_devices - 1:
                col_block = jax.lax.ppermute(col_block, axis, perm)
        return counts

    return shard_map(
        ring_fn, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis)
    )(normed)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_devices", "euclidean", "axis")
)
def _ring_counts_q(
    q8, scales, n_real, threshold, mesh: Mesh, n_devices: int, euclidean: bool,
    axis: str = "data",
):
    """int8-wire pass 1: the per-row-quantized panel AND its f32 row scales
    ride the ring together — the ICI bytes per step drop to D + 4 per row
    (vs 2·D fp16). Caller lowers ``threshold`` by the int8 slack; the exact
    host recheck keeps the final pair set identical to the fp16 ring's."""
    m = q8.shape[0] // n_devices

    def ring_fn(local_q, local_s):
        local_q = local_q.reshape(m, local_q.shape[-1])
        local_s = local_s.reshape(m)
        p = jax.lax.axis_index(axis)
        gi = p * m + jnp.arange(m)[:, None]
        col_q, col_s = local_q, local_s
        counts = jnp.zeros((m,), jnp.int32)
        perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
        for s in range(n_devices):
            src = (p - s) % n_devices
            metric = _metric_q(local_q, local_s, col_q, col_s, euclidean)
            gj = src * m + jnp.arange(m)[None, :]
            valid = (gj > gi) & (gj < n_real) & (gi < n_real)
            counts = counts + jnp.sum(valid & (metric > threshold), axis=1)
            if s < n_devices - 1:
                col_q = jax.lax.ppermute(col_q, axis, perm)
                col_s = jax.lax.ppermute(col_s, axis, perm)
        return counts

    return shard_map(
        ring_fn, mesh=mesh, in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis),
    )(q8, scales)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_devices", "k", "euclidean", "axis")
)
def _sharded_extract_q(
    q8, scales, hit_q, hit_s, hit_gidx, n_real, mesh: Mesh, n_devices: int,
    k: int, euclidean: bool, axis: str = "data",
):
    """int8-wire pass 2 (structure of :func:`_sharded_extract`)."""
    m = q8.shape[0] // n_devices
    k_tile = min(k, m)

    def extract_fn(local_q, local_s, hq, hs, gidx):
        local_q = local_q.reshape(m, local_q.shape[-1])
        local_s = local_s.reshape(m)
        p = jax.lax.axis_index(axis)
        metric = _metric_q(hq, hs, local_q, local_s, euclidean)
        gj = p * m + jnp.arange(m)[None, :]
        valid = (gj > gidx[:, None]) & (gj < n_real)
        vals, idx = jax.lax.top_k(jnp.where(valid, metric, -jnp.inf), k_tile)
        return vals[None], (idx + p * m)[None]

    return shard_map(
        extract_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P()),
        out_specs=(P(axis, None, None), P(axis, None, None)),
    )(q8, scales, hit_q, hit_s, hit_gidx)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_devices", "k", "euclidean", "axis")
)
def _sharded_extract(
    normed, hit_rows, hit_gidx, n_real, mesh: Mesh, n_devices: int, k: int,
    euclidean: bool, axis: str = "data",
):
    """Pass 2: hit rows are replicated; each device computes their top-k against
    its OWN resident column shard (no ring needed) and the host merges the d
    partial top-k lists."""
    m = normed.shape[0] // n_devices
    k_tile = min(k, m)

    def extract_fn(local, hits, gidx):
        local = local.reshape(m, local.shape[-1])
        p = jax.lax.axis_index(axis)
        metric = _metric(hits, local, euclidean)
        gj = p * m + jnp.arange(m)[None, :]
        valid = (gj > gidx[:, None]) & (gj < n_real)
        vals, idx = jax.lax.top_k(jnp.where(valid, metric, -jnp.inf), k_tile)
        return vals[None], (idx + p * m)[None]

    return shard_map(
        extract_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(axis, None, None), P(axis, None, None)),
    )(normed, hit_rows, hit_gidx)


def find_duplicate_pairs_sharded(
    embeddings: np.ndarray,
    threshold: float = 0.96,
    sim_type: str = "cosine",
    mesh: Mesh | None = None,
    max_per_row: int = 16,
    axis: str = "data",
    wire: str = "int8",
) -> DedupResult:
    if wire not in ("int8", "fp16"):
        raise ValueError(f"wire must be 'int8' or 'fp16', got {wire!r}")
    if mesh is None:
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
    n_devices = int(np.prod(mesh.devices.shape))
    n = len(embeddings)
    euclidean = sim_type == "euclidean"
    int8_wire = wire == "int8"
    if n < 2:  # same degenerate-input contract as find_duplicate_pairs
        return DedupResult(
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.float32), np.empty(0, np.int64),
        )
    normed_f32 = normalize_rows(embeddings)
    m = (n + n_devices - 1) // n_devices
    n_pad = m * n_devices
    if n_pad != n:
        normed_f32 = np.pad(normed_f32, ((0, n_pad - n), (0, 0)))

    empty = DedupResult(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.float32), np.empty(0, np.int64),
    )

    # Quantized over the wire and around the ring: int8 (default) ships D + 4
    # bytes per row per ring step, fp16 (reference parity: the reference also
    # dedups in half precision, _2_remove_duplicates.py:38) ships 2·D. Either
    # wire loses precision (fp16 rounding alone moves a cosine up to ~1e-3),
    # so the device passes run at a LOWERED threshold (superset) and
    # candidates are re-checked in f32 on the host — the reported pair set is
    # exact and wire-independent (same contract as the single-device path,
    # ops/similarity.find_duplicate_pairs; the cosine-error slack is converted
    # for the euclidean metric — ops/similarity.wire_scan_threshold).
    scan_threshold = wire_scan_threshold(
        threshold, euclidean, INT8_SLACK if int8_wire else FP16_SLACK)
    if int8_wire:
        q8, s_row = quantize_rows_int8(normed_f32)
        sharded_q = _put_row_sharded(q8, mesh, axis)
        sharded_s = _put_row_sharded(s_row, mesh, axis)
        counts = _fetch(
            _ring_counts_q(sharded_q, sharded_s, n, scan_threshold, mesh,
                           n_devices, euclidean, axis), mesh
        )
    else:
        normed = normed_f32.astype(np.float16)
        sharded = _put_row_sharded(normed, mesh, axis)
        counts = _fetch(
            _ring_counts(sharded, n, scan_threshold, mesh, n_devices,
                         euclidean, axis), mesh
        )
    hit = np.nonzero(counts > 0)[0]
    if hit.size == 0:
        return empty

    # auto-escalate per-row capacity to fit the worst exact count (see
    # ops/similarity._required_k) — overflow never requires a user re-run.
    # Hit rows are chunked so the replicated [h, m] per-device metric/sort
    # tiles and [h, k] merges stay within the extraction budget even when
    # every row hits (degenerate data / too-low threshold) — same bounded-
    # memory contract as the single-device path (ops/similarity).
    warn_if_degenerate(counts, n, threshold, scan_threshold)
    k = min(_required_k(counts, max_per_row), n_pad)
    chunk = extract_chunk_size(m, k)
    rows_l, cols_l, metrics_l = [], [], []
    for c0 in range(0, len(hit), chunk):
        hc = hit[c0:c0 + chunk]
        if int8_wire:
            hit_q, hit_s, gidx = build_hit_panel_q(hc, q8, s_row, n_pad)
            h_pad = len(hit_q)
            vals, idx = _sharded_extract_q(
                sharded_q, sharded_s, _put_replicated(hit_q, mesh),
                _put_replicated(hit_s, mesh), _put_replicated(gidx, mesh),
                n, mesh, n_devices, k, euclidean, axis,
            )
        else:
            hit_panel, gidx = build_hit_panel(hc, normed, n_pad,
                                              dtype=np.float16)
            h_pad = len(hit_panel)
            vals, idx = _sharded_extract(
                sharded, _put_replicated(hit_panel, mesh),
                _put_replicated(gidx, mesh), n, mesh, n_devices, k, euclidean,
                axis,
            )
        # merge the d per-device top-k lists: [d, H, k_tile] → [H, d*k_tile]
        v = _fetch(vals, mesh).transpose(1, 0, 2).reshape(h_pad, -1)[: len(hc)]
        j = _fetch(idx, mesh).transpose(1, 0, 2).reshape(h_pad, -1)[: len(hc)]
        order = np.argsort(-v, axis=1)[:, :k]
        v = np.take_along_axis(v, order, axis=1)
        j = np.take_along_axis(j, order, axis=1)
        r, c, mets = filter_and_recheck(v, j, hc, normed_f32, scan_threshold,
                                        threshold, euclidean)
        rows_l.append(r)
        cols_l.append(c)
        metrics_l.append(mets)
    return DedupResult(
        rows=np.concatenate(rows_l),
        cols=np.concatenate(cols_l),
        metrics=np.concatenate(metrics_l),
        overflow_rows=np.nonzero(counts > max_per_row)[0].astype(np.int64),
    )
