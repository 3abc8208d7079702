"""Fused short-sequence attention — Pallas TPU kernel.

ViT attention at CLIP scales (seq ≈ 257 tokens for L/14 @ 224) is tiny in FLOPs
but XLA's default lowering materializes the [B, h, S, S] score/probability
tensors in HBM (f32 scores + bf16 probs ≈ 6.5 GB of traffic per ViT-L layer at
256 crops), which caps the encoder near ~45% MFU. At these sequence lengths the
ENTIRE attention row for one (batch, head) fits comfortably in VMEM, so the
kernel simply computes q·kᵀ → masked softmax → ·v in one pass per (batch·head)
grid step: no flash-attention tiling machinery needed, zero HBM round-trips for
the intermediates.

Numerics match the XLA path: scores accumulate in f32 on the MXU, softmax in
f32, probabilities cast to the value dtype for the output matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_real: int):
    # one batch item per grid step; unrolled loop over its heads keeps the
    # per-program DMA/launch overhead amortized
    n_heads, s_pad, _d = q_ref.shape[1:]
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    for h in range(n_heads):
        q = q_ref[0, h]  # [S_pad, d]
        k = k_ref[0, h]
        v = v_ref[0, h]
        scores = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(col < s_real, scores, -jnp.inf)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
        o_ref[0, h] = (jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_norm).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dividing_tile(s_pad: int, lo: int, hi: int, key) -> int | None:
    """The 8-multiple divisor of ``s_pad`` in [lo, hi] minimizing ``key``
    (ties → smallest), or None. Shared by the q-row-tiled kernels (largest
    tile wins) and the flash kernel (closest-to-target tile wins)."""
    cands = [t for t in range(lo, hi + 1, 8) if s_pad % t == 0]
    return min(cands, key=key) if cands else None


def _q_tile(s_pad: int) -> int:
    """Query-row tile for the long-sequence kernels. Whole block when it's
    small; otherwise prefer the LARGEST 8-multiple divisor of s_pad in
    [128, 448] — a dividing tile needs no clamped final tile, so no rows are
    recomputed (256-with-clamp at ViT-L-336's s_pad=584 ran tiles at rows
    0/256/328: 184 of 584 rows' scores+softmax+AV computed TWICE);
    256-with-clamp remains the fallback for divisor-free lengths (callers
    avoid it by padding with :func:`_pad_for_tiling`)."""
    if s_pad <= 448:
        return s_pad
    return _dividing_tile(s_pad, 128, 448, key=lambda t: -t) or 256


def _pad_for_tiling(s: int) -> int:
    """Sequence padding that buys exact q-row tiling: the smallest 8-multiple
    ≥ s (searched ≤64 rows up) that an in-range _q_tile divides exactly.
    ViT-L-336's 577 tokens pad to 592 = 2×296 (1.4% masked pad rows) instead
    of 584 with a 24%-overlap clamped tile. Padded rows/columns are handled
    by the kernels' existing s_real masking."""
    base = _round_up(s, 8)
    if base <= 448:
        return base
    for extra in range(0, 65, 8):
        sp = base + extra
        if sp % _q_tile(sp) == 0:
            return sp
    return base


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(
    q: jnp.ndarray,  # [B, h, S, d]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale)·v without materializing scores in HBM."""
    b, h, s, d = q.shape
    s_pad = _round_up(s, 8)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    spec = pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_real=s),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_env_interpret(interpret),
    )(q, k, v)
    return out[:, :, :s, :]


def packed_attention_fits(s: int, width: int, itemsize: int = 2) -> bool:
    """Can the packed kernel's per-step block fit the ~16 MB scoped VMEM
    budget at grid granularity 1? (Double-buffered [S_pad, 3w] in +
    [S_pad, w] out, plus the row-tiled score working set.) PE-G14-448
    (S=1024, w=1536) overflows — packed_attention_auto routes it to the
    head-grouped kernel (then the flash kernel beyond THAT gate).
    ``itemsize``: bytes per qkv element (2 for bf16; f32 runs pass 4)."""
    s_pad = _pad_for_tiling(s)
    q_tile = _q_tile(s_pad)
    blocks = 2 * s_pad * 4 * width * itemsize
    working = 2 * q_tile * s_pad * 4 + 4 * s_pad * width
    return blocks + working <= 14 * 2**20


def packed_q8s_fits(s: int, width: int, heads: int) -> bool:
    """VMEM gate for :func:`fused_attention_packed_q8s`. The kernel q-row-tiles
    long sequences exactly like :func:`_packed_kernel` (the [q_tile, S_pad] f32
    score/prob set lives inside a fori_loop, so there is ONE shared copy), so
    the budget is: double-buffered int8 in/out blocks + the per-head
    dequantized bf16 k/v temporaries (the unrolled head loop's coexisting
    allocations, same shape as the proven rope temporaries in the bf16 tiled
    kernel) + one tile's f32 score/prob/q working set — within the ~14 MB
    scoped budget. ViT-L-336's (577, 1024, 16) now fits (~8.9 MB)."""
    d = width // heads
    s_pad = _pad_for_tiling(s)
    q_tile = _q_tile(s_pad)
    blocks = 2 * (s_pad * 4 * width)  # int8 [S,3w] in + [S,w] out, 2 buffers
    kv = heads * 2 * s_pad * d * 2  # bf16 k/v per unrolled head
    working = 2 * q_tile * s_pad * 4 + 3 * q_tile * d * 4  # scores+probs, q/out
    return blocks + kv + working <= 14 * 2**20


def _env_interpret(interpret: bool) -> bool:
    """CTPU_PALLAS_INTERPRET=1 forces interpreter mode everywhere — lets the
    CPU test suite drive the full fused-kernel paths (lnk blocks, rope,
    quant_out) that otherwise only execute on real hardware."""
    import os

    return interpret or os.environ.get("CTPU_PALLAS_INTERPRET") == "1"


def attention_xla(q, k, v, scale):
    """Reference XLA path (materializes scores); used on CPU and in tests."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _packed_grouped_kernel(qkv_ref, *refs, heads_per_group: int, scale: float,
                           s_real: int, has_rope: bool,
                           whole_scores: bool = False):
    """Head-grouped variant for towers whose full [S, 3w] block overflows
    scoped VMEM (PE-G14-448: S=1024, w=1536). The wrapper views packed qkv as
    [B, 3, S, w] (one transposed copy, cheap at this scale) so the grid's
    second axis can slice a GROUP of heads' columns with natural (S, w)
    minor-dim tiling; per step the block is [3, S, d·hpg], ~5 MB at
    G14 scale. Inside, per head: same q-row-tiled exact-masked softmax as
    _packed_kernel."""
    it = iter(refs)
    cos_ref = next(it) if has_rope else None
    sin_ref = next(it) if has_rope else None
    (o_ref,) = it
    s_pad = qkv_ref.shape[2]  # layout [1, 3, S_pad, wg]
    wg = o_ref.shape[2]
    d = wg // heads_per_group

    if whole_scores:
        # Pipelined whole-scores mode (long sequences): the per-step block is
        # one small head GROUP, so the full [S_pad, S_pad] scores fit VMEM
        # where the whole-block kernel must row-tile — re-enabling the
        # depth-2 head-lookahead schedule (QKᵀ(h+1) and AV(h-1) issue before
        # softmax(h), see _packed_kernel) that the tiled fori_loop cannot
        # express profitably. The wrapper picks heads_per_group so
        # hpg × 2 × S_pad² f32 + blocks stays inside scoped VMEM.
        col_f = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)

        def _qk(h):
            k = qkv_ref[0, 1, :, h * d : (h + 1) * d]
            q = qkv_ref[0, 0, :, h * d : (h + 1) * d] * (
                jnp.asarray(scale, qkv_ref.dtype)
            )
            if has_rope:
                k = _rot_half(k, cos_ref[:], sin_ref[:])
                q = _rot_half(q, cos_ref[:], sin_ref[:])
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if s_real < s_pad:
                scores = jnp.where(col_f < s_real, scores, -jnp.inf)
            return scores

        def _av(h, probs, inv_norm):
            v = qkv_ref[0, 2, :, h * d : (h + 1) * d]
            o_ref[0, :, h * d : (h + 1) * d] = (
                jax.lax.dot_general(
                    probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * inv_norm
            ).astype(o_ref.dtype)

        nxt = _qk(0)
        pend = None
        for hh in range(heads_per_group):
            scores = nxt
            if hh + 1 < heads_per_group:
                nxt = _qk(hh + 1)
            if pend is not None:
                _av(*pend)
            m = jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.exp(scores - m)
            inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
            pend = (hh, probs, inv_norm)
        _av(*pend)
        return

    q_tile = _q_tile(s_pad)
    n_tiles = -(-s_pad // q_tile)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, s_pad), 1)
    for h in range(heads_per_group):
        k = qkv_ref[0, 1, :, h * d : (h + 1) * d]
        v = qkv_ref[0, 2, :, h * d : (h + 1) * d]
        if has_rope:
            k = _rot_half(k, cos_ref[:], sin_ref[:])

        def tile_body(t, _, k=k, v=v, h=h):
            r0 = pl.multiple_of(jnp.minimum(t * q_tile, s_pad - q_tile), 8)
            q = qkv_ref[0, 0, pl.ds(r0, q_tile), h * d : (h + 1) * d] * (
                jnp.asarray(scale, qkv_ref.dtype)
            )
            if has_rope:
                q = _rot_half(q, cos_ref[pl.ds(r0, q_tile), :],
                              sin_ref[pl.ds(r0, q_tile), :])
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if s_real < s_pad:
                scores = jnp.where(col < s_real, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.exp(scores - m)
            inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
            head_out = jax.lax.dot_general(
                probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_norm
            o_ref[0, pl.ds(r0, q_tile), h * d : (h + 1) * d] = (
                head_out.astype(o_ref.dtype)
            )
            return 0

        if n_tiles == 1:
            tile_body(0, 0)
        else:
            # (pipelined tile lookahead measured SLOWER here — see the
            # disproof note in _packed_kernel's tiled branch)
            jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "interpret", "s_real", "head_group",
                     "whole_scores"),
)
def fused_attention_packed_grouped(
    qkv: jnp.ndarray,  # [B, S, 3w]
    heads: int,
    scale: float,
    interpret: bool = False,
    s_real: int | None = None,
    rope: tuple | None = None,
    head_group: int | None = None,  # heads per grid step (None: auto)
    whole_scores: bool | None = None,  # None: auto (see _wholescore_group)
):
    """Packed attention with the grid split over (batch, head groups) — the
    big-tower sibling of :func:`fused_attention_packed` (see the kernel
    docstring). Returns [B, S, w] in qkv's dtype.

    ``whole_scores``: pipelined whole-[S,S]-scores mode with a small head
    group (see the kernel docstring); auto-engages for long sequences when
    the pipeline knob is on and a viable group size exists."""
    b, s, w3 = qkv.shape
    if s_real is None:
        s_real = s
    w = w3 // 3
    d = w // heads
    if whole_scores is None:
        from clip_assisted_data_labeling_tpu.ops import knobs

        whole_scores = (
            knobs.ATTN_PIPELINE
            and head_group is None
            and _wholescore_group(s, w, heads, qkv.dtype.itemsize) is not None
        )
    if whole_scores and head_group is None:
        head_group = _wholescore_group(s, w, heads, qkv.dtype.itemsize)
        if head_group is None:
            whole_scores = False
    if head_group is None:
        # largest group with lane-aligned columns that keeps the block small
        head_group = 1
        for hg in range(heads, 0, -1):
            if heads % hg == 0 and (d * hg) % 128 == 0 and (
                2 * s * 3 * d * hg * qkv.dtype.itemsize < 6 * 2**20
            ):
                head_group = hg
                break
    s_pad = _pad_for_tiling(s)
    if s_pad != s:
        qkv = jnp.pad(qkv, [(0, 0), (0, s_pad - s), (0, 0)])
    qkv4 = qkv.reshape(b, s_pad, 3, w).transpose(0, 2, 1, 3)
    wg = d * head_group
    rope_in, rope_specs = [], []
    if rope is not None:
        half = d // 2
        for t in rope:
            t = jnp.asarray(t, jnp.float32)
            if t.shape[0] != s_pad:
                t = jnp.pad(t, [(0, s_pad - t.shape[0]), (0, 0)])
            rope_in.append(t.astype(qkv.dtype))
            rope_specs.append(
                pl.BlockSpec((s_pad, half), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
            )
    out = pl.pallas_call(
        functools.partial(
            _packed_grouped_kernel, heads_per_group=head_group, scale=scale,
            s_real=s_real, has_rope=rope is not None,
            whole_scores=whole_scores,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        grid=(b, heads // head_group),
        in_specs=[
            pl.BlockSpec((1, 3, s_pad, wg), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
        ] + rope_specs,
        out_specs=pl.BlockSpec((1, s_pad, wg), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=_env_interpret(interpret),
    )(qkv4, *rope_in)
    return out[:, :s, :]


def _wholescore_group(s: int, width: int, heads: int,
                      itemsize: int = 2) -> int | None:
    """Head-group size for the grouped kernel's pipelined whole-scores mode,
    or None when not viable. Only long sequences qualify (s_pad > _q_tile's
    whole-block cap — shorter ones already run the pipelined whole-block
    kernel); picks the largest lane-aligned group whose unrolled working set
    — ~(2·hpg+1) [S_pad, S_pad] f32 buffers (scores+probs per head, Mosaic
    reuses nothing across unrolled iterations, +1 pending depth-2 probs) —
    plus the double-buffered group blocks fits scoped VMEM."""
    s_pad = _pad_for_tiling(s)
    if _q_tile(s_pad) >= s_pad:
        return None
    d = width // heads
    for hg in range(heads, 0, -1):
        if heads % hg or (d * hg) % 128:
            continue
        blocks = 2 * 4 * s_pad * d * hg * itemsize  # [3,S,wg] in + [S,wg] out
        work = (2 * hg + 1) * s_pad * s_pad * 4
        if blocks + work <= 12 * 2**20:
            return hg
    return None


def grouped_attention_fits(s: int, width: int, heads: int,
                           itemsize: int = 2) -> bool:
    """Can the head-grouped kernel's per-step [3, S_pad, wg] block (wg = the
    smallest 128-multiple head slice) fit scoped VMEM double-buffered, plus
    its row-tiled working set?"""
    s_pad = _pad_for_tiling(s)
    d = width // heads
    wg = d
    while wg % 128 != 0:
        wg += d
    q_tile = _q_tile(s_pad)
    blocks = 2 * (3 * s_pad * wg + s_pad * wg) * itemsize
    working = 2 * q_tile * s_pad * 4
    return blocks + working <= 14 * 2**20


def packed_attention_auto(qkv, heads: int, scale: float,
                          s_real: int | None = None, rope: tuple | None = None):
    """Choose the packed-attention implementation by VMEM budget, fastest
    first (all three measured on-chip, benchmarks/bench_attention.py):

      1. whole-block — one [S, 3w] block resident, zero re-reads; wins
         wherever it fits (ViT-L-224: 3.1 ms vs grouped 3.9 / flash 4.8;
         ViT-L-336: 4.5 vs 6.0 / 4.8),
      2. head-grouped — k/v of a 128-multiple head slice resident per step;
         wins at PE-G14-448 (3.6 ms vs flash 5.9, XLA fallback 5.1),
      3. k/v-streaming flash — fixed ~2 MB footprint at ANY sequence length
         (it re-reads k/v once per q tile, so it only wins when even one
         head-group's [3, S, wg] overflows VMEM: S ≳ 7k).

    The XLA fallback is never needed — the biggest tower stays on a fused
    path. Used by every fused block path in models/vit.py.

    ``CTPU_ATTN_WHOLESCORES_ROUTE=1`` (ops/knobs.py) prefers the grouped
    kernel's pipelined whole-scores mode over a whole-block kernel that would
    have to row-tile (long sequences: the row-tiled head loop cannot express
    the depth-2 lookahead schedule) — opt-in A/B knob until measured."""
    w = qkv.shape[-1] // 3
    if packed_attention_fits(qkv.shape[1], w, qkv.dtype.itemsize):
        from clip_assisted_data_labeling_tpu.ops import knobs

        s_pad = _pad_for_tiling(qkv.shape[1])
        if (knobs.ATTN_WHOLESCORES_ROUTE and _q_tile(s_pad) < s_pad
                and _wholescore_group(qkv.shape[1], w, heads,
                                      qkv.dtype.itemsize) is not None):
            return fused_attention_packed_grouped(
                qkv, heads=heads, scale=scale, s_real=s_real, rope=rope,
                whole_scores=True)
        return fused_attention_packed(qkv, heads=heads, scale=scale,
                                      s_real=s_real, rope=rope)
    if grouped_attention_fits(qkv.shape[1], w, heads, qkv.dtype.itemsize):
        return fused_attention_packed_grouped(qkv, heads=heads, scale=scale,
                                              s_real=s_real, rope=rope)
    return flash_attention_packed(qkv, heads=heads, scale=scale,
                                  s_real=s_real, rope=rope)


def _flash_kernel(q_ref, k_ref, v_ref, *refs, scale: float, s_real: int,
                  k_panel: int, head_group: int, has_rope: bool):
    """Online-softmax body: one (batch, head-group, q-tile, k-panel) grid step.

    Classic flash-attention recurrence, laid out for the TPU grid pipeline:
    the k-panel axis is the INNERMOST (fastest) grid dimension, so the f32
    m/l/acc scratch carries across panel steps of one q tile (TPU grids run
    sequentially; pallas only flushes the output block when its index-map
    changes). k/v panels stream HBM→VMEM via their BlockSpecs — no manual
    DMA, the standard pallas double-buffered pipeline overlaps the next
    panel's fetch with this panel's matmuls.

    ``head_group`` heads ride one grid step so the partitioned lane-dim block
    (g·d wide) is a 128 multiple — Mosaic rejects narrower partitions; d=64
    pairs heads, d=96 (PE-G14) groups four.
    """
    it = iter(refs)
    cos_q = next(it) if has_rope else None
    sin_q = next(it) if has_rope else None
    cos_k = next(it) if has_rope else None
    sin_k = next(it) if has_rope else None
    o_ref, m_ref, l_ref, acc_ref = it
    d = o_ref.shape[2] // head_group

    p_idx = pl.program_id(3)
    n_p = pl.num_programs(3)

    @pl.when(p_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    col = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[1], k_panel), 1
    )
    first_masked = s_real - p_idx * k_panel  # cols >= this are padding
    for h in range(head_group):
        q = q_ref[0, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, h * d : (h + 1) * d]  # [k_panel, d]
        if has_rope:
            q = _rot_half(q, cos_q[:], sin_q[:])
            k = _rot_half(k, cos_k[:], sin_k[:])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [q_tile, k_panel]
        if s_real < n_p * k_panel:  # any padded column anywhere
            s = jnp.where(col < first_masked, s, -jnp.inf)
        m_prev = m_ref[:, h : h + 1]  # [q_tile, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_mat = jnp.exp(s - m_new)
        l_ref[:, h : h + 1] = l_ref[:, h : h + 1] * alpha + jnp.sum(
            p_mat, axis=-1, keepdims=True
        )
        acc_ref[:, h * d : (h + 1) * d] = (
            acc_ref[:, h * d : (h + 1) * d] * alpha
            + jax.lax.dot_general(
                p_mat.astype(v_ref.dtype), v_ref[0, :, h * d : (h + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        m_ref[:, h : h + 1] = m_new

    @pl.when(p_idx == n_p - 1)
    def _():
        for h in range(head_group):
            o_ref[0, :, h * d : (h + 1) * d] = (
                acc_ref[:, h * d : (h + 1) * d] / l_ref[:, h : h + 1]
            ).astype(o_ref.dtype)


def _flash_tiles(s_pad: int) -> tuple[int, int, int]:
    """(padded S, q_tile, k_panel) for the flash kernel: tile sizes must
    DIVIDE the padded sequence (ragged edge blocks would read garbage), so
    pick the 8-multiple divisor closest to 384 in [128, 768]; sequences with
    no such divisor (8·large-prime) round up to a 256 multiple and mask."""
    cand = _dividing_tile(s_pad, 128, 768, key=lambda t: abs(t - 384))
    if cand is not None:
        return s_pad, cand, cand
    if s_pad <= 768:
        return s_pad, s_pad, s_pad
    s2 = _round_up(s_pad, 256)
    return s2, 256, 256


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "interpret", "s_real")
)
def flash_attention_packed(
    qkv: jnp.ndarray,  # [B, S, 3w] straight from the qkv projection
    heads: int,
    scale: float,
    interpret: bool = False,
    s_real: int | None = None,
    rope: tuple | None = None,  # ([S, d/2] cos, [S, d/2] sin) — half-split
) -> jnp.ndarray:
    """k/v-streaming flash attention on the packed qkv tensor → [B, S, w].

    The long-sequence sibling of :func:`fused_attention_packed`: instead of
    holding a whole [S, 3w] block in VMEM (PE-G14-448's 9.4 MB blocks overflow
    the scoped budget double-buffered), the grid walks (batch, head, q-tile,
    k-panel) and VMEM holds one q tile + one k/v panel + the online-softmax
    state — a fixed ~1-2 MB footprint at ANY sequence length. q/k/v never
    need a layout copy: three BlockSpecs slice the SAME packed tensor at
    lane offsets h·d, w+h·d, 2w+h·d. RoPE (PE family) rotates q tiles and
    k panels in VMEM, exactly like the whole-block kernel.
    """
    b, s, w3 = qkv.shape
    if s_real is None:
        s_real = s
    w = w3 // 3
    d = w // heads
    # Mosaic requires PARTITIONED lane-dim blocks to be 128 multiples: group
    # the smallest head count whose combined width satisfies that (d=64 pairs,
    # d=96 groups four); towers with no valid grouping take the full width.
    g = heads
    for cand in range(1, heads + 1):
        if heads % cand == 0 and (d * cand) % 128 == 0:
            g = cand
            break
    n_groups = heads // g
    s_pad0 = _round_up(s, 8)
    s_pad, q_tile, k_panel = _flash_tiles(s_pad0)
    if s_pad != s:
        qkv = jnp.pad(qkv, [(0, 0), (0, s_pad - s), (0, 0)])
    grid = (b, n_groups, s_pad // q_tile, s_pad // k_panel)

    in_specs = [
        pl.BlockSpec((1, q_tile, d * g), lambda i, h, t, p: (i, t, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_panel, d * g), lambda i, h, t, p: (i, p, n_groups + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_panel, d * g),
                     lambda i, h, t, p: (i, p, 2 * n_groups + h),
                     memory_space=pltpu.VMEM),
    ]
    rope_in = []
    if rope is not None:
        half = d // 2
        for t_ in rope:
            t_ = jnp.asarray(t_, jnp.float32)
            if t_.shape[0] != s_pad:
                t_ = jnp.pad(t_, [(0, s_pad - t_.shape[0]), (0, 0)])
            rope_in.append(t_.astype(qkv.dtype))
        cos_t, sin_t = rope_in
        rope_in = [cos_t, sin_t, cos_t, sin_t]  # q-tile view + k-panel view
        in_specs += [
            pl.BlockSpec((q_tile, half), lambda i, h, t, p: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, half), lambda i, h, t, p: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_panel, half), lambda i, h, t, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_panel, half), lambda i, h, t, p: (p, 0),
                         memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, s_real=s_real,
                          k_panel=k_panel, head_group=g,
                          has_rope=rope is not None),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_tile, d * g),
                               lambda i, h, t, p: (i, t, h),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q_tile, g), jnp.float32),      # running max m
            pltpu.VMEM((q_tile, g), jnp.float32),      # running denom l
            pltpu.VMEM((q_tile, d * g), jnp.float32),  # unnormalized out acc
        ],
        interpret=_env_interpret(interpret),
    )(qkv, qkv, qkv, *rope_in)
    return out[:, :s, :]


def _packed_q8_kernel(qkv_ref, qs_ref, *out_refs, heads: int, scale: float,
                      s_real: int, quant_out: bool):
    """int8-wire variant: qkv arrives int8 with per-token f32 scales (written
    by ops/quant_kernel's quant epilogues). Head slices are dequantized in
    VMEM; attention math itself is identical to the bf16 kernel (f32 scores/
    softmax) — only the HBM wire format is quantized, halving the dominant
    [B, S, 3w] traffic of the block. With ``quant_out`` the kernel emits its
    OWN output as int8 + per-token scales too (the out-projection consumes
    int8 rows directly), so the bf16 tensor never exists in HBM."""
    s_pad = qkv_ref.shape[1]
    if quant_out:
        o_ref, oscale_ref, acc_ref = out_refs
        w = o_ref.shape[2]
    else:
        (o_ref,) = out_refs
        acc_ref = None
        w = o_ref.shape[2]
    d = w // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    rs = qs_ref[0]  # [S_pad, 1] f32 per-token scales
    for h in range(heads):
        q = qkv_ref[0, :, h * d : (h + 1) * d].astype(jnp.float32) * (rs * scale)
        k = qkv_ref[0, :, w + h * d : w + (h + 1) * d].astype(jnp.float32) * rs
        v = (qkv_ref[0, :, 2 * w + h * d : 2 * w + (h + 1) * d].astype(jnp.float32)
             * rs).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        scores = jnp.where(col < s_real, scores, -jnp.inf)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
        head_out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_norm
        if quant_out:
            acc_ref[:, h * d : (h + 1) * d] = head_out
        else:
            o_ref[0, :, h * d : (h + 1) * d] = head_out.astype(o_ref.dtype)
    if quant_out:
        full = acc_ref[:]
        amax = jnp.maximum(jnp.max(jnp.abs(full), axis=1, keepdims=True), 1e-8)
        o_ref[0] = jnp.clip(jnp.round(full * (127.0 / amax)), -127, 127).astype(
            jnp.int8
        )
        oscale_ref[0] = amax * (1.0 / 127.0)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "interpret", "out_dtype", "quant_out",
                     "s_real"),
)
def fused_attention_packed_q8(
    qkv_q: jnp.ndarray,  # [B, S, 3w] int8 from the qkv projection's quant_out
    qkv_scale: jnp.ndarray,  # [B, S, 1] f32 per-token scales
    heads: int,
    scale: float,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    quant_out: bool = False,
    s_real: int | None = None,
):
    b, s, w3 = qkv_q.shape
    if s_real is None:
        s_real = s
    w = w3 // 3
    s_pad = _round_up(s, 8)
    if s_pad != s:
        qkv_q = jnp.pad(qkv_q, [(0, 0), (0, s_pad - s), (0, 0)])
        qkv_scale = jnp.pad(qkv_scale, [(0, 0), (0, s_pad - s), (0, 0)],
                            constant_values=1.0)
    spec_in = [
        pl.BlockSpec((1, s_pad, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if quant_out:
        out_shape = (
            jax.ShapeDtypeStruct((b, s_pad, w), jnp.int8),
            jax.ShapeDtypeStruct((b, s_pad, 1), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, s_pad, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        scratch = [pltpu.VMEM((s_pad, w), jnp.float32)]
    else:
        out_shape = jax.ShapeDtypeStruct((b, s_pad, w), out_dtype)
        out_specs = pl.BlockSpec(
            (1, s_pad, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = []
    out = pl.pallas_call(
        functools.partial(_packed_q8_kernel, heads=heads, scale=scale,
                          s_real=s_real, quant_out=quant_out),
        out_shape=out_shape,
        grid=(b,),
        in_specs=spec_in,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=_env_interpret(interpret),
    )(qkv_q, qkv_scale)
    if quant_out:
        oq, oscale = out
        return oq[:, :s, :], oscale[:, :s, :]
    return out[:, :s, :]


def attention_packed_q8_xla(qkv_q, qkv_scale, heads: int, scale: float):
    """XLA reference for the int8-wire attention (CPU tests). Matches the
    kernel's rounding: the attention scale is folded into q BEFORE the bf16
    cast (exact for the power-of-two scales of CLIP head dims)."""
    b, s, w3 = qkv_q.shape
    w = w3 // 3
    d = w // heads
    qkv = qkv_q.astype(jnp.float32) * qkv_scale
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = (q * scale).astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    rs = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)  # noqa: E731
    out = attention_xla(rs(q), rs(k), rs(v), 1.0)
    return out.transpose(0, 2, 1, 3).reshape(b, s, w)


def _packed_q8s_kernel(qkv_ref, cs_ref, o_ref, *, heads: int, s_real: int):
    """Static-scale int8 attention wire (int8_static mode, models/vit.py).

    qkv arrives int8, quantized by the projection epilogue with per-CHANNEL
    static scales; the output leaves int8 under the calibrated attn-out scale.
    All scale folding happens OUTSIDE the kernel in cs_ref [1, 3w] f32:
      cs[:w]   = q channel scales × attention scale,
      cs[w:2w] = k channel scales,
      cs[2w:]  = v channel scales × 127/attn_out_amax (so quantizing the
                 output is a bare round/clip).
    Per-head dequant is an [S, d]·[d] VPU broadcast — trivial next to the
    halved HBM wire (int8 qkv is the block's largest inter-op tensor).

    Long sequences (ViT-L-336's 592 padded tokens) q-row-tile exactly like
    :func:`_packed_kernel`: a lax.fori_loop over query-row tiles shares ONE
    score/prob working set; k/v dequant to bf16 once per head OUTSIDE the
    loop (the same per-head [S, d] temporary shape as the proven rope path).
    Because the static out-scale is folded into the v channel scales, each
    tile writes its int8 rows directly — no whole-row accumulator needed."""
    s_pad = qkv_ref.shape[1]
    w = o_ref.shape[2]
    d = w // heads
    q_tile = _q_tile(s_pad)
    n_tiles = -(-s_pad // q_tile)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, s_pad), 1)
    for h in range(heads):
        qs = cs_ref[0, h * d : (h + 1) * d]
        ks = cs_ref[0, w + h * d : w + (h + 1) * d]
        vs = cs_ref[0, 2 * w + h * d : 2 * w + (h + 1) * d]
        k = (qkv_ref[0, :, w + h * d : w + (h + 1) * d].astype(jnp.float32)
             * ks).astype(jnp.bfloat16)
        v = (qkv_ref[0, :, 2 * w + h * d : 2 * w + (h + 1) * d].astype(
            jnp.float32) * vs).astype(jnp.bfloat16)

        def tile_body(t, _, k=k, v=v, h=h, qs=qs):
            # both candidates are 8-aligned; the hint makes it provable
            r0 = pl.multiple_of(jnp.minimum(t * q_tile, s_pad - q_tile), 8)
            q = (qkv_ref[0, pl.ds(r0, q_tile), h * d : (h + 1) * d].astype(
                jnp.float32) * qs).astype(jnp.bfloat16)
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # exact -inf mask: see _packed_kernel's docstring for why the O(S)
            # denominator-correction alternative is rejected (f32 cancellation)
            if s_real < s_pad:
                scores = jnp.where(col < s_real, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.exp(scores - m)
            denom = jnp.sum(probs, axis=-1, keepdims=True)
            head_out = jax.lax.dot_general(
                probs.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / denom
            o_ref[0, pl.ds(r0, q_tile), h * d : (h + 1) * d] = jnp.clip(
                jnp.round(head_out), -127, 127
            ).astype(jnp.int8)
            return 0

        if n_tiles == 1:
            tile_body(0, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "interpret", "s_real")
)
def fused_attention_packed_q8s(
    qkv_q: jnp.ndarray,  # [B, S, 3w] int8 (per-channel static quantization)
    ch_scale: jnp.ndarray,  # [3w] f32, pre-folded (see kernel docstring)
    heads: int,
    scale: float,  # kept for API symmetry; already folded into ch_scale[:w]
    interpret: bool = False,
    s_real: int | None = None,
):
    """Static-wire attention: int8 in (per-channel scales), int8 out
    (attn-out static scale pre-folded into ch_scale's v section). Long
    sequences pad to an exactly-tiling length (:func:`_pad_for_tiling`) so
    the kernel's q-row tiles need no overlapping clamped final tile."""
    del scale
    b, s, w3 = qkv_q.shape
    if s_real is None:
        s_real = s
    w = w3 // 3
    s_pad = _pad_for_tiling(s)
    if s_pad != s:
        qkv_q = jnp.pad(qkv_q, [(0, 0), (0, s_pad - s), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_packed_q8s_kernel, heads=heads, s_real=s_real),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), jnp.int8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, w3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_env_interpret(interpret),
    )(qkv_q, ch_scale.reshape(1, w3).astype(jnp.float32))
    return out[:, :s, :]


def _rot_half(x, cos, sin):
    """Half-split RoPE rotation in VMEM: pairs (i, i+d/2), tables [S, d/2]."""
    half = x.shape[-1] // 2
    x1 = x[:, :half]
    x2 = x[:, half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _packed_kernel(qkv_ref, *refs, heads: int, scale: float, s_real: int,
                   quant_out: bool, has_rope: bool, pipeline: bool = False):
    """qkv packed [g, S_pad, 3w] exactly as the projection matmul wrote it —
    per-head lane slices happen in VMEM, so the kernel needs NO layout copies on
    either side. ``quant_out`` emits int8 + per-token scales instead of bf16
    (the out-projection then runs the XLA int8 fast path with no extra pass).

    Padded tokens (s_real < S_pad) are excluded with an exact -inf score mask.
    (An O(S) denominator-correction variant — zero the padded k/v rows, then
    subtract n_pad·exp(-max) from the softmax sum — measured perf-NEUTRAL here
    (the kernel is matmul/exp-bound, not select-bound) and catastrophically
    cancels in f32 once a query row's real scores all sit ≲ -18 below the
    padded columns' exact 0.0, so the exact mask stays.)"""
    g, s_pad = qkv_ref.shape[:2]
    it = iter(refs)
    cos_ref = next(it) if has_rope else None
    sin_ref = next(it) if has_rope else None
    out_refs = list(it)
    if quant_out:
        o_ref, oscale_ref, acc_ref = out_refs
    else:
        (o_ref,) = out_refs
        acc_ref = None
    w = o_ref.shape[2]
    d = w // heads
    # Long sequences (ViT-L-336's 584 tokens): the full [S, S] f32 score/prob
    # working set overflows the ~16 MB scoped VMEM budget — Mosaic's stack
    # allocator does NOT reuse temporaries across unrolled python loops, so
    # the tiling below runs as a lax.fori_loop over QUERY-row tiles (one
    # shared set of temps by construction). Each row's softmax runs over
    # complete key columns, so row tiles are exact; the final tile clamps
    # backwards to an 8-aligned start (idempotent rewrites) instead of
    # masking a ragged remainder.
    q_tile = _q_tile(s_pad)
    n_tiles = -(-s_pad // q_tile)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, s_pad), 1)

    if pipeline and n_tiles == 1:
        # Software-pipelined head loop: issue head h+1's QKᵀ (MXU) BEFORE head
        # h's softmax (VPU) so the backend scheduler can overlap the two units
        # — the strictly sequential per-head chain leaves the VPU exp/max/sum
        # on the critical path between matmuls. Identical math, reordered
        # program; one extra [S,S] f32 scores buffer live (Mosaic's stack
        # allocator does not reuse the unrolled loop's temporaries anyway).
        def _qk_scores(i, h):
            k = qkv_ref[i, :, w + h * d : w + (h + 1) * d]
            q = qkv_ref[i, :, h * d : (h + 1) * d] * (
                jnp.asarray(scale, qkv_ref.dtype)
            )
            if has_rope:
                k = _rot_half(k, cos_ref[:], sin_ref[:])
                q = _rot_half(q, cos_ref[:], sin_ref[:])
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if s_real < s_pad:
                scores = jnp.where(col < s_real, scores, -jnp.inf)
            return scores

        def _emit_av(i, h, probs, inv_norm):
            v = qkv_ref[i, :, 2 * w + h * d : 2 * w + (h + 1) * d]
            head_out = jax.lax.dot_general(
                probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_norm
            if quant_out:
                acc_ref[:, h * d : (h + 1) * d] = head_out
            else:
                o_ref[i, :, h * d : (h + 1) * d] = head_out.astype(o_ref.dtype)

        for i in range(g):
            # depth-2 schedule: each iteration issues QKᵀ(h+1) and AV(h-1) —
            # two independent MXU ops — before softmax(h)'s VPU chain, giving
            # the scheduler MXU work to overlap the entire softmax with
            nxt = _qk_scores(i, 0)
            pend = None  # (head, probs, inv_norm) awaiting its AV matmul
            for h in range(heads):
                scores = nxt
                if h + 1 < heads:
                    nxt = _qk_scores(i, h + 1)
                if pend is not None:
                    _emit_av(i, *pend)
                m = jnp.max(scores, axis=-1, keepdims=True)
                probs = jnp.exp(scores - m)
                inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
                pend = (h, probs, inv_norm)
            _emit_av(i, *pend)
            if quant_out:
                full = acc_ref[:]
                amax = jnp.maximum(
                    jnp.max(jnp.abs(full), axis=1, keepdims=True), 1e-8
                )
                o_ref[i] = jnp.clip(
                    jnp.round(full * (127.0 / amax)), -127, 127
                ).astype(jnp.int8)
                oscale_ref[i] = amax * (1.0 / 127.0)
        return

    for i in range(g):
        for h in range(heads):
            # scale folded into q ([S,d] muls, not [S,S]); softmax kept
            # unnormalized through the AV matmul and divided on [S,d] after —
            # mathematically identical, ~25% less VPU work per head
            k = qkv_ref[i, :, w + h * d : w + (h + 1) * d]
            v = qkv_ref[i, :, 2 * w + h * d : 2 * w + (h + 1) * d]
            if has_rope:  # PE family: rotate k once per head, in VMEM
                k = _rot_half(k, cos_ref[:], sin_ref[:])

            def tile_body(t, _, k=k, v=v, h=h, i=i):
                # both candidates are 8-aligned; the hint makes it provable
                r0 = pl.multiple_of(
                    jnp.minimum(t * q_tile, s_pad - q_tile), 8
                )
                q = qkv_ref[i, pl.ds(r0, q_tile), h * d : (h + 1) * d] * (
                    jnp.asarray(scale, qkv_ref.dtype)
                )
                if has_rope:  # rotation commutes with the scalar scale
                    q = _rot_half(
                        q,
                        cos_ref[pl.ds(r0, q_tile), :],
                        sin_ref[pl.ds(r0, q_tile), :],
                    )
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if s_real < s_pad:
                    scores = jnp.where(col < s_real, scores, -jnp.inf)
                m = jnp.max(scores, axis=-1, keepdims=True)
                probs = jnp.exp(scores - m)
                inv_norm = 1.0 / jnp.sum(probs, axis=-1, keepdims=True)
                head_out = jax.lax.dot_general(
                    probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * inv_norm
                if quant_out:
                    acc_ref[pl.ds(r0, q_tile), h * d : (h + 1) * d] = head_out
                else:
                    o_ref[i, pl.ds(r0, q_tile), h * d : (h + 1) * d] = (
                        head_out.astype(o_ref.dtype)
                    )
                return 0

            if n_tiles == 1:
                tile_body(0, 0)
            else:
                # NOTE: a pipelined variant for this tiled path was built and
                # MEASURED SLOWER both ways (BENCH_NOTES round-5): an SSA-carry
                # tile lookahead OOMs scoped VMEM (the carry's per-head init
                # lives in the unrolled head loop, which Mosaic never reuses:
                # +11 MB at ViT-L-336), and a 2-slot VMEM-scratch rewrite with
                # pl.when boundary guards regressed ~5% at both 336 and G14
                # shapes (336 e2e 124.5 -> 119.9/120.1; grouped kernel 4.01 ->
                # 4.26 ms) — the conds + scratch round-trips cost more than
                # the MXU/VPU overlap recovers inside a dynamic loop. The
                # head-lookahead `pipeline` path above only serves n_tiles==1.
                jax.lax.fori_loop(0, n_tiles, tile_body, 0)
        if quant_out:
            full = acc_ref[:]
            amax = jnp.maximum(jnp.max(jnp.abs(full), axis=1, keepdims=True), 1e-8)
            o_ref[i] = jnp.clip(jnp.round(full * (127.0 / amax)), -127, 127).astype(
                jnp.int8
            )
            oscale_ref[i] = amax * (1.0 / 127.0)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "interpret", "quant_out", "s_real",
                     "pipeline"),
)
def fused_attention_packed(
    qkv: jnp.ndarray,  # [B, S, 3w] straight from the qkv projection
    heads: int,
    scale: float,
    interpret: bool = False,
    quant_out: bool = False,
    s_real: int | None = None,
    rope: tuple | None = None,  # ([S, d/2] cos, [S, d/2] sin) — half-split
    pipeline: bool | None = None,  # None: knobs.ATTN_PIPELINE
):
    """Multi-head attention on the packed qkv tensor → [B, S, w] (or, with
    quant_out, (int8 [B, S, w], f32 [B, S, 1] per-token scales)).

    ``pipeline``: software-pipeline the head loop (one-step QKᵀ lookahead for
    MXU/VPU overlap; whole-block tiles only — long-sequence fori_loop tiling
    keeps the plain order).

    ``s_real``: number of REAL tokens when the caller already padded the
    sequence dim (models/vit.py pads once before the layer scan — a per-layer
    pad/slice here measured 0.6 ms/layer on the profile); padded key/value
    columns are masked out of the softmax, padded rows compute garbage that
    nothing reads.

    ``rope``: 2-D axial RoPE tables in the HALF-SPLIT pairing (PE family,
    models/vit._apply_rope). Rotation happens per head IN VMEM — applying it
    to the packed tensor in XLA materialized ~4.5 ms/layer of strided-lane
    copies on the PE profile."""
    b, s, w3 = qkv.shape
    if s_real is None:
        s_real = s
    w = w3 // 3
    s_pad = _pad_for_tiling(s)
    if s_pad != s:
        qkv = jnp.pad(qkv, [(0, 0), (0, s_pad - s), (0, 0)])
    rope_in, rope_specs = [], []
    if rope is not None:
        half = w // heads // 2
        for t in rope:
            t = jnp.asarray(t, jnp.float32)
            if t.shape[0] != s_pad:
                t = jnp.pad(t, [(0, s_pad - t.shape[0]), (0, 0)])
            rope_in.append(t.astype(qkv.dtype))
            rope_specs.append(
                pl.BlockSpec((s_pad, half), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
    from clip_assisted_data_labeling_tpu.ops import knobs

    # CTPU_ATTN_ITEMS>1 packs several batch items per grid step. Measured
    # neutral at ViT-L shapes after the round-3 preprocess/ln work (335.1 vs
    # 335.6), and Mosaic's ACTUAL scoped-VMEM use runs ~1.8x this estimate,
    # varying with the surrounding program (g=2 compiled in the int8_static
    # program but OOM'd by 116 KB in the bf16 one at identical shapes) — so
    # the robust default is 1 (import-time snapshot, ops/knobs.py). With the
    # round-5 pipelined head loop (one extra in-flight scores buffer per
    # item) g=2 OOMs scoped VMEM by 1.57 MB even in the int8_static program,
    # so an explicit ITEMS>1 disables the pipelined order for this call
    # rather than handing Mosaic a guaranteed-overflow program.
    g = knobs.ATTN_ITEMS
    while g > 1 and (
        b % g != 0
        or 2 * (g * s_pad * (w3 + w) * qkv.dtype.itemsize) + 8 * s_pad * s_pad
        > 14 * 2**20
    ):
        g -= 1
    if pipeline is None:
        # the knob-selected pipeline order yields to an explicit ITEMS>1
        # knob (the lookahead's extra in-flight scores buffer OOMs with g>1)
        pipeline = knobs.ATTN_PIPELINE and g == 1
    elif pipeline and g > 1:
        # an EXPLICIT pipeline=True must not silently run the plain order
        raise ValueError(
            "pipeline=True requires one batch item per grid step — unset "
            "CTPU_ATTN_ITEMS (the pipelined head loop's extra scores buffer "
            "overflows scoped VMEM at g>1)"
        )
    if quant_out:
        out_shape = (
            jax.ShapeDtypeStruct((b, s_pad, w), jnp.int8),
            jax.ShapeDtypeStruct((b, s_pad, 1), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((g, s_pad, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        scratch = [pltpu.VMEM((s_pad, w), jnp.float32)]
    else:
        out_shape = jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype)
        out_specs = pl.BlockSpec(
            (g, s_pad, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = []
    out = pl.pallas_call(
        functools.partial(_packed_kernel, heads=heads, scale=scale,
                          s_real=s_real, quant_out=quant_out,
                          has_rope=rope is not None, pipeline=pipeline),
        out_shape=out_shape,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, s_pad, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] + rope_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=_env_interpret(interpret),
    )(qkv, *rope_in)
    if quant_out:
        oq, oscale = out
        return oq[:, :s, :], oscale[:, :s, :]
    return out[:, :s, :]
