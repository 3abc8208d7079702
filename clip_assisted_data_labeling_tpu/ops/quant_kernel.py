"""Fused W8A8 linear — K-tiled Pallas TPU GEMM.

The XLA lowering of ops/quant.py's dynamic quantization materializes the int8
activation tensor and the dequant product in HBM — full activation passes per
linear that cost more than the int8 matmul saves on a ~300 GB/s chip. This
kernel is a standard pipelined (M, N, K)-tiled GEMM whose K-step quantizes the
activation tile in VMEM on the fly:

  * per-row dynamic scales come from one cheap fused amax pass up front,
  * each K step: bf16 x-tile → int8 (VPU, in VMEM) → int8×int8 MXU matmul into
    an int32 accumulator scratch (exact),
  * final K step: dequant (row·col scales) + bias epilogue → bf16 out tile,
  * Mosaic double-buffers the x/w tile DMA against compute across grid steps
    (parallel, parallel, arbitrary semantics); no intermediate reaches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, inv_amax_ref, wq_ref, scale_ref, bias_ref, o_ref, acc_ref):
    """K-tiled int8 GEMM step: quantize the x K-tile in VMEM (row scales are
    prefetched), MXU int8 matmul into an int32 accumulator scratch, and on the
    final K step dequantize + bias + cast into the output tile."""
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = jnp.clip(
        jnp.round(x_ref[:].astype(jnp.float32) * (127.0 * inv_amax_ref[:])),
        -127, 127,
    ).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _emit():
        y = acc_ref[:].astype(jnp.float32)
        y = y * (1.0 / (127.0 * inv_amax_ref[:])) * scale_ref[:]
        o_ref[:] = (y + bias_ref[:]).astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def q_linear_fused(
    x: jnp.ndarray,  # [M, K] float (bf16/f32)
    wq: jnp.ndarray,  # [K, N] int8
    w_scale: jnp.ndarray,  # [N] f32 per-output-channel scales
    bias: jnp.ndarray | None = None,  # [N]
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 512,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = wq.shape
    n_orig = n
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 128))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    # pad every axis to its block multiple (zero weights/inputs contribute
    # nothing; padded scale columns use 1.0 and are sliced away)
    m_pad = _round_up(m, block_m)
    k_pad = _round_up(k, block_k)
    n_pad = _round_up(n, block_n)
    if m_pad != m or k_pad != k:
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        wq = jnp.pad(wq, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        w_scale = jnp.pad(w_scale, (0, n_pad - n), constant_values=1.0)
        bias = jnp.pad(bias, (0, n_pad - n))
    k, n = k_pad, n_pad

    # per-row dynamic scales, computed up front (one cheap fused pass) so the
    # kernel can quantize each K-tile independently
    amax = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True), 1e-8
    )
    inv_amax = 1.0 / amax  # [M, 1]

    grid = (m_pad // block_m, n // block_n, k // block_k)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=grid,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        interpret=interpret,
    )(
        x,
        inv_amax,
        wq,
        w_scale.reshape(1, n).astype(jnp.float32),
        bias.reshape(1, n).astype(jnp.float32),
    )
    return out[:m, :n_orig]
