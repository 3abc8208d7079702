"""Fused W8A8 linear — Pallas TPU kernel.

The XLA lowering of ops/quant.py's dynamic quantization materializes the amax
reduction, the int8 activation tensor, and the dequant product in HBM — several
full activation passes per linear that cost more than the int8 matmul saves on
a ~300 GB/s chip. This kernel keeps the whole quantize→matmul→dequantize chain
in VMEM:

  * grid over M tiles only; the int8 weight panel [K, N] (≤4 MB for ViT-L
    shapes) has a constant index map, so Pallas keeps it resident in VMEM across
    grid steps — weights stream from HBM exactly once,
  * per tile: row-amax → int8 quantize (VPU, in VMEM) → int8×int8 MXU matmul
    with int32 accumulation → scale·dequant epilogue → bf16 out,
  * activations are read once and the output written once; no intermediate
    tensor ever reaches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)  # [BM, K]
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (amax / 127.0) * scale_ref[:]
    y = y + bias_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret", "out_dtype"))
def q_linear_fused(
    x: jnp.ndarray,  # [M, K] float (bf16/f32)
    wq: jnp.ndarray,  # [K, N] int8
    w_scale: jnp.ndarray,  # [N] f32 per-output-channel scales
    bias: jnp.ndarray | None = None,  # [N]
    block_m: int = 256,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = wq.shape
    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=(m_pad // block_m,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # M tiles are independent
        ),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        x,
        wq,
        w_scale.reshape(1, n).astype(jnp.float32),
        bias.reshape(1, n).astype(jnp.float32),
    )
    return out[:m]
