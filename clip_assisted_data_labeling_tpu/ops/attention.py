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
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(col < s_real, scores, -jnp.inf)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s, :]


def attention_xla(q, k, v, scale):
    """Reference XLA path (materializes scores); used on CPU and in tests."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _packed_kernel(qkv_ref, o_ref, *, heads: int, scale: float, s_real: int):
    """qkv packed [1, S_pad, 3w] exactly as the projection matmul wrote it —
    per-head lane slices happen in VMEM, so the kernel needs NO layout copies on
    either side."""
    s_pad = qkv_ref.shape[1]
    w = o_ref.shape[2]
    d = w // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    for h in range(heads):
        q = qkv_ref[0, :, h * d : (h + 1) * d]
        k = qkv_ref[0, :, w + h * d : w + (h + 1) * d]
        v = qkv_ref[0, :, 2 * w + h * d : 2 * w + (h + 1) * d]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(col < s_real, scores, -jnp.inf)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        o_ref[0, :, h * d : (h + 1) * d] = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_attention_packed(
    qkv: jnp.ndarray,  # [B, S, 3w] straight from the qkv projection
    heads: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention on the packed qkv tensor → [B, S, w]."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    s_pad = _round_up(s, 8)
    if s_pad != s:
        qkv = jnp.pad(qkv, [(0, 0), (0, s_pad - s), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_packed_kernel, heads=heads, scale=scale, s_real=s),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, s_pad, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qkv)
    return out[:, :s, :]
