"""Fused W8A8 linear — weights-resident Pallas TPU GEMM.

The ViT's linears are tall-skinny: M (tokens) ≈ 33k while the int8 weight
matrix is only 3–8 MB — small enough to sit in VMEM for the whole GEMM. The
round-1 (M, N, K)-tiled kernel re-streamed both operands from HBM many times
(w once per M-tile, x once per N-tile) and lost to XLA on bandwidth; this
version makes the minimal-traffic schedule explicit:

  * the int8 weight panel, its per-channel scales and the bias use constant
    index maps — Mosaic DMAs them into VMEM once and keeps them resident,
  * the grid runs over M only; each step streams one [block_m, K] bf16
    activation tile in and one [block_m, N] tile out (double-buffered against
    the MXU by Mosaic's automatic pipelining),
  * the full K extent lives in the block, so the per-row dynamic amax, the
    VPU quantize, the int8×int8 MXU matmul (int32 accumulation — exact) and
    the dequant+bias epilogue all happen in VMEM in a single pass: activations
    are read from HBM exactly once, nothing intermediate ever leaves the chip.

HBM traffic is therefore x (bf16) + w (int8, once) + out, the same as a plain
bf16 matmul minus half the weight bytes — while the FLOPs run at the int8 MXU
rate. Used by ops/quant.q_matmul for all in-budget shapes (ViT-L fc2's
4096×1024 int8 panel is 4 MB; VMEM is ~16 MB/core).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref):
    """One M-tile: row amax → VPU quantize → int8 MXU matmul → dequant+bias."""
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(x * (127.0 / amax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (amax * (1.0 / 127.0)) * scale_ref[:]
    o_ref[:] = (y + bias_ref[:]).astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _env_interpret(interpret: bool) -> bool:
    """CTPU_PALLAS_INTERPRET=1 forces interpreter mode (CPU-testable kernels)."""
    import os

    return interpret or os.environ.get("CTPU_PALLAS_INTERPRET") == "1"


# VMEM budget gate: weight panel + 2×(in+out) tiles must fit comfortably
_VMEM_BUDGET = 14 * 1024 * 1024


def fits_vmem(k: int, n: int, block_m: int = 256) -> bool:
    k_pad, n_pad = _round_up(k, 128), _round_up(n, 128)
    resident = k_pad * n_pad + 4 * n_pad  # int8 weights + f32 scale/bias
    per_step = block_m * (2 * k_pad + 2 * n_pad)  # bf16 in + bf16 out
    return resident + 2 * per_step <= _VMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("block_m", "interpret", "out_dtype")
)
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
    k_orig, n_orig = k, n
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    block_m = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, block_m)
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    # zero padding is exact: padded K columns contribute 0 to every dot, padded
    # N columns are sliced away (their scale is 1.0 to keep dequant finite)
    if m_pad != m or k_pad != k:
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        wq = jnp.pad(wq, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        w_scale = jnp.pad(w_scale, (0, n_pad - n), constant_values=1.0)
        bias = jnp.pad(bias, (0, n_pad - n))
    k, n = k_pad, n_pad

    const = lambda i: (0, 0)  # noqa: E731 — resident operands
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=(m_pad // block_m,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_env_interpret(interpret),
    )(
        x,
        wq,
        w_scale.reshape(1, n).astype(jnp.float32),
        bias.reshape(1, n).astype(jnp.float32),
    )
    if m_pad != m or n != n_orig:
        out = out[:m, :n_orig]
    del k_orig
    return out


# --------------------------------------------------------------------------
# Generalized fused block linear: the whole ln → quantize → int8 matmul →
# dequant → bias → activation → residual → (re)quantize chain in one kernel,
# so each transformer-block linear touches HBM exactly once per operand.
# --------------------------------------------------------------------------


def _block_kernel(
    *refs,
    has_ln: bool,
    has_res: bool,
    act: str | None,
    quant_out: bool,
    x_quantized: bool,
    ln_eps: float,
):
    it = iter(refs)
    x_ref = next(it)
    x_scale_ref = next(it) if x_quantized else None
    wq_ref = next(it)
    scale_ref = next(it)
    bias_ref = next(it)
    ln_scale_ref = next(it) if has_ln else None
    ln_bias_ref = next(it) if has_ln else None
    res_ref = next(it) if has_res else None
    o_ref = next(it)
    oscale_ref = next(it) if quant_out else None

    if x_quantized:
        xq = x_ref[:]
        row_scale = x_scale_ref[:]  # [bm, 1] f32
    else:
        x = x_ref[:].astype(jnp.float32)
        if has_ln:
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + ln_eps)
            x = x * ln_scale_ref[:] + ln_bias_ref[:]
        amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8)
        xq = jnp.clip(jnp.round(x * (127.0 / amax)), -127, 127).astype(jnp.int8)
        row_scale = amax * (1.0 / 127.0)

    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * row_scale * scale_ref[:] + bias_ref[:]
    if act == "quick_gelu":
        y = y * jax.nn.sigmoid(1.702 * y)
    elif act == "gelu_tanh":  # SigLIP's gelu_pytorch_tanh (tanh form is exact)
        y = jax.nn.gelu(y, approximate=True)
    elif act == "gelu":
        y = y * 0.5 * (1.0 + jax.lax.erf(y * (2.0 ** -0.5)))
    if has_res:
        y = y + res_ref[:].astype(jnp.float32)
    if quant_out:
        oamax = jnp.maximum(jnp.max(jnp.abs(y), axis=1, keepdims=True), 1e-8)
        o_ref[:] = jnp.clip(jnp.round(y * (127.0 / oamax)), -127, 127).astype(
            jnp.int8
        )
        oscale_ref[:] = oamax * (1.0 / 127.0)
    else:
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "act", "quant_out", "block_m", "interpret", "out_dtype", "ln_eps",
    ),
)
def q_block_linear(
    x: jnp.ndarray,  # [M, K] bf16/f32, or int8 with x_scale
    wq: jnp.ndarray,  # [K, N] int8
    w_scale: jnp.ndarray,  # [N] f32
    bias: jnp.ndarray | None = None,  # [N]
    x_scale: jnp.ndarray | None = None,  # [M, 1] f32 when x is int8
    ln_scale: jnp.ndarray | None = None,  # [K] — fused pre-layernorm
    ln_bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,  # [M, N] added after bias/act
    act: str | None = None,  # None | 'quick_gelu' | 'gelu'
    quant_out: bool = False,  # emit (int8 [M, N], f32 [M, 1] row scales)
    block_m: int = 256,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    ln_eps: float = 1e-5,
):
    """One HBM pass per operand for a whole transformer-block linear.

    Layernorm runs in f32 over the full K extent (must be unpadded — all ViT
    widths here are multiples of 128); activation + output requantization run
    in f32 over the full N row, so per-row output scales are exact.
    """
    m, k = x.shape
    _, n = wq.shape
    has_ln = ln_scale is not None
    x_quantized = x_scale is not None
    if has_ln and k % 128 != 0:
        raise ValueError("fused layernorm requires K % 128 == 0 (no K padding)")
    if quant_out and n % 128 != 0:
        raise ValueError("quant_out requires N % 128 == 0 (exact row scales)")
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    block_m = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, block_m)
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    if m_pad != m or k_pad != k:
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
        if x_quantized:
            x_scale = jnp.pad(x_scale, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    if k_pad != k or n_pad != n:
        wq = jnp.pad(wq, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        w_scale = jnp.pad(w_scale, (0, n_pad - n), constant_values=1.0)
        bias = jnp.pad(bias, (0, n_pad - n))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, n_pad - n)))
    if residual is not None and m_pad != m:
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))

    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [pl.BlockSpec((block_m, k_pad), row, memory_space=pltpu.VMEM)]
    inputs = [x]
    if x_quantized:
        in_specs.append(pl.BlockSpec((block_m, 1), row, memory_space=pltpu.VMEM))
        inputs.append(x_scale.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((k_pad, n_pad), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad), const, memory_space=pltpu.VMEM),
    ]
    inputs += [wq, w_scale.reshape(1, n_pad).astype(jnp.float32),
               bias.reshape(1, n_pad).astype(jnp.float32)]
    if has_ln:
        in_specs += [
            pl.BlockSpec((1, k_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), const, memory_space=pltpu.VMEM),
        ]
        inputs += [ln_scale.reshape(1, k_pad).astype(jnp.float32),
                   ln_bias.reshape(1, k_pad).astype(jnp.float32)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((block_m, n_pad), row, memory_space=pltpu.VMEM))
        inputs.append(residual)

    if quant_out:
        out_shape = (
            jax.ShapeDtypeStruct((m_pad, n_pad), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((block_m, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), row, memory_space=pltpu.VMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype)
        out_specs = pl.BlockSpec((block_m, n_pad), row, memory_space=pltpu.VMEM)

    kern = functools.partial(
        _block_kernel,
        has_ln=has_ln,
        has_res=residual is not None,
        act=act,
        quant_out=quant_out,
        x_quantized=x_quantized,
        ln_eps=ln_eps,
    )
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(m_pad // block_m,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_env_interpret(interpret),
    )(*inputs)

    if quant_out:
        oq, oscale = out
        return oq[:m, :n], oscale[:m]
    return out[:m, :n]


# --------------------------------------------------------------------------
# VPU-only fusion kernels: single-pass (layernorm|activation) + per-row
# dynamic quantization. Mosaic's tpu.matmul runs int8 operands at only the
# bf16 MXU rate on this toolchain (measured ~100 vs XLA's ~200 TOP/s), so the
# matmuls themselves stay in XLA; these kernels exist purely to collapse the
# elementwise HBM passes around them — each reads its input once and writes
# the int8 tensor + scales, where the XLA lowering spends 2-3 full passes.
# --------------------------------------------------------------------------


def _rowquant_kernel(*refs, has_ln: bool, act: str | None, ln_eps: float):
    it = iter(refs)
    x_ref = next(it)
    ln_scale_ref = next(it) if has_ln else None
    ln_bias_ref = next(it) if has_ln else None
    o_ref = next(it)
    oscale_ref = next(it)

    x = x_ref[:].astype(jnp.float32)
    if has_ln:
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_scale_ref[:] + ln_bias_ref[:]
    if act == "quick_gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    elif act == "gelu_tanh":  # SigLIP's gelu_pytorch_tanh (tanh form is exact)
        x = jax.nn.gelu(x, approximate=True)
    elif act == "gelu":
        x = x * 0.5 * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8)
    o_ref[:] = jnp.clip(jnp.round(x * (127.0 / amax)), -127, 127).astype(jnp.int8)
    oscale_ref[:] = amax * (1.0 / 127.0)


@functools.partial(
    jax.jit, static_argnames=("act", "block_m", "interpret", "ln_eps")
)
def rowquant(
    x: jnp.ndarray,  # [M, K] bf16/f32
    ln_scale: jnp.ndarray | None = None,  # fused layernorm (prologue)
    ln_bias: jnp.ndarray | None = None,
    act: str | None = None,  # fused activation (before quantize)
    block_m: int = 512,
    interpret: bool = False,
    ln_eps: float = 1e-5,
):
    """(layernorm|act) + per-row symmetric int8 quantization in ONE HBM pass.
    Returns (int8 [M, K], f32 [M, 1] row scales)."""
    m, k = x.shape
    has_ln = ln_scale is not None
    if k % 128 != 0:
        raise ValueError("rowquant requires K % 128 == 0 (exact row stats)")
    # VMEM-budgeted tile: ~14 B/row-element (bf16 in + f32 working + int8 out,
    # double-buffered); keeps K=4096 (the ViT MLP hidden) under the 16 MB limit
    block_m = min(block_m, max(128, (12 * 2**20) // (14 * k) // 8 * 8))
    block_m = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [pl.BlockSpec((block_m, k), row, memory_space=pltpu.VMEM)]
    inputs = [x]
    if has_ln:
        in_specs += [
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
        ]
        inputs += [ln_scale.reshape(1, k).astype(jnp.float32),
                   ln_bias.reshape(1, k).astype(jnp.float32)]

    oq, oscale = pl.pallas_call(
        functools.partial(_rowquant_kernel, has_ln=has_ln, act=act, ln_eps=ln_eps),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, k), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        grid=(m_pad // block_m,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_m, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), row, memory_space=pltpu.VMEM),
        ),
        interpret=_env_interpret(interpret),
    )(*inputs)
    return oq[:m], oscale[:m]


def _rowquant_static_kernel(x_ref, ln_scale_ref, ln_bias_ref, inv_ref, o_ref,
                            *, ln_eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + ln_eps)
    x = x * ln_scale_ref[:] + ln_bias_ref[:]
    o_ref[:] = jnp.clip(jnp.round(x * inv_ref[0, 0]), -127, 127).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("block_m", "interpret", "ln_eps")
)
def rowquant_static(
    x: jnp.ndarray,  # [M, K] bf16/f32
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    amax,  # calibrated static activation amax (scalar, traced)
    block_m: int = 512,
    interpret: bool = False,
    ln_eps: float = 1e-5,
):
    """layernorm + STATIC-scale int8 quantization in one HBM pass.

    The static-scale sibling of :func:`rowquant`: with the quantization scale
    known up front there is no amax reduction at all — read the tile, ln in
    f32, scale/round/clip, write int8. Returns int8 [M, K] (dequant scale is
    ``amax/127``, held by the caller)."""
    m, k = x.shape
    if k % 128 != 0:
        raise ValueError("rowquant_static requires K % 128 == 0 (exact stats)")
    block_m = min(block_m, max(128, (12 * 2**20) // (10 * k) // 8 * 8))
    block_m = min(block_m, _round_up(m, 8))
    # prefer a block that divides M exactly: an M-pad here copies the WHOLE
    # tensor (0.26 ms/layer on the round-3 ViT-L profile) just to round the
    # grid, which costs more than slightly smaller tiles
    if m % block_m:
        for cand in range(block_m - block_m % 8, 7, -8):
            if m % cand == 0:
                block_m = cand
                break
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    inv = jnp.reshape(127.0 / jnp.asarray(amax, jnp.float32), (1, 1))
    out = pl.pallas_call(
        functools.partial(_rowquant_static_kernel, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), jnp.int8),
        grid=(m_pad // block_m,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec((block_m, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, k), row, memory_space=pltpu.VMEM),
        interpret=_env_interpret(interpret),
    )(x, ln_scale.reshape(1, k).astype(jnp.float32),
      ln_bias.reshape(1, k).astype(jnp.float32), inv)
    return out[:m]


def q_matmul_pre(
    xq: jnp.ndarray,  # [M, K] int8
    x_scale: jnp.ndarray,  # [M, 1] f32
    wq: jnp.ndarray,  # [K, N] int8
    w_scale: jnp.ndarray,  # [N] f32
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """XLA int8 matmul over pre-quantized activations (the MXU-fast path on
    this toolchain) with the dequant+bias(+residual) epilogue left to XLA's
    fusion. Pairs with :func:`rowquant`."""
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype)
