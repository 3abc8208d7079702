"""W8A8 dynamic quantization for the ViT's large matmuls.

The bench chip runs int8 MXU matmuls at ~2.4× its bf16 rate, and the encoder is
matmul-roofline-bound, so an int8 path nearly doubles embedding throughput.
Scheme (standard serving-grade dynamic quantization):

  * weights: symmetric per-output-channel int8, quantized once at load,
  * activations: symmetric per-row (per-token) int8, scales computed on the fly
    from the running amax — no calibration pass needed,
  * accumulation in int32 on the MXU, dequantized with row·col scales in one
    fused epilogue,
  * everything precision-sensitive (layernorm, softmax/attention, residuals,
    final projection) stays in bf16/f32.

This is an opt-in fast mode (--compute_dtype int8): embedding cosine vs the
bf16 path is ~1e-3 (tests assert <5e-3), slightly outside the strict reference
parity budget, so the default remains bf16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[in, out] float kernel → (int8 kernel, f32 per-out-channel scale)."""
    k = np.asarray(kernel, np.float32)
    amax = np.maximum(np.abs(k).max(axis=-2, keepdims=True), 1e-8)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.squeeze(-2)


def quantize_vit_params(params: dict) -> dict:
    """Quantize the stacked transformer-block matmul kernels + patch embedding.

    Returns a new pytree where each quantized kernel K becomes int8 and gains a
    sibling "<name>_scale" leaf; ln/bias/proj leaves pass through in f32.
    """
    out: dict = {}
    for name, leaf in params.items():
        if name == "blocks":
            blocks: dict = {}
            for k, v in leaf.items():
                if k.endswith("_kernel"):
                    qs, ss = [], []
                    for layer in np.asarray(v):
                        q, s = quantize_weight(layer)
                        qs.append(q)
                        ss.append(s)
                    blocks[k] = jnp.asarray(np.stack(qs))
                    blocks[k + "_scale"] = jnp.asarray(np.stack(ss))
                else:
                    blocks[k] = jnp.asarray(v)
            out[name] = blocks
        elif name == "patch_kernel":
            q, s = quantize_weight(np.asarray(leaf))
            out[name] = jnp.asarray(q)
            out[name + "_scale"] = jnp.asarray(s)
        else:
            out[name] = jnp.asarray(leaf)
    return out


def q_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
             bias: jnp.ndarray | None = None, out_dtype=jnp.bfloat16,
             residual: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dynamic per-row int8 × per-channel int8 → dequantized matmul.

    x: [..., K] float; w_q: [K, N] int8; w_scale: [N] f32; residual (optional,
    [..., N]) is added INSIDE the dequant epilogue so XLA fuses it into the
    matmul's output fusion — a standalone residual add measured 0.21 ms/layer
    (a full extra HBM pass over [33k, 1024]) on the round-3 ViT-L profile.

    An experimental fully-fused Pallas version exists (ops/quant_kernel.py,
    quantize→matmul→dequant in VMEM) behind CTPU_FUSED_QMATMUL=1; measured
    slower than this XLA lowering on the round-1 bench chip (430 vs 314 ms/step
    for ViT-L — the resident-weight-panel pipelining needs tuning), so the XLA
    path is the default.
    """
    from clip_assisted_data_labeling_tpu.ops import knobs

    if knobs.FUSED_QMATMUL and jax.default_backend() in ("tpu", "axon"):
        from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_linear_fused

        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        out = q_linear_fused(flat, w_q, w_scale, bias, out_dtype=out_dtype)
        out = out.reshape(lead + (w_q.shape[-1],))
        return out if residual is None else residual + out

    # flatten leading dims: 2-D operands let XLA pick plain row-major layouts
    # for the int8 activation tensor (3-D inputs got a transposed layout that
    # cost the K=4096 matmul ~20% MXU rate on the round-2 profile)
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    x_scale = amax / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.reshape(-1, w_q.shape[-1]).astype(jnp.float32)
    return y.astype(out_dtype).reshape(lead + (w_q.shape[-1],))


def quant_static(x: jnp.ndarray, amax) -> jnp.ndarray:
    """Symmetric int8 quantization with a FIXED (calibrated) scale.

    Purely elementwise — XLA fuses it into the producing op's epilogue, so the
    tensor is written to HBM once, already int8. The per-row dynamic variant
    needs a full-row amax before the first element can be written and therefore
    always costs a second HBM pass (0.61 ms/layer on the ViT-L round-3 profile
    for the gelu output alone). Values beyond ±amax clip; the calibration
    margin in models/vit.attach_act_amax covers batch-to-batch drift.
    """
    # floor like every dynamic sibling: a dead channel/site calibrating to
    # amax==0 must quantize to zeros, not round(0*inf)=NaN
    inv = 127.0 / jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-8)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )


def is_quantized(params: dict) -> bool:
    return "patch_kernel_scale" in params or (
        isinstance(params.get("blocks"), dict) and "qkv_kernel_scale" in params["blocks"]
    )
