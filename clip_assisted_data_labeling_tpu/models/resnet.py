"""CLIP modified-ResNet image tower (RN50/RN101/RN50x4/x16/x64), TPU-native.

The reference reaches these towers through the same open_clip dispatch as the
ViTs (``CLIP_Encoder`` accepts any "Arch/pretrained" name, reference
utils/embedder.py:58-63 — e.g. ``RN50/openai``); open_clip's ModifiedResNet
differs from a torchvision ResNet in three ways that matter for weights and
parity:

  * a 3-conv stem (stride-2 3x3 → 3x3 → 3x3) followed by a 2x2 average pool,
  * anti-aliased downsampling: every stride-2 site is an average pool followed
    by a stride-1 conv (both in the bottleneck mainline and its shortcut),
  * an attention-pooling readout (``attnpool``): tokens = the final 7x7 grid
    plus a prepended mean token, learned positional embedding, one multi-head
    attention with the mean token as the only query, projected to embed_dim.

TPU mapping: convolutions run as NHWC ``lax.conv_general_dilated`` (XLA tiles
them onto the MXU directly), BatchNorm running stats are folded into per-channel
affines at conversion time (inference-only framework — the fold is exact, and
XLA fuses the affine+relu into the conv epilogue), and the whole forward is one
jitted program shared with the ViT path (encoders.CLIPImageEncoder dispatches
on the config type). Compute is bf16 with the attention softmax in f32, like
the ViT tower.

int8_static (W8A8) is supported on the bottleneck 1x1 convolutions — they are
matmul-shaped (the kernel is [1, 1, Cin, Cout]) and carry ~half the tower's
FLOPs, so they run as XLA int8 matmuls at the 2-3x MXU rate exactly like the
ConvNeXt pointwise path (models/convnext.py): ``quantize_rn_params`` quantizes
every block's conv1/conv3 per output channel, ``rn_act_amax`` calibrates the
two per-block static activation sites (the block input feeding conv1, the
post-avgpool ReLU output feeding conv3), and ``_bottleneck`` takes the static
branch when scales are attached. The 3x3 convs, stem, downsample shortcut and
attnpool stay bf16 (XLA int8 CONVS are not a win on v5e, and the shortcut /
attnpool terms are a small FLOPs share). Dynamic int8 still downgrades to
bf16 (no per-row formulation for conv-shaped activations).

Weight conversion from open_clip ``visual.*`` RN state dicts lives in
models/clip_weights.convert_rn_visual; parity against a from-spec torch mirror
is validated in tests/test_rn_parity.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.config import CLIP_MEAN, CLIP_STD


@dataclasses.dataclass(frozen=True)
class RNConfig:
    """Geometry of one modified-ResNet tower (open_clip ModifiedResNet args)."""

    layers: tuple = (3, 4, 6, 3)  # bottleneck blocks per stage
    width: int = 64  # stem output channels; stage s runs at width * 2**s
    image_size: int = 224
    embed_dim: int = 1024  # attnpool output dim
    heads: int = 32  # attnpool heads (open_clip: vision_width * 32 // 64)
    bn_eps: float = 1e-5  # torch BatchNorm2d default
    expansion: int = 4  # bottleneck expansion factor
    # shared-attribute surface with VitConfig so the encoder wrapper and the
    # checkpoint loaders need no type switches for these:
    patch_size: int | None = None  # no patchify path; crops emit [R, R, 3]
    use_rope2d: bool = False
    norm_mean: tuple = CLIP_MEAN
    norm_std: tuple = CLIP_STD

    @property
    def stage_widths(self) -> tuple:
        return tuple(self.width * (2 ** s) for s in range(4))

    @property
    def final_width(self) -> int:
        # stage 4 runs at width*8; bottleneck expansion ×4 → width*32
        return self.width * 8 * self.expansion

    @property
    def grid(self) -> int:
        # stem divides by 4 (stride-2 conv + 2x2 avgpool), stages 2-4 by 2 each
        return self.image_size // 32

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1  # +1: the prepended mean token


# open_clip modified-ResNet geometries (model_configs/RN*.json): layers tuple,
# stem width, input resolution, output embedding dim; heads = width * 32 / 64.
_RN_ARCHS = {
    "RN50": dict(layers=(3, 4, 6, 3), width=64, image_size=224, embed_dim=1024,
                 heads=32),
    "RN101": dict(layers=(3, 4, 23, 3), width=64, image_size=224,
                  embed_dim=512, heads=32),
    "RN50x4": dict(layers=(4, 6, 10, 6), width=80, image_size=288,
                   embed_dim=640, heads=40),
    "RN50x16": dict(layers=(6, 8, 18, 8), width=96, image_size=384,
                    embed_dim=768, heads=48),
    "RN50x64": dict(layers=(3, 15, 36, 10), width=128, image_size=448,
                    embed_dim=1024, heads=64),
}

# tiny config for tests / CI (two stages' worth of real depth at toy width)
RN_TEST_TINY = RNConfig(layers=(1, 1, 1, 1), width=8, image_size=64,
                        embed_dim=16, heads=4)


def resolve_rn_config(arch: str) -> RNConfig | None:
    """'RN50'/'RN101'/'RN50x4'… → RNConfig (None if not an RN name)."""
    if arch == "RN-Test":
        return RN_TEST_TINY
    if arch in _RN_ARCHS:
        return RNConfig(**_RN_ARCHS[arch])
    return None


def _block_widths(cfg: RNConfig):
    """Yield (stage, block, in_ch, mid_ch, stride) for every bottleneck."""
    in_ch = cfg.width
    for s, n_blocks in enumerate(cfg.layers):
        mid = cfg.width * (2 ** s)
        for b in range(n_blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            yield s, b, in_ch, mid, stride
            in_ch = mid * cfg.expansion


def init_rn_params(cfg: RNConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree (flat keys; conv kernels HWIO)."""
    keys = iter(jax.random.split(key, 8 + 4 * sum(cfg.layers) * 4))

    def conv(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return (jax.random.normal(next(keys), (kh, kw, cin, cout))
                * fan_in ** -0.5).astype(dtype)

    def affine(c):  # folded-BN scale/bias
        return jnp.ones((c,), dtype), jnp.zeros((c,), dtype)

    half = cfg.width // 2
    p = {"conv1": conv(3, 3, 3, half), "conv2": conv(3, 3, half, half),
         "conv3": conv(3, 3, half, cfg.width)}
    for i in (1, 2, 3):
        c = half if i < 3 else cfg.width
        p[f"bn{i}_scale"], p[f"bn{i}_bias"] = affine(c)
    for s, b, cin, mid, stride in _block_widths(cfg):
        pre = f"s{s}b{b}_"
        out_ch = mid * cfg.expansion
        p[pre + "conv1"] = conv(1, 1, cin, mid)
        p[pre + "conv2"] = conv(3, 3, mid, mid)
        p[pre + "conv3"] = conv(1, 1, mid, out_ch)
        for i, c in ((1, mid), (2, mid), (3, out_ch)):
            p[pre + f"bn{i}_scale"], p[pre + f"bn{i}_bias"] = affine(c)
        if stride > 1 or cin != out_ch:
            p[pre + "down_conv"] = conv(1, 1, cin, out_ch)
            p[pre + "down_scale"], p[pre + "down_bias"] = affine(out_ch)
    w_final = cfg.final_width
    scale = w_final ** -0.5
    p["pool_pos_emb"] = (jax.random.normal(next(keys),
                                           (cfg.seq_len, w_final))
                         * scale).astype(dtype)
    for name, cout in (("q", w_final), ("k", w_final), ("v", w_final),
                       ("c", cfg.embed_dim)):
        p[f"pool_{name}_kernel"] = (jax.random.normal(
            next(keys), (w_final, cout)) * scale).astype(dtype)
        p[f"pool_{name}_bias"] = jnp.zeros((cout,), dtype)
    return p


def quantize_rn_params(params: dict, min_mid: int | None = None) -> dict:
    """W8A8 weight quantization for the bottleneck 1x1 convolutions.

    A block's ``conv1``/``conv3`` ([1, 1, Cin, Cout] HWIO) becomes a 2-D
    [Cin, Cout] int8 matmul kernel with a sibling ``_scale`` leaf ([Cout] f32,
    per output channel); the 3x3 convs, stem, downsample shortcut and attnpool
    pass through (they stay bf16 in the static forward). ``min_mid`` skips
    blocks whose bottleneck width is below it (the narrow early stages are
    bandwidth-bound — the quantize passes there cost more than the int8
    matmul saves; the forward falls back per block by key presence). Default
    from ``CTPU_RN_INT8_MIN_MID``."""
    from clip_assisted_data_labeling_tpu.ops import knobs
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_weight

    if min_mid is None:
        min_mid = knobs.RN_INT8_MIN_MID
    out: dict = {}
    for name, leaf in params.items():
        if (name.endswith(("conv1", "conv3")) and name.startswith("s")
                and "_" in name):
            # bottleneck width: conv1 is [.., cin, mid], conv3 [.., mid, out]
            mid = leaf.shape[-1] if name.endswith("conv1") else leaf.shape[-2]
            if mid < min_mid:
                out[name] = jnp.asarray(leaf)
                continue
            q, s = quantize_weight(np.asarray(leaf).reshape(leaf.shape[-2:]))
            out[name] = jnp.asarray(q)
            out[name + "_scale"] = jnp.asarray(s)
        else:
            out[name] = jnp.asarray(leaf)
    return out


def is_rn_quantized(params: dict) -> bool:
    return any(k.endswith("conv1_scale") for k in params)


def rn_int8_static_enabled(cfg: RNConfig) -> bool:
    """Resolve the modified-ResNet W8A8 knob for one tower.
    ``CTPU_RN_INT8=1`` forces on, ``=0`` forces off; the default ``auto``
    enables the path exactly where it measured a win on the bench chip
    (BENCH_NOTES round-4 follow-up: the wide x-scale towers; the thin-stem
    RN50/RN101 stage-1 blocks are bandwidth-bound like the small ConvNeXts)."""
    from clip_assisted_data_labeling_tpu.ops import knobs

    if knobs.RN_INT8 == "on":
        return True
    if knobs.RN_INT8 == "off":
        return False
    return cfg.final_width >= 3072


def attach_rn_act_amax(params: dict, amax: dict, margin: float = 1.1) -> dict:
    """Attach calibrated static activation scales (``s{s}b{b}_act_amax`` [2]
    from :func:`rn_act_amax`); same margin semantics as the ViT path
    (models/vit.attach_act_amax)."""
    out = dict(params)
    for key, v in amax.items():
        out[key] = jnp.asarray(v, jnp.float32) * margin
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def rn_act_amax(params: dict, images: jnp.ndarray, cfg: RNConfig,
                compute_dtype=jnp.bfloat16) -> dict:
    """Calibration forward: per-block amax at the two quantized-activation
    sites (block input → conv1, post-avgpool ReLU → conv3). Returns
    ``{"s{s}b{b}_act_amax": [2]}``. Quantized kernels are dequantized for
    this one forward (one batch; attach adds margin)."""
    x = images.astype(compute_dtype)
    x = _affine_relu(_conv(x, params["conv1"], stride=2, pad=1), params, "bn1")
    x = _affine_relu(_conv(x, params["conv2"], pad=1), params, "bn2")
    x = _affine_relu(_conv(x, params["conv3"], pad=1), params, "bn3")
    x = _avgpool(x, 2)
    amaxes: dict = {}
    for s, b, _cin, _mid, stride in _block_widths(cfg):
        pre = f"s{s}b{b}_"
        x, amaxes[pre + "act_amax"] = _bottleneck(x, params, pre, stride,
                                                  capture_amax=True)
    return amaxes


def _conv(x, kernel, stride: int = 1, pad: int = 0):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _affine_relu(x, p, name: str, relu: bool = True):
    y = x * p[name + "_scale"].astype(x.dtype) + p[name + "_bias"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _avgpool(x, k: int):
    if k == 1:
        return x
    y = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, k, k, 1), (1, k, k, 1), "VALID",
    )
    return y * (1.0 / (k * k))


def _pointwise(x, p, key: str):
    """1x1 conv as written in the checkpoint ([1,1,Cin,Cout] HWIO) or its
    quantized 2-D [Cin,Cout] form, dequantized (bf16 fallback / calibration
    forwards on a quantized pytree)."""
    k = p[key]
    if key + "_scale" in p:
        k = (k.astype(jnp.float32)
             * p[key + "_scale"].astype(jnp.float32)).astype(x.dtype)
        k = k[None, None]
    return _conv(x, k)


def _pointwise_static(x, p, key: str, amax):
    """Statically-quantized 1x1 conv: the activation quantize fuses into its
    producer's epilogue (ops/quant.quant_static) and the int32 accumulator
    dequantizes in the output fusion. Two formulations (CTPU_RN_INT8_CONV):
    reshape-to-matmul (q_matmul_pre — the ViT/CNX int8 path), or an int8
    NHWC conv that never leaves the conv layout (no [B,H,W,C]→[M,K]
    relayout of the large activations)."""
    from clip_assisted_data_labeling_tpu.ops import knobs
    from clip_assisted_data_labeling_tpu.ops.quant import quant_static
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

    xq = quant_static(x, amax)
    if knobs.RN_INT8_CONV:
        acc = jax.lax.conv_general_dilated(
            xq, p[key][None, None], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (amax * (1.0 / 127.0))
             * p[key + "_scale"].astype(jnp.float32))
        return y.astype(x.dtype)
    b, hh, ww, cin = x.shape
    y = q_matmul_pre(xq.reshape(b * hh * ww, cin), amax * (1.0 / 127.0),
                     p[key], p[key + "_scale"], out_dtype=x.dtype)
    return y.reshape(b, hh, ww, y.shape[-1])


def _bottleneck(x, p, pre: str, stride: int, capture_amax: bool = False):
    """open_clip Bottleneck: 1x1 → 3x3 → [avgpool if stride>1] → 1x1, with an
    avgpool+1x1-conv shortcut whenever shape changes (anti-aliased rather than
    strided-conv downsampling).

    Three variants share the 3x3/shortcut middle: the bf16 path (float params,
    or quantized params before calibration — kernels dequantized), the
    int8_static path (quantized 1x1 kernels + attached ``{pre}act_amax``), and
    the calibration capture (bf16 path that also returns the block's [2] site
    amaxes)."""
    static = (not capture_amax and pre + "conv1_scale" in p
              and pre + "act_amax" in p)
    a = p[pre + "act_amax"] if static else None
    a0 = (jnp.max(jnp.abs(x.astype(jnp.float32)))
          if capture_amax else None)
    if static:
        y = _pointwise_static(x, p, pre + "conv1", a[0])
    else:
        y = _pointwise(x, p, pre + "conv1")
    y = _affine_relu(y, p, pre + "bn1")
    y = _affine_relu(_conv(y, p[pre + "conv2"], pad=1), p, pre + "bn2")
    y = _avgpool(y, stride)
    a1 = (jnp.max(jnp.abs(y.astype(jnp.float32)))
          if capture_amax else None)
    if static:
        y = _pointwise_static(y, p, pre + "conv3", a[1])
    else:
        y = _pointwise(y, p, pre + "conv3")
    y = _affine_relu(y, p, pre + "bn3", relu=False)
    if pre + "down_conv" in p:
        shortcut = _affine_relu(_conv(_avgpool(x, stride), p[pre + "down_conv"]),
                                p, pre + "down", relu=False)
    else:
        shortcut = x
    out = jax.nn.relu(y + shortcut)
    return (out, jnp.stack([a0, a1])) if capture_amax else out


def _attention_pool_2d(x, p, cfg: RNConfig):
    """CLIP AttentionPool2d: [B, g, g, C] grid → [B, embed_dim].

    Tokens = mean token ‖ flattened grid, plus a learned positional embedding;
    one multi-head attention where ONLY the mean token queries (separate
    q/k/v projections, then c_proj to embed_dim)."""
    B, gh, gw, C = x.shape
    dt = x.dtype
    tokens = x.reshape(B, gh * gw, C)
    mean_tok = jnp.mean(tokens.astype(jnp.float32), axis=1,
                        keepdims=True).astype(dt)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)
    tokens = tokens + p["pool_pos_emb"].astype(dt)
    h = cfg.heads
    d = C // h
    q = tokens[:, :1] @ p["pool_q_kernel"].astype(dt) + p["pool_q_bias"].astype(dt)
    k = tokens @ p["pool_k_kernel"].astype(dt) + p["pool_k_bias"].astype(dt)
    v = tokens @ p["pool_v_kernel"].astype(dt) + p["pool_v_bias"].astype(dt)
    q = q.reshape(B, 1, h, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhsd->bhqs", q, k) * (d ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
    pooled = jnp.einsum("bhqs,bhsd->bhqd", probs, v)
    pooled = pooled.transpose(0, 2, 1, 3).reshape(B, C)
    return pooled @ p["pool_c_kernel"].astype(dt) + p["pool_c_bias"].astype(dt)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "normalize"))
def rn_encode_image(
    params: dict,
    images: jnp.ndarray,  # [B, R, R, 3] preprocessed (CLIP-normalized) NHWC
    cfg: RNConfig,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
) -> jnp.ndarray:
    """Full modified-ResNet forward → [B, embed_dim], L2-normalized like the
    reference's encode_image (utils/embedder.py:98-99)."""
    x = images.astype(compute_dtype)
    x = _affine_relu(_conv(x, params["conv1"], stride=2, pad=1), params, "bn1")
    x = _affine_relu(_conv(x, params["conv2"], pad=1), params, "bn2")
    x = _affine_relu(_conv(x, params["conv3"], pad=1), params, "bn3")
    x = _avgpool(x, 2)
    for s, b, _cin, _mid, stride in _block_widths(cfg):
        x = _bottleneck(x, params, f"s{s}b{b}_", stride)
    emb = _attention_pool_2d(x, params, cfg).astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb
