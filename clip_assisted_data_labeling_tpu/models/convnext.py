"""CLIP ConvNeXt image towers (convnext_base_w / large_d / xxlarge), TPU-native.

The reference reaches these through the same open_clip dispatch as every other
tower (``CLIP_Encoder`` accepts any "Arch/pretrained" name, reference
utils/embedder.py:58-63 — e.g. ``convnext_base_w/laion2b_s13b_b82k``);
open_clip wraps a timm ConvNeXt trunk plus a small projection head:

  * stem: 4x4 stride-4 conv + LayerNorm (eps 1e-6),
  * 4 stages; stages 2-4 open with a LayerNorm + 2x2 stride-2 conv
    downsample; every block is depthwise-7x7 conv -> LN -> pointwise
    Linear(C->4C) -> GELU -> Linear(4C->C) -> layer-scale gamma -> residual,
  * head: global average pool -> LayerNorm -> projection (plain Linear for
    the ``_w`` models, a Linear-GELU-Linear MLP with hidden 2*embed_dim for
    the ``_d`` models — open_clip TimmModel proj='linear'/'mlp').

TPU mapping: everything runs channels-last NHWC; the pointwise 1x1 "convs"
are plain [BHW, C] matmuls on the MXU (the FLOPs bulk), the depthwise 7x7
runs as a feature-grouped ``lax.conv_general_dilated`` fused with its LN
epilogue by XLA, and each stage's identically-shaped blocks are stacked and
driven by ONE ``lax.scan`` (stage 3 of convnext_large_d has 27 blocks —
scanning keeps the compiled program O(stages), not O(depth), same trick as
the ViT's stacked blocks). Compute is bf16 with LayerNorm statistics in f32.

int8_static (W8A8) is supported on the pointwise matmuls — the FLOPs bulk:
``quantize_cnx_params`` quantizes fc1/fc2 per output channel, ``cnx_act_amax``
calibrates the two per-block static activation sites (post-LN fc1 input,
post-GELU fc2 input), and the stage scan takes the static branch when scales
are attached (XLA int8 matmuls run 2-3x the bf16 MXU rate on v5e —
BENCH_NOTES). The depthwise 7x7, downsample/stem convs, LNs and head stay
bf16 (XLA int8 CONVS are not a win on v5e, and those terms are a small
FLOPs share). The dynamic-int8 mode still downgrades to bf16 like the RN
towers (models/encoders.py guard).

Weight conversion (models/clip_weights.convert_cnx_visual) accepts both the
open_clip/timm layout (``visual.trunk.*`` + ``visual.head.*``) and the HF
``ConvNextModel`` layout (``embeddings.* / encoder.stages.*``); parity is
pinned against a locally-instantiated HF mirror in tests/test_cnx_parity.py
(zero egress — same policy as the SigLIP family)."""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.config import CLIP_MEAN, CLIP_STD


@dataclasses.dataclass(frozen=True)
class CNXConfig:
    """Geometry of one open_clip ConvNeXt tower (timm trunk + proj head)."""

    depths: tuple = (3, 3, 27, 3)  # blocks per stage
    dims: tuple = (128, 256, 512, 1024)  # channels per stage
    image_size: int = 256
    embed_dim: int = 640
    proj: str = "linear"  # 'linear' | 'mlp' (open_clip TimmModel head)
    ln_eps: float = 1e-6  # block/stem/downsample LNs (timm + HF hardcode 1e-6)
    head_ln_eps: float = 1e-6  # post-pool LN (timm head.norm; HF ConvNextModel
    # uses config.layer_norm_eps here — the converter reads it from the config)
    # shared-attribute surface with VitConfig/RNConfig (encoder wrapper +
    # checkpoint loaders need no type switches for these):
    patch_size: int | None = None  # no patchify path; crops emit [R, R, 3]
    use_rope2d: bool = False
    # open_clip's laion ConvNeXt configs keep the default CLIP normalization;
    # a config field so real checkpoints can re-pin it (same policy as PE)
    norm_mean: tuple = CLIP_MEAN
    norm_std: tuple = CLIP_STD

    @property
    def final_width(self) -> int:
        return self.dims[-1]

    @property
    def grid(self) -> int:
        return self.image_size // 32  # stem /4, three stride-2 downsamples


# open_clip ConvNeXt-CLIP geometries (model_configs/convnext_*.json: timm
# trunk name -> depths/dims, image resolution, embed dim, proj head kind).
_CNX_ARCHS = {
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                          image_size=224, embed_dim=512, proj="linear"),
    "convnext_base_w": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                            image_size=256, embed_dim=640, proj="linear"),
    "convnext_base_w_320": dict(depths=(3, 3, 27, 3),
                                dims=(128, 256, 512, 1024),
                                image_size=320, embed_dim=640, proj="linear"),
    "convnext_large_d": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536),
                             image_size=256, embed_dim=768, proj="mlp"),
    "convnext_large_d_320": dict(depths=(3, 3, 27, 3),
                                 dims=(192, 384, 768, 1536),
                                 image_size=320, embed_dim=768, proj="mlp"),
    "convnext_xxlarge": dict(depths=(3, 4, 30, 3), dims=(384, 768, 1536, 3072),
                             image_size=256, embed_dim=1024, proj="linear"),
    "convnext_xxlarge_320": dict(depths=(3, 4, 30, 3),
                                 dims=(384, 768, 1536, 3072),
                                 image_size=320, embed_dim=1024,
                                 proj="linear"),
    # tiers open_clip publishes as configs WITHOUT pretrained tags (the
    # reference's dispatch still reaches them by name; trunk dims are the
    # standard timm ConvNeXt ladder). embed_dim re-pins if weights appear.
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                          image_size=224, embed_dim=1024, proj="linear"),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768),
                           image_size=224, embed_dim=512, proj="linear"),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536),
                           image_size=224, embed_dim=768, proj="linear"),
    "convnext_xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048),
                            image_size=224, embed_dim=1024, proj="linear"),
}

# tiny config for tests / CI (all four stages at toy width, both proj kinds
# covered by instantiating with proj overridden in the tests)
CNX_TEST_TINY = CNXConfig(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                          image_size=64, embed_dim=16, proj="linear")


def resolve_cnx_config(arch: str) -> CNXConfig | None:
    """'convnext_base_w'/'convnext_large_d_320'… → CNXConfig (None if not
    a ConvNeXt name)."""
    if arch == "CNX-Test":
        return CNX_TEST_TINY
    if arch == "CNX-Test-mlp":
        return dataclasses.replace(CNX_TEST_TINY, proj="mlp")
    if arch in _CNX_ARCHS:
        return CNXConfig(**_CNX_ARCHS[arch])
    return None


def init_cnx_params(cfg: CNXConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree. Per-stage block params are STACKED along
    a leading depth axis (driven by lax.scan in the forward)."""
    keys = iter(jax.random.split(key, 16 + 4 * len(cfg.depths)))

    def nrm(shape, std):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    c0 = cfg.dims[0]
    p = {
        "stem_kernel": nrm((4, 4, 3, c0), (4 * 4 * 3) ** -0.5),
        "stem_bias": jnp.zeros((c0,), dtype),
        "stem_ln_scale": jnp.ones((c0,), dtype),
        "stem_ln_bias": jnp.zeros((c0,), dtype),
    }
    for s, (d, c) in enumerate(zip(cfg.depths, cfg.dims)):
        if s > 0:
            cin = cfg.dims[s - 1]
            p[f"s{s}_down_ln_scale"] = jnp.ones((cin,), dtype)
            p[f"s{s}_down_ln_bias"] = jnp.zeros((cin,), dtype)
            p[f"s{s}_down_kernel"] = nrm((2, 2, cin, c), (2 * 2 * cin) ** -0.5)
            p[f"s{s}_down_bias"] = jnp.zeros((c,), dtype)
        p[f"s{s}_dw_kernel"] = nrm((d, 7, 7, 1, c), (7 * 7) ** -0.5)
        p[f"s{s}_dw_bias"] = jnp.zeros((d, c), dtype)
        p[f"s{s}_ln_scale"] = jnp.ones((d, c), dtype)
        p[f"s{s}_ln_bias"] = jnp.zeros((d, c), dtype)
        p[f"s{s}_fc1_kernel"] = nrm((d, c, 4 * c), c ** -0.5)
        p[f"s{s}_fc1_bias"] = jnp.zeros((d, 4 * c), dtype)
        p[f"s{s}_fc2_kernel"] = nrm((d, 4 * c, c), (4 * c) ** -0.5)
        p[f"s{s}_fc2_bias"] = jnp.zeros((d, c), dtype)
        p[f"s{s}_gamma"] = jnp.full((d, c), 1e-6, dtype)
    cl = cfg.final_width
    p["head_ln_scale"] = jnp.ones((cl,), dtype)
    p["head_ln_bias"] = jnp.zeros((cl,), dtype)
    if cfg.proj == "mlp":
        hidden = 2 * cfg.embed_dim  # open_clip TimmModel Mlp(prev, 2E, E)
        p["proj_fc1_kernel"] = nrm((cl, hidden), cl ** -0.5)
        p["proj_fc1_bias"] = jnp.zeros((hidden,), dtype)
        p["proj_fc2_kernel"] = nrm((hidden, cfg.embed_dim), hidden ** -0.5)
        p["proj_fc2_bias"] = jnp.zeros((cfg.embed_dim,), dtype)
    else:
        p["proj_kernel"] = nrm((cl, cfg.embed_dim), cl ** -0.5)
        p["proj_bias"] = jnp.zeros((cfg.embed_dim,), dtype)
    return p


def quantize_cnx_params(params: dict) -> dict:
    """W8A8 weight quantization for the pointwise block matmuls.

    Per-stage stacked ``s{s}_fc1_kernel``/``s{s}_fc2_kernel`` ([D, K, N])
    become int8 with a sibling ``_scale`` leaf ([D, N], per output channel);
    convs/LNs/head pass through (they stay bf16 in the static forward)."""
    import numpy as np

    from clip_assisted_data_labeling_tpu.ops.quant import quantize_weight

    out: dict = {}
    for name, leaf in params.items():
        if name.endswith(("_fc1_kernel", "_fc2_kernel")) and name.startswith("s"):
            qs, ss = [], []
            for layer in np.asarray(leaf):
                q, s = quantize_weight(layer)
                qs.append(q)
                ss.append(s)
            out[name] = jnp.asarray(np.stack(qs))
            out[name + "_scale"] = jnp.asarray(np.stack(ss))
        else:
            out[name] = jnp.asarray(leaf)
    return out


def is_cnx_quantized(params: dict) -> bool:
    return "s0_fc1_kernel_scale" in params


def cnx_int8_static_enabled(cfg: CNXConfig) -> bool:
    """Resolve the ConvNeXt W8A8 knob for one tower (BENCH_NOTES round-10
    A/B). ``CTPU_CNX_INT8=1`` forces on, ``=0`` forces off; the default
    ``auto`` enables the path exactly where it measured a win — towers with
    final width >= 1536 (large_d: 183.5 vs 173-175 bf16, +5.4%). Below that
    the small-C stages are bandwidth-bound and the quantize passes cost more
    than the int8 matmul speedup (base_w: 279.7 vs 289, -3%), so auto runs
    bf16 there."""
    from clip_assisted_data_labeling_tpu.ops import knobs

    if knobs.CNX_INT8 == "on":
        return True
    if knobs.CNX_INT8 == "off":
        return False
    return cfg.final_width >= 1536


def attach_cnx_act_amax(params: dict, amax: dict, margin: float = 1.1) -> dict:
    """Attach calibrated static activation scales (``s{s}_act_amax`` [D, 2]
    from :func:`cnx_act_amax`); same margin semantics as the ViT path
    (models/vit.attach_act_amax)."""
    out = dict(params)
    for key, v in amax.items():
        out[key] = jnp.asarray(v, jnp.float32) * margin
    return out


def cnx_act_amax(params: dict, images: jnp.ndarray, cfg: CNXConfig,
                 compute_dtype=jnp.bfloat16) -> dict:
    """Calibration forward: per-block amax at the two quantized-activation
    sites (post-LN fc1 input, post-GELU fc2 input). Returns
    ``{"s{s}_act_amax": [depth, 2]}`` per stage. Quantized kernels are
    dequantized for this one forward (one batch; attach adds margin)."""
    x = images.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, params["stem_kernel"].astype(x.dtype), window_strides=(4, 4),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["stem_bias"].astype(x.dtype)
    x = _ln(x, params["stem_ln_scale"], params["stem_ln_bias"], cfg.ln_eps)
    amaxes: dict = {}
    for s in range(len(cfg.depths)):
        x, amaxes[f"s{s}_act_amax"] = _stage(x, params, s, cfg,
                                             capture_amax=True)
    return amaxes


def _deq(kernel, scale, dt):
    """int8 kernel + per-channel scale → dense dt kernel (calibration and
    not-yet-calibrated forwards on a quantized pytree)."""
    return (kernel.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dt)


def _ln(x, scale, bias, eps: float):
    """LayerNorm over the trailing channel axis, statistics in f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _stage(x, p, s: int, cfg: CNXConfig, capture_amax: bool = False):
    """One ConvNeXt stage: optional LN+2x2/2 downsample, then scanned blocks.

    Three block variants share the dw-conv+LN front half: the bf16 matmul
    path (float params, or quantized params before calibration — kernels
    dequantized), the int8_static path (quantized kernels + attached
    ``s{s}_act_amax``: both pointwise matmuls run int8 with the quantizes
    fused into producer epilogues), and the calibration capture
    (``capture_amax``: bf16 path that also returns each block's [2] site
    amaxes, stacked [depth, 2] by the scan)."""
    dt = x.dtype
    if s > 0:
        y = _ln(x, p[f"s{s}_down_ln_scale"], p[f"s{s}_down_ln_bias"],
                cfg.ln_eps)
        x = jax.lax.conv_general_dilated(
            y, p[f"s{s}_down_kernel"].astype(dt), window_strides=(2, 2),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[f"s{s}_down_bias"].astype(dt)
    c = cfg.dims[s]
    keys = ["dw_kernel", "dw_bias", "ln_scale", "ln_bias", "fc1_kernel",
            "fc1_bias", "fc2_kernel", "fc2_bias", "gamma"]
    quantized = f"s{s}_fc1_kernel_scale" in p
    static = (not capture_amax and quantized and f"s{s}_act_amax" in p)
    if quantized:
        keys += ["fc1_kernel_scale", "fc2_kernel_scale"]
    if static:
        keys.append("act_amax")
    stacked = {k: p[f"s{s}_{k}"] for k in keys}

    def front(x, bp):
        y = jax.lax.conv_general_dilated(
            x, bp["dw_kernel"].astype(dt), window_strides=(1, 1),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ) + bp["dw_bias"].astype(dt)
        return _ln(y, bp["ln_scale"], bp["ln_bias"], cfg.ln_eps)

    def block(x, bp):
        y = front(x, bp)
        if quantized:
            w1 = _deq(bp["fc1_kernel"], bp["fc1_kernel_scale"], dt)
            w2 = _deq(bp["fc2_kernel"], bp["fc2_kernel_scale"], dt)
        else:
            w1 = bp["fc1_kernel"].astype(dt)
            w2 = bp["fc2_kernel"].astype(dt)
        a0 = jnp.max(jnp.abs(y.astype(jnp.float32))) if capture_amax else None
        y = y @ w1 + bp["fc1_bias"].astype(dt)
        y = jax.nn.gelu(y, approximate=False)  # HF ACT2FN['gelu'] / timm GELU
        a1 = jnp.max(jnp.abs(y.astype(jnp.float32))) if capture_amax else None
        y = y @ w2 + bp["fc2_bias"].astype(dt)
        out = x + bp["gamma"].astype(dt) * y
        return out, (jnp.stack([a0, a1]) if capture_amax else None)

    def block_static(x, bp):
        from clip_assisted_data_labeling_tpu.ops.quant import quant_static
        from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

        inv127 = 1.0 / 127.0
        a = bp["act_amax"]  # [2] f32
        y = front(x, bp)
        b, hh, ww, _ = y.shape
        yq = quant_static(y, a[0]).reshape(b * hh * ww, c)
        h = q_matmul_pre(yq, a[0] * inv127, bp["fc1_kernel"],
                         bp["fc1_kernel_scale"], bp["fc1_bias"])
        g = jax.nn.gelu(h, approximate=False)
        y2 = q_matmul_pre(quant_static(g, a[1]), a[1] * inv127,
                          bp["fc2_kernel"], bp["fc2_kernel_scale"],
                          bp["fc2_bias"], out_dtype=dt).reshape(b, hh, ww, c)
        return x + bp["gamma"].astype(dt) * y2, None

    x, aux = jax.lax.scan(block_static if static else block, x, stacked)
    return (x, aux) if capture_amax else x


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "normalize"))
def cnx_encode_image(
    params: dict,
    images: jnp.ndarray,  # [B, R, R, 3] preprocessed (CLIP-normalized) NHWC
    cfg: CNXConfig,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
) -> jnp.ndarray:
    """Full ConvNeXt forward → [B, embed_dim], L2-normalized like the
    reference's encode_image (utils/embedder.py:98-99)."""
    x = images.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, params["stem_kernel"].astype(x.dtype), window_strides=(4, 4),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["stem_bias"].astype(x.dtype)
    x = _ln(x, params["stem_ln_scale"], params["stem_ln_bias"], cfg.ln_eps)
    for s in range(len(cfg.depths)):
        x = _stage(x, params, s, cfg)
    # global average pool (f32 accumulate) -> head LN -> projection
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    pooled = _ln(pooled, params["head_ln_scale"], params["head_ln_bias"],
                 cfg.head_ln_eps)
    pooled = pooled.astype(compute_dtype)
    if cfg.proj == "mlp":
        h = pooled @ params["proj_fc1_kernel"].astype(pooled.dtype) + (
            params["proj_fc1_bias"].astype(pooled.dtype))
        h = jax.nn.gelu(h, approximate=False)
        emb = h @ params["proj_fc2_kernel"].astype(pooled.dtype) + (
            params["proj_fc2_bias"].astype(pooled.dtype))
    else:
        emb = pooled @ params["proj_kernel"].astype(pooled.dtype) + (
            params["proj_bias"].astype(pooled.dtype))
    emb = emb.astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb
