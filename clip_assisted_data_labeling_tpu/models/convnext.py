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
the ViT's stacked blocks). Compute is bf16 with LayerNorm statistics in f32;
int8 modes downgrade to bf16 like the RN towers (XLA int8 convs are not a
win on v5e — models/encoders.py guard).

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


def _ln(x, scale, bias, eps: float):
    """LayerNorm over the trailing channel axis, statistics in f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _stage(x, p, s: int, cfg: CNXConfig):
    """One ConvNeXt stage: optional LN+2x2/2 downsample, then scanned blocks."""
    dt = x.dtype
    if s > 0:
        y = _ln(x, p[f"s{s}_down_ln_scale"], p[f"s{s}_down_ln_bias"],
                cfg.ln_eps)
        x = jax.lax.conv_general_dilated(
            y, p[f"s{s}_down_kernel"].astype(dt), window_strides=(2, 2),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[f"s{s}_down_bias"].astype(dt)
    c = cfg.dims[s]
    stacked = {k: p[f"s{s}_{k}"] for k in
               ("dw_kernel", "dw_bias", "ln_scale", "ln_bias", "fc1_kernel",
                "fc1_bias", "fc2_kernel", "fc2_bias", "gamma")}

    def block(x, bp):
        y = jax.lax.conv_general_dilated(
            x, bp["dw_kernel"].astype(dt), window_strides=(1, 1),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ) + bp["dw_bias"].astype(dt)
        y = _ln(y, bp["ln_scale"], bp["ln_bias"], cfg.ln_eps)
        y = y @ bp["fc1_kernel"].astype(dt) + bp["fc1_bias"].astype(dt)
        y = jax.nn.gelu(y, approximate=False)  # HF ACT2FN['gelu'] / timm GELU
        y = y @ bp["fc2_kernel"].astype(dt) + bp["fc2_bias"].astype(dt)
        return x + bp["gamma"].astype(dt) * y, None

    x, _ = jax.lax.scan(block, x, stacked)
    return x


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
