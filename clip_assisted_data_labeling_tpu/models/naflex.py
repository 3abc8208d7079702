"""SigLIP2 naflex (native-aspect, variable-resolution) support, TPU-native.

The reference reaches naflex checkpoints through the same generic encoder
dispatch as every other name (utils/embedder.py:58-63); HF semantics
(transformers Siglip2VisionModel, the canonical implementation) are:
pre-patchified pixel values ``[B, N_max, p²·3]`` + a per-patch attention mask
+ per-image spatial shapes; a learned 16×16 positional grid is bilinearly
resized (antialiased, ``F.interpolate(..., antialias=True)``) to each image's
(gh, gw) patch grid; the encoder and the MAP pooling head attend only over
real patches.

TPU mapping — no dynamic shapes or per-image control flow inside jit:

  * per-image positional interpolation becomes a host-precomputed
    ``[N_max, 256]`` resize-weight matrix (purely geometry-dependent, cached
    per (gh, gw)) applied as ONE batched einsum against the 256-row pos table,
  * padding becomes an additive key-mask on the XLA attention path (a padded
    batch mixes ragged lengths per image, which the fixed-s_real Pallas
    kernels cannot express; at S=256 the masked XLA path is cheap),
  * the labeling pipeline's 4 square crops always fill the full 16×16 grid
    (zero padding, pos interpolation = identity), so pipeline embedding runs
    the standard fused-kernel ``vit_encode_image`` path unchanged — naflex
    towers pay the masked path only for genuinely variable-aspect inputs
    (``CLIPImageEncoder.encode_variable``).

Parity against a locally-instantiated ``transformers`` Siglip2VisionModel is
validated in tests/test_naflex_parity.py at multiple aspect ratios.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    _act,
    _layernorm,
)


def target_grid(height: int, width: int, patch: int,
                max_patches: int) -> tuple[int, int]:
    """Aspect-preserving (grid_h, grid_w) with grid_h·grid_w ≤ max_patches.

    Mirrors HF's ``get_image_size_for_max_num_patches`` binary search exactly
    (each side scaled then ceil-rounded UP to a patch multiple, min one
    patch), bit-equal over the sweep in tests/test_naflex_parity.py."""
    def scaled(scale: float, size: int) -> int:
        return max(1, math.ceil(size * scale / patch))

    eps = 1e-5
    lo, hi = eps / 10, 100.0
    while hi - lo >= eps:
        mid = (lo + hi) / 2
        if scaled(mid, height) * scaled(mid, width) <= max_patches:
            lo = mid
        else:
            hi = mid
    return scaled(lo, height), scaled(lo, width)


def _resize_weights_1d(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear resize weights, torch ``F.interpolate(mode=
    'bilinear', align_corners=False, antialias=True)`` semantics: triangle
    kernel, support scaled by the downscale ratio, per-row normalization over
    in-range taps (which also reproduces edge-clamping on upsample)."""
    scale = in_size / out_size
    support = max(scale, 1.0)
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    x = (np.arange(in_size, dtype=np.float64)[None, :] - centers[:, None]) / support
    w = np.clip(1.0 - np.abs(x), 0.0, None)
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


@functools.lru_cache(maxsize=256)
def pos_resize_weights(grid_h: int, grid_w: int, grid: int = 16) -> np.ndarray:
    """[grid_h·grid_w, grid²] weights: pos_interp = W @ pos_table.

    The separable 2-D bilinear resize of the learned (grid, grid, D) table to
    (grid_h, grid_w, D) expressed as one matrix — row (r·grid_w + c) holds
    the outer product of the vertical and horizontal 1-D weights."""
    wy = _resize_weights_1d(grid, grid_h)  # [gh, grid]
    wx = _resize_weights_1d(grid, grid_w)  # [gw, grid]
    w2d = np.einsum("ri,cj->rcij", wy, wx)
    return w2d.reshape(grid_h * grid_w, grid * grid)


def build_pos_weights(shapes, max_patches: int, grid: int = 16) -> np.ndarray:
    """Per-image spatial shapes [(gh, gw), …] → [B, max_patches, grid²];
    padded rows are zero (their tokens are masked out of every attention)."""
    out = np.zeros((len(shapes), max_patches, grid * grid), dtype=np.float32)
    for i, (gh, gw) in enumerate(shapes):
        out[i, : gh * gw] = pos_resize_weights(gh, gw, grid)
    return out


def preprocess_variable(img_u8: np.ndarray, cfg: VitConfig,
                        max_patches: int = 256):
    """One [H, W, 3] uint8 image → (patches [max_patches, p²·3] f32,
    mask [max_patches] f32, (grid_h, grid_w)).

    Host-side aspect-preserving resize (PIL bilinear, matching HF's
    Siglip2ImageProcessor default) + normalize + row-major patchify + pad."""
    from PIL import Image

    p = cfg.patch_size
    gh, gw = target_grid(img_u8.shape[0], img_u8.shape[1], p, max_patches)
    im = Image.fromarray(img_u8).resize((gw * p, gh * p), Image.BILINEAR)
    x = np.asarray(im, dtype=np.float32) / 255.0
    x = (x - np.asarray(cfg.norm_mean)) / np.asarray(cfg.norm_std)
    x = x.reshape(gh, p, gw, p, 3).transpose(0, 2, 1, 3, 4)
    patches = x.reshape(gh * gw, p * p * 3).astype(np.float32)
    n = gh * gw
    out = np.zeros((max_patches, p * p * 3), dtype=np.float32)
    out[:n] = patches
    mask = np.zeros((max_patches,), dtype=np.float32)
    mask[:n] = 1.0
    return out, mask, (gh, gw)


def _masked_attention(qkv, key_bias, heads: int, scale: float):
    """XLA attention over packed qkv with an additive key bias [B, 1, 1, S]."""
    B, S, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores + key_bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(B, S, w)


def _masked_block(x, p, key_bias, cfg: VitConfig):
    """Pre-LN transformer block, mask-aware XLA attention (bf16/f32 only —
    the int8 paths' fixed-s_real kernels can't express ragged batches)."""
    dt = x.dtype
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    qkv = y @ p["qkv_kernel"].astype(dt) + p["qkv_bias"].astype(dt)
    attn = _masked_attention(qkv, key_bias, cfg.heads, cfg.head_dim ** -0.5)
    x = x + (attn @ p["out_kernel"].astype(dt) + p["out_bias"].astype(dt))
    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    y = _act(y @ p["fc1_kernel"].astype(dt) + p["fc1_bias"].astype(dt), cfg.act)
    return x + (y @ p["fc2_kernel"].astype(dt) + p["fc2_bias"].astype(dt))


def _masked_map_pool(x, p, key_bias, heads: int, eps: float, act: str):
    """SigLIP MAP head with the probe attending only over real patches
    (HF Siglip2MultiheadAttentionPoolingHead with attention_mask)."""
    B, S, w = x.shape
    d = w // heads
    dt = x.dtype
    wq, wk, wv = jnp.split(p["pool_in_kernel"].astype(dt), 3, axis=1)
    bq, bk, bv = jnp.split(p["pool_in_bias"].astype(dt), 3)
    q = (p["pool_probe"].astype(dt) @ wq + bq).reshape(heads, 1, d)
    k = (x @ wk + bk).reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    v = (x @ wv + bv).reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("hqd,bhsd->bhqs", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(scores + key_bias, axis=-1).astype(dt)
    pooled = jnp.einsum("bhqs,bhsd->bhqd", probs, v).transpose(0, 2, 1, 3)
    h = pooled.reshape(B, w) @ p["pool_out_kernel"].astype(dt) + p["pool_out_bias"].astype(dt)
    y = _layernorm(h, p["pool_ln_scale"], p["pool_ln_bias"], eps)
    y = _act(y @ p["pool_fc1_kernel"].astype(dt) + p["pool_fc1_bias"].astype(dt), act)
    y = y @ p["pool_fc2_kernel"].astype(dt) + p["pool_fc2_bias"].astype(dt)
    return h + y


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "normalize"))
def naflex_encode(
    params: dict,
    patches: jnp.ndarray,    # [B, N_max, p²·3] pre-patchified, normalized
    pos_weights: jnp.ndarray,  # [B, N_max, grid²] host resize weights
    mask: jnp.ndarray,       # [B, N_max] 1.0 = real patch
    cfg: VitConfig,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
) -> jnp.ndarray:
    """Variable-aspect SigLIP2 forward → [B, width] L2-normalized embeddings."""
    dt = compute_dtype
    x = patches.astype(dt) @ params["patch_kernel"].astype(dt)
    if "patch_bias" in params:
        x = x + params["patch_bias"].astype(dt)
    # per-image interpolated positional embeddings, one batched matmul
    pos = jnp.einsum("bnm,mw->bnw", pos_weights.astype(jnp.float32),
                     params["pos_emb"].astype(jnp.float32))
    x = x + pos.astype(dt)
    key_bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e30

    def body(carry, block_params):
        return _masked_block(carry, block_params, key_bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _layernorm(x, params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps)
    emb = _masked_map_pool(x, params, key_bias, cfg.attn_pooler_heads,
                           cfg.ln_eps, cfg.act).astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb
