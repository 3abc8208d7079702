"""Fused 4-crop extraction + resize + CLIP normalization, TPU-native.

The reference (utils/embedder.py:164-251) extracts 4 PIL crops per image on the host
(centre square, black-padded square, two area-fraction subcrops), then runs each
through torchvision ``Resize(shorter→R, bicubic) + CenterCrop(R) + ToTensor +
Normalize``. That is 4 sequential PIL resamples per image on CPU — the reference's
known preprocessing bottleneck (SURVEY.md §3.1).

Here the whole preprocess is ONE jitted device computation. The key idea: separable
resampling *is* a pair of matmuls. For each crop we build (inside jit, from a handful
of scalars) a row-weight matrix ``Wy[R, C]`` and a column-weight matrix ``Wx[R, C]``
over the fixed-size input canvas, encoding crop window, PIL-bicubic kernel,
antialias scaling, and edge clipping all at once. The resample is then::

    out = Wy @ (clip8(img @ Wx^T))        # two MXU matmuls + rounding

which XLA tiles straight onto the MXU — no gathers, no dynamic shapes, no host work
beyond computing ~16 floats of crop geometry per image.

Parity notes (semantics replicated from the reference, validated in
tests/test_crops.py against a from-spec PIL implementation):
  * crop geometry: centre/padded/subcrop boxes per utils/embedder.py:196-247,
    including int-floor subcrop sizing and boundary clamping (non-square subcrops
    near image edges).
  * torchvision Resize(int): shorter edge → R, longer edge int-truncated.
  * torchvision CenterCrop: round-half-even offsets.
  * PIL bicubic: Catmull-Rom kernel (a=-0.5), support 2, antialias kernel-stretch
    when downscaling, per-output-pixel weight normalization over the clipped window,
    horizontal-then-vertical pass order with uint8 rounding between passes.
  * square_padded_crop samples real black pixels (the image sits centered on a
    zero canvas), so padding participates in the kernel normalization exactly as
    PIL's paste-on-black does.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.config import (
    ALL_CROPS,
    CLIP_MEAN,
    CLIP_STD,
    CROP_CENTRE,
    CROP_SQUARE_PADDED,
    CROP_SUB1,
    CROP_SUB2,
    SUBCROP_AREA_FRACTIONS,
)

# Per-axis resample parameters packed as float32: (offset, scale, lo, hi).
# center_of(output u) = offset + u * scale, valid source window = [lo, hi).
N_AXIS_PARAMS = 4


def _round_half_even(x: float) -> int:
    # Python round() semantics (used by torchvision CenterCrop offsets).
    return int(round(x))


def crop_boxes(width: int, height: int) -> dict[str, tuple[float, float, float, float]]:
    """Crop windows in image coordinates as (left, top, right, bottom).

    Replicates reference utils/embedder.py:196-247. The square_padded_crop window
    extends beyond the image (negative left/top) — those positions are black.
    """
    boxes: dict[str, tuple[float, float, float, float]] = {}

    m = min(width, height)
    left = _round_half_even((width - m) / 2.0)
    top = _round_half_even((height - m) / 2.0)
    boxes[CROP_CENTRE] = (left, top, left + m, top + m)

    s = max(width, height)
    start_w = (s - width) // 2
    start_h = (s - height) // 2
    boxes[CROP_SQUARE_PADDED] = (-start_w, -start_h, s - start_w, s - start_h)

    sizes = [int(math.sqrt(width * height * f)) for f in SUBCROP_AREA_FRACTIONS]
    if width >= height:  # wide / square image
        centers = [(width // 4, height // 2), (width // 4 * 3, height // 2)]
    else:  # tall image
        centers = [(width // 2, height // 4), (width // 2, height // 4 * 3)]
    for name, size, (cx, cy) in zip((CROP_SUB1, CROP_SUB2), sizes, centers):
        l = max(0, cx - size // 2)
        t = max(0, cy - size // 2)
        r = min(width, l + size)
        b = min(height, t + size)
        # tiny images can yield 0-area subcrops (int(sqrt(area·frac)) == 0); the
        # reference silently drops the crop, breaking its fixed-4-crop batch
        # stacking. We clamp to ≥1 px instead so every image embeds uniformly.
        if r <= l:
            l = min(l, width - 1)
            r = l + 1
        if b <= t:
            t = min(t, height - 1)
            b = t + 1
        boxes[name] = (l, t, r, b)
    return boxes


def _resize_axis_params(crop_w: float, crop_h: float, out_size: int):
    """Per-axis (new_size, center_crop_offset, scale) for Resize(short→R)+CenterCrop(R)."""
    if crop_w <= crop_h:  # width is the shorter edge
        new_w = out_size
        new_h = int(out_size * crop_h / crop_w)
    else:
        new_h = out_size
        new_w = int(out_size * crop_w / crop_h)
    cc_x = _round_half_even((new_w - out_size) / 2.0)
    cc_y = _round_half_even((new_h - out_size) / 2.0)
    return (new_w, cc_x, crop_w / new_w), (new_h, cc_y, crop_h / new_h)


def make_crop_params(
    width: int,
    height: int,
    canvas_size: int,
    out_size: int,
    crop_names: Sequence[str] = ALL_CROPS,
) -> np.ndarray:
    """Host-side geometry for one image: float32 [n_crops, 2(axis: x,y), 4].

    The image is assumed centered on a ``canvas_size``² zero canvas (see
    data.loader). Requires max(width, height) <= canvas_size.
    """
    if max(width, height) > canvas_size:
        raise ValueError(
            f"image {width}x{height} exceeds canvas {canvas_size}; "
            "the loader must pre-downscale"
        )
    ox = (canvas_size - width) // 2
    oy = (canvas_size - height) // 2
    boxes = crop_boxes(width, height)
    params = np.zeros((len(crop_names), 2, N_AXIS_PARAMS), dtype=np.float32)
    for i, name in enumerate(crop_names):
        l, t, r, b = boxes[name]
        # canvas coordinates
        lo_x, hi_x = l + ox, r + ox
        lo_y, hi_y = t + oy, b + oy
        (new_w, cc_x, ss_x), (new_h, cc_y, ss_y) = _resize_axis_params(
            r - l, b - t, out_size
        )
        del new_w, new_h
        off_x = lo_x + (cc_x + 0.5) * ss_x
        off_y = lo_y + (cc_y + 0.5) * ss_y
        params[i, 0] = (off_x, ss_x, lo_x, hi_x)
        params[i, 1] = (off_y, ss_y, lo_y, hi_y)
    return params


def _cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """PIL BICUBIC kernel: Catmull-Rom cubic, a = -0.5, support 2."""
    ax = jnp.abs(x)
    inner = (1.5 * ax - 2.5) * ax * ax + 1.0
    outer = ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def _axis_weights(axis_params: jnp.ndarray, canvas_size: int, out_size: int) -> jnp.ndarray:
    """Build the [out_size, canvas_size] resample weight matrix for one axis.

    axis_params: float32 [4] = (offset, scale, lo, hi).
    """
    off, ss, lo, hi = axis_params[0], axis_params[1], axis_params[2], axis_params[3]
    fs = jnp.maximum(ss, 1.0)  # antialias kernel stretch when downscaling
    u = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    j = jnp.arange(canvas_size, dtype=jnp.float32)[None, :]
    center = off + u * ss
    w = _cubic_kernel((j + 0.5 - center) / fs)
    w = jnp.where((j >= lo) & (j < hi), w, 0.0)
    return w / jnp.sum(w, axis=1, keepdims=True)


def _clip8(x: jnp.ndarray) -> jnp.ndarray:
    # PIL rounds each resample pass back to the uint8 grid (round half away from
    # zero on non-negative values == floor(x + 0.5)).
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _resample_one_crop(
    img_f32: jnp.ndarray,  # [C, C, 3] float32 0..255
    params: jnp.ndarray,  # [2, 4]
    out_size: int,
    parity: bool,
    patch_size: int | None = None,
) -> jnp.ndarray:
    canvas_size = img_f32.shape[0]
    wx = _axis_weights(params[0], canvas_size, out_size)  # [R, Cx]
    wy = _axis_weights(params[1], canvas_size, out_size)  # [R, Cy]
    prec = jax.lax.Precision.HIGHEST if parity else jax.lax.Precision.DEFAULT
    if not parity:
        # fast path: bf16 resample weights (MXU-native; f32 matmuls run at
        # half rate). The canvas itself arrives bf16 from the caller — each
        # crop re-reads the whole canvas, so its dtype sets the preprocess's
        # HBM bill. Accumulation stays f32 via preferred_element_type.
        wx = wx.astype(jnp.bfloat16)
        wy = wy.astype(jnp.bfloat16)
    # Horizontal pass first (PIL order), then vertical; uint8 rounding between
    # passes when parity mode is on.
    def ein(spec, a, b):
        out = jnp.einsum(spec, a, b, precision=prec,
                         preferred_element_type=jnp.float32)
        return out if parity else out.astype(jnp.bfloat16)

    if patch_size is None:
        t = ein("ux,yxc->yuc", wx, img_f32)
        if parity:
            t = _clip8(t)
        out = ein("vy,yuc->vuc", wy, t)
        if parity:
            out = _clip8(out)
        return out  # [R, R, 3]
    # Patch-layout output: splitting each resample weight matrix's output axis
    # into (grid, within-patch) makes the einsums emit the ViT patch order
    # [gh, gw, pv, pu, c] directly — identical arithmetic, and the downstream
    # patchify transpose (a 154 MB HBM copy chain per ViT-L batch on the
    # round-3 profile) vanishes into the resample contraction's output layout.
    # Towers whose resolution is not patch-divisible (SigLIP SO400M-14 @384:
    # 384 = 27·14 + 6) follow the HF Siglip Conv2d(padding="valid") stride
    # semantics: the trailing out_size % p pixels are never read. Dropping
    # those resample-weight rows up front is arithmetically identical (each
    # output pixel is an independent weighted sum) and keeps the grid reshape
    # exact.
    g = out_size // patch_size
    used = g * patch_size
    wxr = wx[:used].reshape(g, patch_size, canvas_size)
    wyr = wy[:used].reshape(g, patch_size, canvas_size)
    t = ein("gpx,yxc->ygpc", wxr, img_f32)
    if parity:
        t = _clip8(t)
    out = ein("hqy,ygpc->hgqpc", wyr, t)
    if parity:
        out = _clip8(out)
    return out  # [gh, gw, pv, pu, 3]


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "parity", "dtype", "patch_size",
                     "patch_flatten"),
)
def fused_crop_resize_normalize(
    canvas_u8: jnp.ndarray,  # [B, C, C, 3] uint8, image centered, zeros elsewhere
    params: jnp.ndarray,  # [B, n_crops, 2, 4] float32
    out_size: int,
    parity: bool = True,
    dtype: jnp.dtype = jnp.float32,
    patch_size: int | None = None,
    patch_flatten: bool = True,
    mean: tuple = CLIP_MEAN,  # per-model constants (SigLIP: 0.5/0.5)
    std: tuple = CLIP_STD,
) -> jnp.ndarray:
    """All crops of all images → normalized [B, n_crops, R, R, 3] in one jit.

    With ``patch_size`` the output is emitted pre-patchified as
    [B, n_crops, (R/p)², p·p·3] in exactly ``models.vit.patchify`` order —
    same numbers, no separate patchify transpose pass on the device.
    ``patch_flatten=False`` keeps the grid unflattened,
    [B, n_crops, gh, gw, p, p, 3], so the patch-embed einsum can contract the
    patch dims in place (models.vit._patch_embed) with no reshape copy.
    """
    # uint8 pixels are exact in bf16 (8-bit mantissa covers 0..255); the fast
    # path materializes the canvas at 2 B/px instead of 4 — every crop re-reads
    # it, so this halves the preprocess's dominant HBM traffic
    img = canvas_u8.astype(jnp.float32 if parity else jnp.bfloat16)
    per_crop = jax.vmap(_resample_one_crop, in_axes=(None, 0, None, None, None))
    per_image = jax.vmap(per_crop, in_axes=(0, 0, None, None, None))
    out = per_image(img, params, out_size, parity, patch_size)  # 0..255
    mean = jnp.asarray(mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(std, dtype=jnp.float32) * 255.0
    out = ((out - mean) / std).astype(dtype)
    if patch_size is not None and patch_flatten:
        b, n, gh, gw, pv, pu, c = out.shape
        out = out.reshape(b, n, gh * gw, pv * pu * c)
    return out
