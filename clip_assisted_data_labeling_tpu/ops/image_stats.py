"""The 22 handcrafted ``img_stat_*`` features as vectorized XLA ops.

The reference computes these per image on the host with cv2 (utils/
image_features.py:51-94): downscale to ~768² pixels, then channel means/stds,
gray/HSV statistics, colorfulness (Hasler–Süsstrunk), histogram entropy and a
tanh-squashed Laplacian variance. Here the whole batch runs as one jitted device
computation over the same centered canvas the crop pipeline uses.

Reference quirks deliberately replicated (they are baked into every existing
``.pt`` sidecar, so parity matters more than correctness):
  * image_features.py:58-60 transposes the aspect ratio when downscaling
    (``new_w = sqrt(max_n_pixels * H/W)``). The width/height/aspect features use
    exactly that (buggy) formula.
  * cv2.cvtColor is called with COLOR_BGR2GRAY / COLOR_BGR2HSV on an RGB array,
    so gray and HSV are computed with R and B swapped. We replicate by applying
    the literal BGR formulas to the RGB channel order.
  * colorfulness's cv2.split names channels (B,G,R) but receives RGB — the
    formulas below use the literal channel indices the reference ends up using.

Dynamic-grid exactness (round 2): the reference resamples each image to a
dynamic (transposed-aspect, ~768²-pixel) size with cv2 INTER_AREA before
computing stats; grid SIZE matters for the Laplacian variance (sampling
density). A jitted kernel needs static shapes, so the dynamic (new_h, new_w)
grid lives inside a fixed 1536×768 container (orientation-normalized so
rows ≥ cols — every stat is transpose-invariant) with masked reductions over
the valid region. The resample replicates both cv2 INTER_AREA regimes
(verified against cv2 itself): true box-overlap averaging when both axes
shrink, and cv2's documented 2-tap zoom emulation otherwise. Result: all 22
features, including laplacian_variance, match the reference's host cv2 path to
uint8-rounding tolerance for aspect ratios ≤ 4 (beyond that the grid is
density-clamped — rarer than the reference's own subset gates allow). The host
implementation (``image_stats_reference``) remains for --exact_stats runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STAT_SIZE = 768  # reference targets 768*768 total pixels (image_features.py:55)
# container for the dynamic resample grid, orientation-normalized (rows >= cols):
# cols = min(new_h, new_w) <= 768 always; rows <= 1536 covers aspect <= 4
GRID_ROWS, GRID_COLS = 1536, 768
_EPS = float(np.finfo(np.float64).eps)  # reference uses np.finfo(float).eps

IMG_STAT_KEYS = (
    "img_stat_width",
    "img_stat_height",
    "img_stat_aspect_ratio",
    "img_stat_mean_color",
    "img_stat_std_color",
    "img_stat_mean_red",
    "img_stat_mean_green",
    "img_stat_mean_blue",
    "img_stat_std_red",
    "img_stat_std_green",
    "img_stat_std_blue",
    "img_stat_mean_gray",
    "img_stat_std_gray",
    "img_stat_mean_hue",
    "img_stat_mean_sat",
    "img_stat_mean_val",
    "img_stat_std_hue",
    "img_stat_std_sat",
    "img_stat_std_val",
    "img_stat_colorfulness",
    "img_stat_image_entropy",
    "img_stat_laplacian_variance",
)


def make_stat_params(width: int, height: int, canvas_size: int) -> np.ndarray:
    """Host-side scalars for one image: float32 [8].

    (x_origin, y_origin, width, height, new_w, new_h, 0, 0) where new_w/new_h
    follow the reference's transposed-aspect downscale formula
    (image_features.py:58-59, with (w, h) actually being (H, W)).
    """
    ox = (canvas_size - width) // 2
    oy = (canvas_size - height) // 2
    max_n = STAT_SIZE * STAT_SIZE
    # reference: w,h = shape[:2] == (H, W); new_w = sqrt(max_n * w/h) etc.
    new_w = int(np.sqrt(max_n * height / width))
    new_h = int(np.sqrt(max_n * width / height))
    return np.array([ox, oy, width, height, new_w, new_h, 0, 0], dtype=np.float32)


def _area_axis_weights(lo, extent, canvas_size: int, out_size: int) -> jnp.ndarray:
    """[out, canvas] box-overlap (INTER_AREA-style) resample weights."""
    ss = extent / out_size
    u = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    j = jnp.arange(canvas_size, dtype=jnp.float32)[None, :]
    f_lo = lo + u * ss
    f_hi = lo + (u + 1.0) * ss
    w = jnp.clip(jnp.minimum(f_hi, j + 1.0) - jnp.maximum(f_lo, j), 0.0, None)
    return w / jnp.sum(w, axis=1, keepdims=True)


def _dyn_axis_weights(lo, extent, n_out, both_shrink, canvas_size: int,
                      container: int) -> jnp.ndarray:
    """[container, canvas] resample weights for a DYNAMIC output length n_out
    (rows ≥ n_out are zero), replicating cv2.resize INTER_AREA exactly:

      * both axes shrinking → true box-overlap area averaging,
      * otherwise → cv2's 2-tap zoom emulation: per output index dx,
        sx = floor(dx·scale), fx = (dx+1) − (sx+1)/scale⁻¹, folded to [0,1).

    lo/extent locate the image inside the canvas (integer origin); n_out and
    both_shrink are traced scalars.
    """
    u = jnp.arange(container, dtype=jnp.float32)[:, None]
    j = jnp.arange(canvas_size, dtype=jnp.float32)[None, :]
    valid = u < n_out

    # --- shrink regime: box overlap over [lo + u·ss, lo + (u+1)·ss) ----------
    ss = extent / n_out
    f_lo = lo + u * ss
    f_hi = lo + (u + 1.0) * ss
    w_area = jnp.clip(jnp.minimum(f_hi, j + 1.0) - jnp.maximum(f_lo, j), 0.0, None)
    w_area = w_area / jnp.maximum(jnp.sum(w_area, axis=1, keepdims=True), 1e-12)

    # --- zoom regime: cv2's INTER_AREA general-path 2-tap coefficients -------
    inv = n_out / extent
    sx = jnp.floor(u * ss)
    fx = (u + 1.0) - (sx + 1.0) * inv
    fx = jnp.where(fx <= 0.0, 0.0, fx - jnp.floor(fx))
    # clamp taps to the image region (cv2 clamps source indices at the edge)
    sx0 = lo + jnp.clip(sx, 0.0, extent - 1.0)
    sx1 = lo + jnp.clip(sx + 1.0, 0.0, extent - 1.0)
    w_zoom = (1.0 - fx) * (j == sx0) + fx * (j == sx1)

    return jnp.where(valid, jnp.where(both_shrink, w_area, w_zoom), 0.0)


def _rgb_quirky_gray(img: jnp.ndarray) -> jnp.ndarray:
    """cv2 BGR2GRAY applied to an RGB array (reference quirk): c0 is taken as B."""
    r, g, b = img[..., 2], img[..., 1], img[..., 0]
    return jnp.clip(jnp.round(0.299 * r + 0.587 * g + 0.114 * b), 0.0, 255.0)


def _rgb_quirky_hsv(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """cv2 BGR2HSV (8-bit) applied to an RGB array (reference quirk)."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]  # literal cv2 BGR roles
    v = jnp.maximum(jnp.maximum(b, g), r)
    m = jnp.minimum(jnp.minimum(b, g), r)
    d = v - m
    safe_d = jnp.where(d == 0.0, 1.0, d)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe_d,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_d, 240.0 + 60.0 * (r - g) / safe_d),
    )
    h = jnp.where(d == 0.0, 0.0, jnp.where(h < 0.0, h + 360.0, h))
    h8 = jnp.round(h / 2.0)
    safe_v = jnp.where(v == 0.0, 1.0, v)
    s8 = jnp.where(v == 0.0, 0.0, jnp.round(255.0 * d / safe_v))
    return h8, s8, v


def _stats_one(canvas_f32: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    canvas_size = canvas_f32.shape[0]
    ox, oy, w, h, new_w, new_h = (params[i] for i in range(6))

    # orientation-normalize so rows >= cols (all stats below are invariant to
    # transpose); the dynamic (rn, cn) grid lives in the fixed container with
    # everything past it masked out. Density-clamp rows at the container edge
    # (only reachable for aspect > 4).
    tall = new_h >= new_w
    rn = jnp.minimum(jnp.where(tall, new_h, new_w), float(GRID_ROWS))
    cn = jnp.where(tall, new_w, new_h)
    row_lo = jnp.where(tall, oy, ox)
    row_extent = jnp.where(tall, h, w)
    col_lo = jnp.where(tall, ox, oy)
    col_extent = jnp.where(tall, w, h)
    # cv2 uses true area averaging only when BOTH axes shrink, else its 2-tap
    # zoom emulation on both axes (verified against cv2 in tests)
    both_shrink = (new_w <= w) & (new_h <= h)

    wr = _dyn_axis_weights(row_lo, row_extent, rn, both_shrink, canvas_size, GRID_ROWS)
    wc = _dyn_axis_weights(col_lo, col_extent, cn, both_shrink, canvas_size, GRID_COLS)
    # orientation-normalize the (square) canvas so container axis 0 always
    # samples the longer output axis
    canvas_or = jnp.where(tall, canvas_f32, jnp.swapaxes(canvas_f32, 0, 1))
    img = jnp.einsum("vy,yxc->vxc", wr, canvas_or)
    img = jnp.einsum("ux,vxc->vuc", wc, img)
    img = jnp.clip(jnp.round(img), 0.0, 255.0)  # uint8 grid, as cv2 returns

    ri = jnp.arange(GRID_ROWS, dtype=jnp.float32)
    ci = jnp.arange(GRID_COLS, dtype=jnp.float32)
    mask = (ri[:, None] < rn) & (ci[None, :] < cn)
    count = rn * cn

    def mmean(x):
        return jnp.sum(jnp.where(mask, x, 0.0)) / count

    def mstd(x):
        mu = mmean(x)
        return jnp.sqrt(mmean(jnp.where(mask, (x - mu) ** 2, 0.0)))

    gray = _rgb_quirky_gray(img)
    hue, sat, val = _rgb_quirky_hsv(img)

    # colorfulness (reference image_features.py:7-28, with its channel-role quirk)
    cb, cg, cr = img[..., 0], img[..., 1], img[..., 2]
    rg = jnp.abs(cr - cg)
    yb = jnp.abs(0.5 * (cr + cg) - cb)
    std_root = jnp.sqrt(mstd(rg) ** 2 + mstd(yb) ** 2)
    mean_root = jnp.sqrt(mmean(rg) ** 2 + mmean(yb) ** 2)
    colorfulness = (std_root + 0.3 * mean_root) / 100.0

    # histogram entropy over the valid gray uint8 grid (image_features.py:30-40)
    hist = jnp.zeros((256,), jnp.float32).at[gray.astype(jnp.int32).reshape(-1)].add(
        mask.reshape(-1).astype(jnp.float32)
    )
    p = hist / count
    entropy = -jnp.sum(p * jnp.log2(p + _EPS)) / 8.0

    # Laplacian variance (image_features.py:42-49): 3x3 [[0,1,0],[1,-4,1],[0,1,0]],
    # reflect-101 border AT THE DYNAMIC GRID EDGE, population variance,
    # tanh(var * 1e-4). Neighbors via dynamic index gathers.
    r = jnp.arange(GRID_ROWS)
    c = jnp.arange(GRID_COLS)
    up = jnp.clip(jnp.where(r == 0, 1, r - 1), 0, GRID_ROWS - 1)
    down = jnp.clip(jnp.where(r == rn - 1, rn - 2, r + 1), 0, GRID_ROWS - 1)
    left = jnp.clip(jnp.where(c == 0, 1, c - 1), 0, GRID_COLS - 1)
    right = jnp.clip(jnp.where(c == cn - 1, cn - 2, c + 1), 0, GRID_COLS - 1)
    lap = (
        jnp.take(gray, up.astype(jnp.int32), axis=0)
        + jnp.take(gray, down.astype(jnp.int32), axis=0)
        + jnp.take(gray, left.astype(jnp.int32), axis=1)
        + jnp.take(gray, right.astype(jnp.int32), axis=1)
        - 4.0 * gray
    )
    lap_mu = mmean(lap)
    lap_var = jnp.tanh(mmean(jnp.where(mask, (lap - lap_mu) ** 2, 0.0)) * 1e-4)

    rgb_means = [mmean(img[..., k]) for k in range(3)]
    rgb_stds = [mstd(img[..., k]) for k in range(3)]
    all_mu = (rgb_means[0] + rgb_means[1] + rgb_means[2]) / 3.0
    # np.std over the full (H, W, 3) array: population std around the joint mean
    all_std = jnp.sqrt(
        sum(mmean(jnp.where(mask, (img[..., k] - all_mu) ** 2, 0.0)) for k in range(3))
        / 3.0
    )

    return jnp.stack(
        [
            new_w / 768.0,
            new_h / 768.0,
            new_w / new_h,
            all_mu / 255.0,
            all_std / 255.0,
            rgb_means[0] / 255.0,
            rgb_means[1] / 255.0,
            rgb_means[2] / 255.0,
            rgb_stds[0] / 255.0,
            rgb_stds[1] / 255.0,
            rgb_stds[2] / 255.0,
            mmean(gray) / 255.0,
            mstd(gray) / 255.0,
            mmean(hue) / 255.0,
            mmean(sat) / 255.0,
            mmean(val) / 255.0,
            mstd(hue) / 255.0,
            mstd(sat) / 255.0,
            mstd(val) / 255.0,
            colorfulness,
            entropy,
            lap_var,
        ]
    )


@jax.jit
def image_stats_batch(canvas_u8: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """[B, C, C, 3] uint8 canvases + [B, 8] params → [B, 22] feature vectors."""
    return jax.vmap(_stats_one)(canvas_u8.astype(jnp.float32), params)


def image_stats_reference(rgb_image: np.ndarray, max_n_pixels: int = 768 * 768) -> dict:
    """Host-exact replica of reference utils/image_features.py:51-94 (cv2 path).

    Used by --exact_stats runs and as the golden in tests. All quirks included.
    """
    import cv2

    h_dim, w_dim = rgb_image.shape[:2]
    new_w = int(np.sqrt(max_n_pixels * h_dim / w_dim))
    new_h = int(np.sqrt(max_n_pixels * w_dim / h_dim))
    img = cv2.resize(rgb_image, (new_w, new_h), interpolation=cv2.INTER_AREA)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)

    bf, gf, rf = cv2.split(img.astype("float"))
    rg = np.abs(rf - gf)
    yb = np.abs(0.5 * (rf + gf) - bf)
    colorfulness = (
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    ) / 100.0

    hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).astype(np.float64)
    hist /= hist.sum()
    entropy = float(-np.sum(hist * np.log2(hist + _EPS)) / 8.0)

    lap = cv2.Laplacian(gray, cv2.CV_64F)
    lap_var = float(np.tanh(np.var(lap) * 1e-4))

    vals = [
        img.shape[1] / 768,
        img.shape[0] / 768,
        img.shape[1] / img.shape[0],
        np.mean(img) / 255,
        np.std(img) / 255,
        np.mean(img[:, :, 0]) / 255,
        np.mean(img[:, :, 1]) / 255,
        np.mean(img[:, :, 2]) / 255,
        np.std(img[:, :, 0]) / 255,
        np.std(img[:, :, 1]) / 255,
        np.std(img[:, :, 2]) / 255,
        np.mean(gray) / 255,
        np.std(gray) / 255,
        np.mean(hsv[:, :, 0]) / 255,
        np.mean(hsv[:, :, 1]) / 255,
        np.mean(hsv[:, :, 2]) / 255,
        np.std(hsv[:, :, 0]) / 255,
        np.std(hsv[:, :, 1]) / 255,
        np.std(hsv[:, :, 2]) / 255,
        colorfulness,
        entropy,
        lap_var,
    ]
    return dict(zip(IMG_STAT_KEYS, [float(v) for v in vals]))
