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

Known divergence (documented, tolerance-tested in tests/test_image_stats.py):
the reference resamples to a dynamic (transposed-aspect, ~768²-pixel) size with
cv2 INTER_AREA; a jitted kernel needs a static shape, so we area-resample the
valid image region to a fixed 768×768 grid instead. Scale-free statistics
(means/stds/entropy/colorfulness) match closely; the Laplacian variance is
sampling-density dependent and matches only approximately. An exact host
implementation (``image_stats_reference``) is provided for --exact_stats runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STAT_SIZE = 768  # fixed device resample grid; reference targets 768*768 pixels
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

    wx = _area_axis_weights(ox, w, canvas_size, STAT_SIZE)
    wy = _area_axis_weights(oy, h, canvas_size, STAT_SIZE)
    img = jnp.einsum("vy,yxc->vxc", wy, canvas_f32)
    img = jnp.einsum("ux,vxc->vuc", wx, img)
    img = jnp.clip(jnp.round(img), 0.0, 255.0)  # uint8 grid, as cv2 returns

    gray = _rgb_quirky_gray(img)
    hue, sat, val = _rgb_quirky_hsv(img)

    # colorfulness (reference image_features.py:7-28, with its channel-role quirk)
    cb, cg, cr = img[..., 0], img[..., 1], img[..., 2]
    rg = jnp.abs(cr - cg)
    yb = jnp.abs(0.5 * (cr + cg) - cb)
    std_root = jnp.sqrt(jnp.var(rg) + jnp.var(yb))
    mean_root = jnp.sqrt(jnp.mean(rg) ** 2 + jnp.mean(yb) ** 2)
    colorfulness = (std_root + 0.3 * mean_root) / 100.0

    # histogram entropy over the gray uint8 grid (image_features.py:30-40)
    one_hot = gray.astype(jnp.int32).reshape(-1)
    hist = jnp.zeros((256,), jnp.float32).at[one_hot].add(1.0)
    p = hist / jnp.sum(hist)
    entropy = -jnp.sum(p * jnp.log2(p + _EPS)) / 8.0

    # Laplacian variance (image_features.py:42-49): 3x3 [[0,1,0],[1,-4,1],[0,1,0]],
    # reflect-101 border, population variance, tanh(var * 1e-4)
    gp = jnp.pad(gray, 1, mode="reflect")
    lap = (
        gp[:-2, 1:-1] + gp[2:, 1:-1] + gp[1:-1, :-2] + gp[1:-1, 2:] - 4.0 * gray
    )
    lap_var = jnp.tanh(jnp.var(lap) * 1e-4)

    return jnp.stack(
        [
            new_w / 768.0,
            new_h / 768.0,
            new_w / new_h,
            jnp.mean(img) / 255.0,
            jnp.std(img) / 255.0,
            jnp.mean(img[..., 0]) / 255.0,
            jnp.mean(img[..., 1]) / 255.0,
            jnp.mean(img[..., 2]) / 255.0,
            jnp.std(img[..., 0]) / 255.0,
            jnp.std(img[..., 1]) / 255.0,
            jnp.std(img[..., 2]) / 255.0,
            jnp.mean(gray) / 255.0,
            jnp.std(gray) / 255.0,
            jnp.mean(hue) / 255.0,
            jnp.mean(sat) / 255.0,
            jnp.mean(val) / 255.0,
            jnp.std(hue) / 255.0,
            jnp.std(sat) / 255.0,
            jnp.std(val) / 255.0,
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
