"""Device img_stat features vs the host-exact cv2 reference implementation."""
import numpy as np
import pytest

from clip_assisted_data_labeling_tpu.ops.image_stats import (
    IMG_STAT_KEYS,
    image_stats_batch,
    image_stats_reference,
    make_stat_params,
)
from tests.test_crops import put_on_canvas

# The device path reproduces the reference's dynamic cv2-INTER_AREA grid
# (masked 1536x768 container, ops/image_stats.py) — every feature, including
# the sampling-density-dependent laplacian_variance, shares one uint8-rounding
# tolerance. Raw white noise is the hardest case (no low-pass washing-out).
TOLERANCES = {
    "img_stat_width": 1e-6,
    "img_stat_height": 1e-6,
    "img_stat_aspect_ratio": 1e-5,
    "img_stat_mean_hue": 3e-3,  # hue wraps; cv2 half-rounding lands unevenly
}
DEFAULT_TOL = 2e-3


@pytest.mark.parametrize(
    "w,h",
    [
        (100, 80),   # both axes upscale (zoom emulation path)
        (256, 96),   # mixed
        (64, 200),   # tall + zoom (orientation transpose)
        (900, 300),  # wide, both shrink (true area path)
        (300, 900),  # tall, both shrink
        (500, 500),  # square
    ],
)
def test_device_stats_match_reference(rng, w, h):
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)  # white noise
    golden = image_stats_reference(img)

    canvas_size = 1024
    canvas = put_on_canvas(img, canvas_size)[None]
    params = make_stat_params(w, h, canvas_size)[None]
    got = np.asarray(image_stats_batch(canvas, params))[0]

    assert got.shape == (22,)
    for key, value in zip(IMG_STAT_KEYS, got):
        tol = TOLERANCES.get(key, DEFAULT_TOL)
        assert abs(value - golden[key]) <= tol, (
            f"{key}: device {value:.5f} vs reference {golden[key]:.5f} (tol {tol})"
        )


def test_smooth_image_low_entropy(rng):
    flat = np.full((120, 160, 3), 77, np.uint8)
    canvas = put_on_canvas(flat, 256)[None]
    params = make_stat_params(160, 120, 256)[None]
    got = dict(zip(IMG_STAT_KEYS, np.asarray(image_stats_batch(canvas, params))[0]))
    assert got["img_stat_image_entropy"] < 0.05
    assert got["img_stat_laplacian_variance"] < 0.01
    assert abs(got["img_stat_mean_color"] - 77 / 255) < 1e-3
    assert got["img_stat_std_color"] < 1e-3
