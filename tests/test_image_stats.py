"""Device img_stat features vs the host-exact cv2 reference implementation."""
import numpy as np
import pytest

from clip_assisted_data_labeling_tpu.ops.image_stats import (
    IMG_STAT_KEYS,
    image_stats_batch,
    image_stats_reference,
    make_stat_params,
)
from tests.test_crops import make_test_image, put_on_canvas

# device resamples to a fixed 768x768 grid instead of the reference's dynamic
# transposed-aspect grid, so sampling-dependent stats carry a tolerance.
TOLERANCES = {
    "img_stat_width": 1e-6,
    "img_stat_height": 1e-6,
    "img_stat_aspect_ratio": 1e-5,
    "img_stat_colorfulness": 0.02,
    "img_stat_image_entropy": 0.03,
    "img_stat_laplacian_variance": 0.2,
}
DEFAULT_TOL = 0.015


def make_natural_image(rng, w, h):
    """Smooth-ish test image: resampling-grid differences between the device's
    fixed 768² grid and the reference's dynamic grid wash out for natural images
    but not for white noise, so the stats golden uses low-passed content."""
    import cv2

    img = make_test_image(rng, w, h)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


@pytest.mark.parametrize("w,h", [(100, 80), (256, 96), (64, 200)])
def test_device_stats_match_reference(rng, w, h):
    img = make_natural_image(rng, w, h)
    golden = image_stats_reference(img)

    canvas_size = 256
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
