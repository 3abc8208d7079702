"""Native C++ JPEG batch decoder vs the cv2/PIL fallback path."""
import numpy as np
import pytest
from PIL import Image

from clip_assisted_data_labeling_tpu.data.loader import BatchedImageLoader
from clip_assisted_data_labeling_tpu.data.native_loader import (
    decode_batch_native,
    get_lib,
)
from tests.test_loader import make_dataset

needs_native = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@needs_native
def test_native_decode_matches_pil(tmp_path, rng):
    paths = make_dataset(tmp_path, rng, n=5)
    out = decode_batch_native(paths, canvas_size=256, n_threads=4)
    assert out is not None
    canvases, dims = out
    assert canvases.shape == (5, 256, 256, 3)
    for i, p in enumerate(paths):
        ref = np.asarray(Image.open(p).convert("RGB"))
        h, w = ref.shape[:2]
        assert tuple(dims[i]) == (w, h)
        oy, ox = (256 - h) // 2, (256 - w) // 2
        placed = canvases[i, oy : oy + h, ox : ox + w]
        # same libjpeg underneath; allow 1-2 LSB for IDCT implementation diffs
        assert np.mean(np.abs(placed.astype(int) - ref.astype(int))) < 1.0
        assert canvases[i, :oy].sum() == 0  # padding untouched


@needs_native
def test_native_decode_downscales_with_dct_prescale(tmp_path, rng):
    big = rng.integers(0, 256, (1200, 1600, 3)).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(big).save(p, quality=95)
    canvases, dims = decode_batch_native([p], canvas_size=256, n_threads=1)
    w, h = dims[0]
    assert max(w, h) == 256
    assert abs(w / h - 1600 / 1200) < 0.02
    # compare against a straightforward PIL downscale of the same image
    ref = np.asarray(
        Image.open(p).convert("RGB").resize((int(w), int(h)), Image.BOX)
    ).astype(int)
    oy, ox = (256 - h) // 2, (256 - w) // 2
    placed = canvases[0, oy : oy + h, ox : ox + w].astype(int)
    assert np.mean(np.abs(placed - ref)) < 8  # different resample chains, loose


@needs_native
def test_native_reports_failures(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    _canvases, dims = decode_batch_native([bad], canvas_size=128, n_threads=1)
    assert tuple(dims[0]) == (0, 0)


def test_loader_native_and_python_paths_agree(tmp_path, rng):
    paths = make_dataset(tmp_path, rng, n=6)
    kw = dict(canvas_size=256, out_size=56, batch_size=4)
    native_batches = list(BatchedImageLoader(paths, use_native=True, **kw))
    python_batches = list(BatchedImageLoader(paths, use_native=False, **kw))
    assert [b.n_valid for b in native_batches] == [b.n_valid for b in python_batches]
    for nb, pb in zip(native_batches, python_batches):
        assert nb.paths == pb.paths
        np.testing.assert_allclose(nb.crop_params, pb.crop_params, atol=1e-5)
        diff = np.abs(nb.canvas.astype(int) - pb.canvas.astype(int))
        assert diff.mean() < 1.0
