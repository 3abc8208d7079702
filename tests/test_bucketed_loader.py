"""Canvas-bucketed loading: small images ship on small canvases, same results."""
import numpy as np
from PIL import Image

from clip_assisted_data_labeling_tpu.data.loader import BatchedImageLoader
from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize


def _imgs(tmp_path, rng, sizes, prefix="i"):
    paths = []
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / f"{prefix}{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_bucket_selection(tmp_path, rng):
    small = _imgs(tmp_path, rng, [(100, 80), (90, 110)], prefix="s")
    big = _imgs(tmp_path, rng, [(900, 700), (800, 600)], prefix="b")
    loader = BatchedImageLoader(
        small + big, canvas_size=1024, out_size=56, batch_size=2, bucketed=True
    )
    batches = list(loader)
    assert batches[0].canvas.shape[1] == 256  # smallest bucket fits 110px images
    assert batches[1].canvas.shape[1] == 1024

    # fixed mode keeps the old contract
    fixed = list(BatchedImageLoader(small, canvas_size=1024, out_size=56, batch_size=2))
    assert fixed[0].canvas.shape[1] == 1024


def test_bucketed_preprocess_matches_fixed(tmp_path, rng):
    paths = _imgs(tmp_path, rng, [(100, 80), (150, 120)])
    out = {}
    for bucketed in (False, True):
        loader = BatchedImageLoader(
            paths, canvas_size=1024, out_size=56, batch_size=2,
            bucketed=bucketed, use_native=False,
        )
        (batch,) = list(loader)
        crops = np.asarray(
            fused_crop_resize_normalize(
                batch.canvas, batch.crop_params, out_size=56, parity=True
            )
        )[: batch.n_valid]
        out[bucketed] = crops
    # equal up to uint8 rounding tie-breaks (the resample weights are evaluated
    # at different float offsets on different canvases, flipping ~0.1% of
    # pixels by one LSB)
    diff = np.abs(out[True] - out[False])
    lsb = 1.0 / 255.0 / 0.26  # one uint8 step after CLIP normalization
    assert diff.max() <= 1.5 * lsb
    assert (diff > 0).mean() < 0.01


def test_bucketed_native_matches_python(tmp_path, rng):
    from clip_assisted_data_labeling_tpu.data.native_loader import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    paths = _imgs(tmp_path, rng, [(300, 200), (280, 260)])
    batches = {}
    for native in (False, True):
        loader = BatchedImageLoader(
            paths, canvas_size=1024, out_size=56, batch_size=2,
            bucketed=True, use_native=native,
        )
        (batches[native],) = list(loader)
    assert batches[True].canvas.shape == batches[False].canvas.shape
    np.testing.assert_allclose(
        batches[True].crop_params, batches[False].crop_params, atol=1e-5
    )
    diff = np.abs(
        batches[True].canvas.astype(int) - batches[False].canvas.astype(int)
    )
    assert diff.mean() < 1.0


def test_sort_by_size_reduces_canvas_bytes(tmp_path, rng):
    """Size-sorted batching (VERDICT item 10): interleaved small/large images
    produce mixed batches that all pay for the large canvas; sorting groups
    them so small batches ship small. Same images, fewer H2D bytes."""
    from PIL import Image

    from clip_assisted_data_labeling_tpu.data.loader import BatchedImageLoader

    paths = []
    for i in range(8):  # alternate tiny and large so every unsorted pair mixes
        size = (64, 48) if i % 2 == 0 else (700, 500)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (size[1], size[0], 3)).astype(np.uint8)).save(p)
        paths.append(str(p))

    def total_bytes(sort):
        loader = BatchedImageLoader(
            paths, canvas_size=1024, out_size=56, batch_size=2,
            bucketed=True, use_native=False, sort_by_size=sort,
        )
        seen = set()
        n = 0
        for batch in loader:
            n += batch.canvas.nbytes
            seen.update(batch.paths)
        assert len(seen) == 8  # nothing dropped by reordering
        return n

    unsorted, sorted_ = total_bytes(False), total_bytes(True)
    assert sorted_ < unsorted * 0.7, (sorted_, unsorted)
