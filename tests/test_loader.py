"""Host data loader: batching, padding, downscale, error skipping."""
import numpy as np
from PIL import Image

from clip_assisted_data_labeling_tpu.data import BatchedImageLoader, find_images


def make_dataset(tmp_path, rng, n=7):
    paths = []
    for i in range(n):
        w, h = int(rng.integers(40, 200)), int(rng.integers(40, 200))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / f"img_{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_loader_batches_and_padding(tmp_path, rng):
    paths = make_dataset(tmp_path, rng, n=7)
    loader = BatchedImageLoader(paths, canvas_size=256, out_size=56, batch_size=3)
    batches = list(loader)
    assert len(batches) == 3
    assert [b.n_valid for b in batches] == [3, 3, 1]
    assert batches[0].canvas.shape == (3, 256, 256, 3)
    assert batches[0].crop_params.shape == (3, 4, 2, 4)
    # padded rows must carry finite, valid params (no NaN traps downstream)
    assert np.isfinite(batches[2].crop_params).all()
    assert batches[2].canvas[1:].sum() == 0  # padding rows are blank
    got = [p for b in batches for p in b.paths]
    assert got == paths


def test_loader_downscales_oversized(tmp_path, rng):
    img = rng.integers(0, 256, (100, 600, 3)).astype(np.uint8)
    p = str(tmp_path / "wide.jpg")
    Image.fromarray(img).save(p)
    loader = BatchedImageLoader([p], canvas_size=256, out_size=56, batch_size=1)
    (batch,) = list(loader)
    assert batch.n_valid == 1
    # image must fit: nonzero pixels confined to canvas
    assert batch.canvas.max() > 0


def test_loader_skips_corrupt(tmp_path, rng):
    paths = make_dataset(tmp_path, rng, n=2)
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    loader = BatchedImageLoader(
        paths + [bad], canvas_size=256, out_size=56, batch_size=4
    )
    (batch,) = list(loader)
    assert batch.n_valid == 2
    assert loader.skipped == [bad]


def test_find_images(tmp_path, rng):
    make_dataset(tmp_path, rng, n=3)
    sub = tmp_path / "sub"
    sub.mkdir()
    make_dataset(sub, rng, n=2)
    (tmp_path / "notes.txt").write_text("x")
    assert len(find_images(str(tmp_path))) == 5
    assert len(find_images(str(tmp_path), recursive=False)) == 3
