"""Host-side image pipeline: parallel JPEG decode → centered canvas → device batches.

Replaces the reference's torch DataLoader + per-crop PIL work
(_1_embed_with_CLIP.py:81-90 with CustomImageDataset, utils/embedder.py:164-181).
All geometry/resampling moved to the device (ops/crops.py); the host only decodes,
optionally pre-downscales to fit the canvas, and stamps per-image scalar params.

Design notes:
  * cv2's decoder releases the GIL, so a thread pool scales; cv2 internal
    threading is pinned to 1 to avoid oversubscription.
  * Batches have static shapes (canvas [B, C, C, 3] uint8); the final partial
    batch is zero-padded with ``n_valid`` marking real rows — jit sees one shape.
  * Failed decodes are skipped and *reported* (``loader.skipped``), not silently
    replaced by a random other image like the reference (utils/embedder.py:176-181
    — SURVEY.md §5 calls this out as error-hiding).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from clip_assisted_data_labeling_tpu.config import ALL_CROPS, IMG_EXTENSIONS
from clip_assisted_data_labeling_tpu.ops.crops import make_crop_params
from clip_assisted_data_labeling_tpu.ops.image_stats import make_stat_params

log = logging.getLogger(__name__)


def find_images(root_dir: str, recursive: bool = True) -> list[str]:
    """Recursive image discovery (reference _1_embed_with_CLIP.py:53-58)."""
    paths = []
    if recursive:
        for root, _dirs, files in os.walk(root_dir):
            for name in files:
                if name.endswith(IMG_EXTENSIONS):
                    paths.append(os.path.join(root, name))
    else:
        for name in os.listdir(root_dir):
            if name.endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(root_dir, name))
    return paths


@dataclasses.dataclass
class Batch:
    canvas: np.ndarray  # [B, C, C, 3] uint8
    crop_params: np.ndarray  # [B, n_crops, 2, 4] float32
    stat_params: np.ndarray  # [B, 8] float32
    paths: list[str]  # length n_valid
    n_valid: int


def _decode_one(path: str, canvas_size: int):
    import cv2

    cv2.setNumThreads(1)
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:  # fall back to PIL for exotic formats
        try:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        except Exception:
            return None
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    if max(h, w) > canvas_size:
        scale = canvas_size / max(h, w)
        new_w, new_h = max(1, int(w * scale)), max(1, int(h * scale))
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_AREA)
        h, w = new_h, new_w
    return img, w, h


class BatchedImageLoader:
    """Iterates device-ready batches with background decode + prefetch."""

    def __init__(
        self,
        image_paths: list[str],
        canvas_size: int,
        out_size: int,
        batch_size: int,
        num_workers: int = 8,
        crop_names=ALL_CROPS,
        prefetch_batches: int = 4,
        use_native: bool = True,
        bucketed: bool = False,
        sort_by_size: bool = False,
    ):
        self.image_paths = list(image_paths)
        # even canvas so the native path's center slice into an (even-aligned)
        # bucket canvas lands exactly where make_crop_params expects the image
        self.canvas_size = canvas_size + (canvas_size % 2)
        self.out_size = out_size
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.crop_names = crop_names
        self.prefetch_batches = prefetch_batches
        self.use_native = use_native
        # canvas buckets: a batch of small images ships on a small canvas
        # (canvas bytes dominate host→device traffic); jit compiles once per
        # bucket. Buckets are quarters of the max canvas, 64-aligned.
        self.bucket_sizes = (
            sorted({
                max(64, (self.canvas_size * q // 4) // 64 * 64) for q in (1, 2, 3, 4)
            })
            if bucketed
            else [self.canvas_size]  # even-aligned, matching the decode target
        )
        self.skipped: list[str] = []
        if sort_by_size and len(self.image_paths) > 1:
            self.image_paths = self._sorted_by_size(self.image_paths, self.canvas_size)

    def __len__(self) -> int:
        return (len(self.image_paths) + self.batch_size - 1) // self.batch_size

    def _sorted_by_size(self, paths: list[str], canvas_size: int) -> list[str]:
        """Order files by post-downscale canvas footprint so each batch is
        size-homogeneous and lands in the smallest bucket that fits it (mixed
        batches pay for their single largest image). Header-only size probe —
        PIL lazy-opens without decoding pixel data; unreadable files sort last
        and get skipped by the decode stage as usual."""
        def probe(p: str) -> int:
            try:
                from PIL import Image

                with Image.open(p) as im:
                    w, h = im.size
                return min(max(w, h), canvas_size)
            except Exception:
                return canvas_size + 1

        with ThreadPoolExecutor(self.num_workers) as pool:
            sizes = list(pool.map(probe, paths))
        return [p for _s, p in sorted(zip(sizes, paths), key=lambda t: (t[0], t[1]))]

    def _decode_chunk(self, chunk: list[str], pool: ThreadPoolExecutor):
        """→ list of (path, source_array, w, h) where source_array is either a
        full max-canvas slot (native path) or the raw decoded image."""
        C = self.canvas_size
        native = None
        if self.use_native:
            from clip_assisted_data_labeling_tpu.data.native_loader import (
                decode_batch_native,
            )

            native = decode_batch_native(chunk, C, self.num_workers)

        decoded = []
        if native is not None:
            n_canvases, dims = native
            fallback_idx = [i for i in range(len(chunk)) if dims[i, 0] == 0]
            fallback = dict(
                zip(
                    fallback_idx,
                    pool.map(_decode_one, [chunk[i] for i in fallback_idx],
                             [C] * len(fallback_idx)),
                )
            )
            for i, path in enumerate(chunk):
                if dims[i, 0] > 0:
                    decoded.append((path, ("canvas", n_canvases[i]),
                                    int(dims[i, 0]), int(dims[i, 1])))
                elif fallback.get(i) is not None:
                    img, w, h = fallback[i]
                    decoded.append((path, ("img", img), w, h))
                else:
                    log.warning("Skipping unreadable image %s", path)
                    self.skipped.append(path)
        else:
            for path, dec in zip(chunk, pool.map(_decode_one, chunk, [C] * len(chunk))):
                if dec is None:
                    log.warning("Skipping unreadable image %s", path)
                    self.skipped.append(path)
                    continue
                img, w, h = dec
                decoded.append((path, ("img", img), w, h))
        return decoded

    def _make_batch(self, chunk: list[str], pool: ThreadPoolExecutor) -> Batch:
        bs, C = self.batch_size, self.canvas_size
        decoded = self._decode_chunk(chunk, pool)

        # smallest bucket that fits every image in the chunk
        chunk_max = max((max(w, h) for _p, _s, w, h in decoded), default=0)
        cb = next((b for b in self.bucket_sizes if b >= chunk_max), C)

        canvas = np.zeros((bs, cb, cb, 3), np.uint8)
        # Padding rows must carry *valid* geometry (all-zero params would produce
        # 0/0 NaNs in the resample weight normalization).
        crop_params = np.broadcast_to(
            make_crop_params(cb, cb, cb, self.out_size, self.crop_names),
            (bs, len(self.crop_names), 2, 4),
        ).copy().astype(np.float32)
        stat_params = np.broadcast_to(
            make_stat_params(cb, cb, cb), (bs, 8)
        ).copy().astype(np.float32)

        paths: list[str] = []
        fill = 0
        lo, hi = (C - cb) // 2, (C - cb) // 2 + cb
        for path, (kind, arr), w, h in decoded:
            if kind == "canvas":
                # image sits centered in the big canvas: the center slice is the
                # same image centered in the bucket canvas
                canvas[fill] = arr[lo:hi, lo:hi]
            else:
                oy, ox = (cb - h) // 2, (cb - w) // 2
                canvas[fill, oy : oy + h, ox : ox + w] = arr
            crop_params[fill] = make_crop_params(w, h, cb, self.out_size, self.crop_names)
            stat_params[fill] = make_stat_params(w, h, cb)
            paths.append(path)
            fill += 1
        return Batch(canvas, crop_params, stat_params, paths, fill)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned iteration,
            # so an aborted run can't leak the producer thread + its buffers
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        error: list[BaseException] = []

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for start in range(0, len(self.image_paths), self.batch_size):
                        if stop.is_set():
                            return
                        chunk = self.image_paths[start : start + self.batch_size]
                        batch = self._make_batch(chunk, pool)
                        if batch.n_valid and not _put(batch):
                            return
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                # a dead producer must NOT look like a completed dataset: the
                # sentinel alone would end iteration silently mid-run and a
                # 100k-image embed would write a partial store with no signal
                error.append(e)
            finally:
                _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise RuntimeError(
                            "image loader producer thread failed"
                        ) from error[0]
                    break
                yield item
        finally:
            stop.set()
            while not q.empty():  # unblock a producer waiting on a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=30)
