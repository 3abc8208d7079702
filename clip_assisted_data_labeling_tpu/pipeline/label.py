"""Stage 3 — the human labeling loop.

Rework of _3_label_images.py with the same interaction contract: numkeys 0-9 map
to labels 0.0-0.9, left/right navigate, q/ESC quits; existing label or predicted
label + prompt sidecar text are overlaid; a progress bar tracks position; the CSV
autosaves every 5 new labels and on exit; a timestamped single-slot DB backup is
taken at session start; labeled rows get their label copied into predicted_label
(fix_database) so sort orders behave.

The display is behind ui.LabelBackend: ``--backend opencv`` (default) for the
real window, ``--backend headless --keys 3,7,q`` for scripted/CI runs.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np

from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend, LabelBackend, OpenCVBackend
from clip_assisted_data_labeling_tpu.ui.sorting import (
    SORT_OPTIONS,
    prompt_sort_option,
    re_order_images,
)
from clip_assisted_data_labeling_tpu.utils.naming import natural_sort

CANVAS = (1706, 960)  # reference letterbox size (_3:96)


def letterbox(image: np.ndarray, size=CANVAS) -> np.ndarray:
    """Fit-to-canvas letterbox (reference _3:96-109)."""
    import cv2

    h, w = image.shape[:2]
    ratio = min(size[0] / w, size[1] / h)
    resized = cv2.resize(image, (int(w * ratio), int(h * ratio)))
    canvas = np.zeros((size[1], size[0], 3), np.uint8)
    rh, rw = resized.shape[:2]
    y0 = (size[1] - rh) // 2
    x0 = (size[0] - rw) // 2
    canvas[y0 : y0 + rh, x0 : x0 + rw] = resized
    return canvas


def load_image_and_prompt(uuid: str, root_dir: str):
    """Image + prompt text from .txt/.json sidecars (reference _3:246-266)."""
    import cv2

    image = cv2.imread(os.path.join(root_dir, uuid + ".jpg"))
    prompt = ""
    txt = os.path.join(root_dir, uuid + ".txt")
    if os.path.exists(txt):
        with open(txt) as f:
            for line in f:
                prompt = line
    jpath = os.path.join(root_dir, uuid + ".json")
    if os.path.exists(jpath):
        try:
            with open(jpath) as f:
                prompt = json.load(f).get("text_input", "")
        except Exception:
            prompt = ""
    return image, prompt


class ThumbnailCache:
    """LRU of letterboxed view frames keyed by uuid.

    The reference re-reads and re-resizes every image from disk on every view
    (_3_label_images.py:246-266) — a back-and-forth navigation pays full
    decode+resize each arrow key. Caching the LETTERBOXED canvas (fixed size,
    so memory is bounded at capacity·canvas bytes ≈ 2-3 MB each) makes repeat
    views disk-free; unloadable images cache as None so broken files are not
    re-probed every pass. ``show`` paths must draw on a COPY (the annotate
    overlay mutates its frame)."""

    def __init__(self, capacity: int = 64, loader=None):
        import collections

        self.capacity = capacity
        self._loader = loader
        self._store: "collections.OrderedDict" = collections.OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, uuid: str, root_dir: str):
        """(letterboxed uint8 frame | None, prompt) — cached after first load."""
        if uuid in self._store:
            self._store.move_to_end(uuid)
            self.hits += 1
            return self._store[uuid]
        self.misses += 1
        loader = self._loader or load_image_and_prompt
        image, prompt = loader(uuid, root_dir)
        entry = (letterbox(image) if image is not None else None, prompt)
        self._store[uuid] = entry
        while len(self._store) > self.capacity:
            self._store.popitem(last=False)
        return entry


def _annotate(image, label, predicted_label, prompt, progress):
    import cv2

    if label is not None and not (isinstance(label, float) and np.isnan(label)):
        cv2.putText(image, f"{label:.2f} || {prompt}", (10, 60),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (200, 100, 25), 2)
    elif predicted_label is not None and not (
        isinstance(predicted_label, float) and np.isnan(predicted_label)
    ):
        cv2.putText(image, f"predicted: {predicted_label:.3f} || {prompt}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (200, 100, 25), 2)
    else:
        cv2.putText(image, f"{prompt}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (200, 100, 25), 2)
    # progress bar (reference _3:222-233)
    rows, cols = image.shape[:2]
    bar_w = int(cols * 0.8)
    x0 = int(cols * 0.1)
    y0 = rows - 10
    cv2.rectangle(image, (x0, y0), (x0 + bar_w, rows), (255, 255, 255), -1)
    cv2.rectangle(image, (x0, y0), (x0 + int(progress * bar_w), rows), (0, 255, 0), -1)
    return image


def _is_labeled(label) -> bool:
    if label is None or label == "":
        return False
    try:
        return not np.isnan(float(label))
    except (TypeError, ValueError):
        return False


def label_dataset(
    root_dir: str,
    backend: LabelBackend,
    sort: str = "uuid",
    skip_labeled_files: bool = True,
) -> LabelDatabase:
    image_files = natural_sort(
        glob.glob(os.path.join(root_dir, "**/*.jpg"), recursive=True)
    )
    db = LabelDatabase.load_or_create(root_dir)
    if os.path.exists(db.path):
        db.create_backup()
    print(f"Found {db.n_labeled()} labeled images ({len(image_files)} total) in {db.path}")

    db.fix_database()
    image_files = re_order_images(image_files, db, root_dir, sort)
    if not image_files:
        print("No images to label.")
        return db

    current = 0
    new_labels = 0
    consecutive_skips = 0
    last_save_t = 0.0
    save_cost = 0.0
    thumbs = ThumbnailCache()
    while True:
        if consecutive_skips >= len(image_files):
            # every remaining image is labeled or unloadable — don't busy-spin
            print("No more images to label.")
            break
        image_file = image_files[current]
        uuid = os.path.splitext(os.path.basename(image_file))[0]
        label = db.get_label(uuid)
        if _is_labeled(label) and skip_labeled_files:
            current = (current + 1) % len(image_files)
            consecutive_skips += 1
            continue
        skip_labeled_files = False

        thumb, prompt = thumbs.get(uuid, root_dir)
        if thumb is None:
            current = (current + 1) % len(image_files)
            consecutive_skips += 1
            continue
        consecutive_skips = 0
        frame = _annotate(
            thumb.copy(),  # the overlay draws in place; keep the cache clean
            label if _is_labeled(label) else None,
            db.get_predicted_label(uuid),
            prompt,
            current / max(1, len(image_files)),
        )

        # optional backend hook: oracle/scripted backends need to know WHICH
        # image the next show() call displays (ui/backend.OracleBackend — the
        # closed-loop active-learning evaluation labels by uuid)
        on_image = getattr(backend, "on_image", None)
        if on_image is not None:
            on_image(uuid)
        key = backend.show(frame, current / max(1, len(image_files)))
        if key in "0123456789" and len(key) == 1:
            db.relabel(uuid, int(key) / 10.0)
            current += 1
            new_labels += 1
            # autosave every 5 new labels (reference _3:329-331); once a
            # single save becomes humanly noticeable (a big frame's full-CSV
            # rewrite), throttle to one per 15 s — a crash then loses at most
            # ~15 s of labels instead of freezing the UI every 5 keypresses
            if new_labels % 5 == 0 and (
                save_cost < 0.2 or time.monotonic() - last_save_t >= 15
            ):
                t0 = time.monotonic()
                db.save()
                last_save_t = time.monotonic()
                save_cost = last_save_t - t0
                print(f"{db.n_labeled()} of {len(db)} images in the database labeled")
        elif key == "quit":
            break
        elif key == "left":
            current -= 1
        elif key == "right":
            current += 1
        current %= len(image_files)

    backend.close()
    db.save()
    print(f"{db.n_labeled()} of {len(db)} images in the database labeled")
    return db


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--skip_labeled_files", action="store_true")
    parser.add_argument("--sort", type=str, default=None,
                        choices=list(SORT_OPTIONS) + [None],
                        help="acquisition ordering; prompts interactively if omitted")
    parser.add_argument("--backend", type=str, default="opencv",
                        choices=["opencv", "headless"])
    parser.add_argument("--keys", type=str, default="",
                        help="comma-separated scripted keys for --backend headless "
                        "(e.g. '3,7,left,9,q')")
    args = parser.parse_args(argv)

    sort = args.sort or prompt_sort_option()
    if args.backend == "headless":
        keys = [("quit" if k in ("q", "esc") else k) for k in args.keys.split(",") if k]
        backend: LabelBackend = HeadlessBackend(keys)
    else:
        backend = OpenCVBackend()
    label_dataset(args.root_dir, backend, sort=sort,
                  skip_labeled_files=args.skip_labeled_files)


if __name__ == "__main__":
    main()
