"""Stage 0 — dataset prep: uuid-rename all file groups, normalize images.

Replicates _0_prep_dataset.py behavior: files sharing a basename (image + prompt
sidecars) get one uuid4-hex name; rename-in-place or copy mode; optional
downscale of images above --max_n_pixels and jpg conversion (quality 95);
natural-sorted traversal; interactive 'yes' confirmation before destructive
rename (``--yes`` skips it for scripted runs).

Reference bugs fixed (SURVEY.md §8 — do-not-replicate list):
  * _0:30-31 shrank each axis by the full pixel ratio instead of its sqrt
    (over-shrinking, e.g. a 4x-too-big image became 16x smaller) — we scale each
    axis by sqrt(max_n_pixels / (w*h)).
  * _0:32 used the removed PIL Image.ANTIALIAS — we use LANCZOS.
  * _0:92 assigned random.shuffle's None return to the uuid list, crashing
    --shuffle_file_order — we shuffle in place.
"""
from __future__ import annotations

import argparse
import math
import os
import random
import shutil

from clip_assisted_data_labeling_tpu.utils.naming import natural_sort, new_uuid

ALL_IMG_EXTENSIONS = [
    ".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif", ".webp",
    ".JPEG", ".JPG", ".PNG", ".BMP", ".TIFF", ".TIF", ".WEBP",
]


def process_file(orig_path: str, new_path: str, mode: str, max_n_pixels: int,
                 convert_to_jpg: bool) -> tuple[int, int]:
    """Normalize + move one file; returns (converted, resized) flags."""
    from PIL import Image

    os.makedirs(os.path.dirname(new_path), exist_ok=True)
    ext = os.path.splitext(orig_path)[1]
    converted, resized = 0, 0

    if ext in ALL_IMG_EXTENSIONS:
        img = Image.open(orig_path)
        width, height = img.size
        if width * height > max_n_pixels:
            scale = math.sqrt(max_n_pixels / (width * height))
            img = img.resize(
                (max(1, int(width * scale)), max(1, int(height * scale))),
                Image.LANCZOS,
            )
            if convert_to_jpg:
                new_path = os.path.splitext(new_path)[0] + ".jpg"
                img = img.convert("RGB")
            img.save(new_path, quality=95)
            resized = 1
            if mode == "rename":
                os.remove(orig_path)
        elif convert_to_jpg and ext.lower() not in (".jpg", ".jpeg"):
            new_path = os.path.splitext(new_path)[0] + ".jpg"
            Image.open(orig_path).convert("RGB").save(new_path, quality=95)
            if mode == "rename":
                os.remove(orig_path)
            converted = 1

    if not converted and not resized:
        if mode == "rename":
            os.rename(orig_path, new_path)
        else:
            shutil.copy(orig_path, new_path)
    return converted, resized


def plan_renames(root_dir: str, output_dir: str,
                 shuffle_file_order: bool) -> list[tuple[str, str]]:
    """Walk the tree and assign each basename-group its uuid destination.

    Planning is separated from execution so the uuid assignment is decided
    (and could be inspected) before any file is touched. Within a directory,
    groups are visited in natural-sort order and uuids are themselves
    natural-sorted before assignment — preserving the reference's property
    that sorted-by-name order survives the rename (unless shuffled).
    """
    moves: list[tuple[str, str]] = []
    for subdir, _dirs, files in os.walk(root_dir):
        groups: dict[str, list[str]] = {}
        for name in natural_sort(files):
            stem, ext = os.path.splitext(name)
            groups.setdefault(stem, []).append(ext)

        uuids = natural_sort([new_uuid() for _ in groups])
        if shuffle_file_order:
            random.shuffle(uuids)

        dest_dir = subdir.replace(root_dir, output_dir, 1)
        for uid, (stem, exts) in zip(uuids, groups.items()):
            for ext in exts:
                moves.append(
                    (os.path.join(subdir, stem + ext),
                     os.path.join(dest_dir, uid + ext))
                )
    return moves


def prep_dataset_directory(root_dir: str, output_dir: str, mode: str,
                           max_n_pixels: int, convert_imgs_to_jpg: bool,
                           shuffle_file_order: bool) -> dict:
    os.makedirs(output_dir, exist_ok=True)
    moves = plan_renames(root_dir, output_dir, shuffle_file_order)
    print(f"Prep: {len(moves)} files under {root_dir} -> {output_dir} ({mode})")

    stats = {"renamed": 0, "converted": 0, "resized": 0, "skipped": 0}
    for orig, new in moves:
        try:
            c, r = process_file(orig, new, mode, max_n_pixels, convert_imgs_to_jpg)
            stats["renamed"] += 1
            stats["converted"] += c
            stats["resized"] += r
        except Exception as e:
            print(f"Could not process {orig}: {e}")
            stats["skipped"] += 1
    print(
        f"Prep done: {stats['renamed']} files processed "
        f"({stats['converted']} jpg-converted, {stats['resized']} downscaled, "
        f"{stats['skipped']} skipped)"
    )
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--mode", type=str, default="copy", choices=["copy", "rename"])
    parser.add_argument("--max_n_pixels", type=int, default=2048 * 2048)
    parser.add_argument("--convert_imgs_to_jpg", action="store_true")
    parser.add_argument("--shuffle_file_order", action="store_true")
    parser.add_argument("--yes", action="store_true",
                        help="skip the interactive confirmation for rename mode")
    args = parser.parse_args(argv)

    if args.mode == "copy" and args.output_dir is None:
        raise ValueError("Output directory must be specified when mode is 'copy'")
    if args.output_dir is None:
        args.output_dir = args.root_dir
        args.mode = "rename"

    if args.mode == "rename" and not args.yes:
        print(f"rename mode is DESTRUCTIVE: every file under {args.root_dir} "
              "will be renamed in place (and possibly downscaled/converted).")
        if input("Type 'yes' to continue: ") != "yes":
            raise ValueError("Aborted")

    prep_dataset_directory(
        args.root_dir, args.output_dir, args.mode, args.max_n_pixels,
        args.convert_imgs_to_jpg, args.shuffle_file_order,
    )


if __name__ == "__main__":
    main()
