"""Quarantine unreadable images (reference tools/fix_img_dir.py, with a CLI)."""
from __future__ import annotations

import argparse
import os
import shutil


def quarantine_unreadable(src_folder: str, tmp_folder: str,
                          extensions=(".jpg", ".jpeg", ".png")) -> list[str]:
    from PIL import Image

    os.makedirs(tmp_folder, exist_ok=True)
    moved = []
    for file in sorted(os.listdir(src_folder)):
        if not file.lower().endswith(extensions):
            continue
        path = os.path.join(src_folder, file)
        try:
            with Image.open(path) as img:
                img.verify()
        except Exception as e:
            print(f"Error opening {file}: {e}")
            shutil.move(path, os.path.join(tmp_folder, file))
            moved.append(file)
            print(f"Moved {file} to the quarantine folder")
    return moved


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src_folder", required=True)
    parser.add_argument("--tmp_folder", default=None)
    args = parser.parse_args(argv)
    tmp = args.tmp_folder or args.src_folder.rstrip("/") + "_errored"
    quarantine_unreadable(args.src_folder, tmp)


if __name__ == "__main__":
    main()
