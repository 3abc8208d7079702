"""Copy a random fraction of basename file-groups, preserving relative paths
(reference tools/move_subset_of_files.py)."""
from __future__ import annotations

import argparse
import os
import random
import shutil
from pathlib import Path


def crawl_directory(root_dir: str, file_extensions) -> dict[str, list[str]]:
    files: dict[str, list[str]] = {}
    for dirpath, _dirs, filenames in os.walk(root_dir):
        for filename in filenames:
            if any(filename.endswith(ext) for ext in file_extensions):
                stem = os.path.splitext(filename)[0]
                files.setdefault(stem, []).append(os.path.join(dirpath, filename))
    return files


def copy_files(files: dict, root_dir: str, out_dir: str, fraction: float,
               seed: int | None = None) -> int:
    rng = random.Random(seed)
    n_copied = 0
    for _stem, paths in files.items():
        if rng.random() < fraction:
            n_copied += 1
            for path in paths:
                dest = os.path.join(out_dir, os.path.relpath(path, root_dir))
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                shutil.copy2(path, dest)
    print(f"Copied {n_copied} samples to {out_dir}")
    return n_copied


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--fraction_f", type=float, default=0.01)
    parser.add_argument("--file_extensions", nargs="+", default=[".jpg"])
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    root = str(Path(args.root_dir).resolve())
    out = args.out_dir or root + f"_{args.fraction_f:.3f}_subset"
    files = crawl_directory(root, args.file_extensions)
    copy_files(files, root, out, args.fraction_f, args.seed)


if __name__ == "__main__":
    main()
