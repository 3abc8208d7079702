"""Merge multiple labeled datasets into labeled/unlabeled splits.

Reference utils/merge_datasets.py had hardcoded personal paths and no CLI; same
behavior here behind argparse: concat every subdir's CSV (tagging rows with
``source_datadir``), split on label presence, write labeled.csv/unlabeled.csv,
and move each uuid's file group into labeled/ or unlabeled/ directories.
"""
from __future__ import annotations

import argparse
import os
import shutil

import pandas as pd

DEFAULT_EXTENSIONS = [".jpg", ".json", ".txt", ".pt", ".pth"]


def merge_datasets(data_dir: str, output_dir: str,
                   extensions=DEFAULT_EXTENSIONS, move: bool = True):
    labeled_dir = os.path.join(output_dir, "labeled")
    unlabeled_dir = os.path.join(output_dir, "unlabeled")
    os.makedirs(labeled_dir, exist_ok=True)
    os.makedirs(unlabeled_dir, exist_ok=True)

    dfs = []
    for subdir in sorted(os.listdir(data_dir)):
        if not os.path.isdir(os.path.join(data_dir, subdir)):
            continue
        csv_path = os.path.join(data_dir, f"{subdir}.csv")
        if os.path.exists(csv_path):
            df = pd.read_csv(csv_path, dtype={"uuid": str})
            df["source_datadir"] = subdir
            dfs.append(df)
    if not dfs:
        print(f"No dataset CSVs found in {data_dir}")
        return None, None

    combined = pd.concat(dfs)
    labeled = combined[combined["label"].notna()]
    unlabeled = combined[combined["label"].isna()]
    labeled.to_csv(os.path.join(output_dir, "labeled.csv"), index=False)
    unlabeled.to_csv(os.path.join(output_dir, "unlabeled.csv"), index=False)

    def move_files(df, destination):
        moved, clashes = 0, 0
        for uuid, src_sub in zip(df["uuid"].values, df["source_datadir"].values):
            for ext in extensions:
                src = os.path.join(data_dir, src_sub, f"{uuid}{ext}")
                if os.path.exists(src):
                    dst = os.path.join(destination, f"{uuid}{ext}")
                    if os.path.exists(dst):
                        # the same uuid in two source subdirs: clobbering
                        # would permanently LOSE a file in move mode — keep
                        # both with a disambiguating source prefix
                        dst = os.path.join(
                            destination, f"{src_sub}_{uuid}{ext}"
                        )
                        clashes += 1
                    (shutil.move if move else shutil.copy)(src, dst)
                    moved += 1
        print(f"{'Moved' if move else 'Copied'} {moved} files to {destination}")
        if clashes:
            print(f"WARNING: {clashes} files shared a uuid across source "
                  "subdirs — kept with a '<subdir>_' prefix (re-run prep to "
                  "re-uuid them)")

    move_files(labeled, labeled_dir)
    move_files(unlabeled, unlabeled_dir)
    return labeled, unlabeled


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", required=True,
                        help="directory of dataset subfolders + their CSVs")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--extensions", nargs="+", default=DEFAULT_EXTENSIONS)
    parser.add_argument("--copy", action="store_true", help="copy instead of move")
    args = parser.parse_args(argv)
    merge_datasets(args.data_dir, args.output_dir, args.extensions, move=not args.copy)


if __name__ == "__main__":
    main()
