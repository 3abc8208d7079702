"""Stage 6 — export a score-filtered subset of the dataset.

Replicates _6_create_subset.py semantics: the effective score is the *rescaled*
human label (label / max actual label) when present, else predicted_label
(_6:19-29); aspect-ratio and minimum-pixel gates read from each image
(_6:46-56); the chosen extensions are copied per uuid; the output folder name
encodes the range and, at the end, the image count. ``--test`` dry-runs.

Divergence from reference (deliberate): extension counters only count files that
actually existed (_6:64 counts unconditionally — noted in SURVEY.md §8 as a bug
not to replicate).
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pandas as pd

from clip_assisted_data_labeling_tpu.config import SubsetConfig
from clip_assisted_data_labeling_tpu.store.database import database_path_for


def copy_subset(input_dir: str, cfg: SubsetConfig, output_suffix: str = "_subset") -> str | None:
    database_path = database_path_for(input_dir)
    database = pd.read_csv(database_path, dtype={"uuid": str})
    print(f"Loaded database with {len(database)} rows")

    max_actual_label = database["label"].max()
    print(f"Max actual label: {max_actual_label}")

    # vectorized _6:19-29: rescaled human label where present, else prediction
    # (a row-wise .apply costs ~30 s per 1M rows for the same arithmetic)
    labels = database["label"].values.astype(float)
    scaled = labels / max_actual_label if max_actual_label else labels
    finals = pd.Series(
        np.where(~np.isnan(labels), scaled,
                 database["predicted_label"].values.astype(float)),
        index=database.index,
    )
    selected = database[(cfg.min_score <= finals) & (finals <= cfg.max_score)]
    print(
        f"Found {len(selected)} rows with {cfg.min_score} < final_label < {cfg.max_score}"
    )

    suffix = f"_{cfg.min_score:.2f}_to_{cfg.max_score:.2f}" + output_suffix
    output_folder = input_dir.rstrip("/") + suffix
    if cfg.test:
        print("##### Running in TEST MODE: not actually copying any files #####")
    else:
        if os.path.exists(output_folder) and os.listdir(output_folder):
            # leftovers from an interrupted run would be counted into this
            # run's _{n}_imgs suffix and break the final rename — refuse
            # early, before any copy work
            raise SystemExit(
                f"{output_folder} already exists and is not empty — delete it "
                "(or rename the previous run's output) and re-run"
            )
        os.makedirs(output_folder, exist_ok=True)

    counter = dict.fromkeys(cfg.extensions, 0)
    for uuid in selected["uuid"].values:
        img_path = os.path.join(input_dir, f"{uuid}.jpg")
        try:
            from PIL import Image

            with Image.open(img_path) as img:
                width, height = img.size
        except Exception as e:
            print(f"Could not open {img_path}, {e}")
            continue
        aspect = width / height
        if (
            aspect < cfg.min_aspect_ratio
            or aspect > cfg.max_aspect_ratio
            or width * height <= cfg.min_n_pixels
        ):
            continue
        for ext in cfg.extensions:
            src = os.path.join(input_dir, f"{uuid}{ext}")
            if os.path.exists(src):
                if not cfg.test:
                    shutil.copy(src, os.path.join(output_folder, f"{uuid}{ext}"))
                counter[ext] += 1

    for ext, count in counter.items():
        print(f"Copied {count} files with extension {ext} to {output_folder}")

    if not cfg.test:
        img_exts = (".jpg", ".jpeg", ".png")
        n_imgs = len([f for f in os.listdir(output_folder) if f.endswith(img_exts)])
        final_folder = output_folder + f"_{n_imgs}_imgs"
        if os.path.exists(final_folder):
            # a previous identical run's completed output: keep both rather
            # than crashing after all the copy work (or clobbering it)
            i = 2
            while os.path.exists(f"{final_folder}_{i}"):
                i += 1
            print(f"{final_folder} already exists — saving as {final_folder}_{i}")
            final_folder = f"{final_folder}_{i}"
        os.rename(output_folder, final_folder)
        return final_folder
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--min_score", type=float, required=True)
    parser.add_argument("--max_score", type=float, default=1.0)
    parser.add_argument("--extensions", nargs="+", default=[".jpg", ".txt", ".pt", ".pth"])
    parser.add_argument("--min_aspect_ratio", type=float, default=0.25)
    parser.add_argument("--max_aspect_ratio", type=float, default=4.00)
    parser.add_argument("--min_n_pixels", type=int, default=512 * 512)
    parser.add_argument("--test", action="store_true")
    args = parser.parse_args(argv)

    cfg = SubsetConfig(
        min_score=args.min_score,
        max_score=args.max_score,
        extensions=tuple(args.extensions),
        min_aspect_ratio=args.min_aspect_ratio,
        max_aspect_ratio=args.max_aspect_ratio,
        min_n_pixels=args.min_n_pixels,
        test=args.test,
    )
    copy_subset(args.input_dir, cfg)


if __name__ == "__main__":
    main()
