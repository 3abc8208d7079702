"""Active-learning acquisition orderings for the labeling loop.

The reference picks the order via a blocking tkinter dialog (_3:38-92) feeding
re_order_images (_3:180-213). Here the strategy is a plain parameter (the CLI
exposes ``--sort``; an interactive prompt covers the dialog use-case) and the
diversity ordering runs on-device over the columnar store instead of 500×100
torch.loads.

Strategies (reference parity):
  uuid        natural-sort order (no reordering)
  bad_first   ascending predicted_label
  good_first  descending predicted_label
  middle      ascending |predicted_label − median| (max-uncertainty first)
  diversity   farthest-point ordering in CLIP space

New beyond the reference:
  review      already-labeled images whose model prediction disagrees most
              with their human label, descending |label − predicted_label| —
              a relabeling/QA pass over suspect ground truth (unlabeled rows
              are excluded; needs a prior predict run)
"""
from __future__ import annotations

import os

import numpy as np

SORT_OPTIONS = ("uuid", "bad_first", "good_first", "middle", "diversity", "review")
# reference dialog labels → our names, for drop-in familiarity
SORT_ALIASES = {
    "Predicted bad first": "bad_first",
    "Predicted good first": "good_first",
    "middle first": "middle",
    "diversity sorted": "diversity",
}


def _diversity_order(image_files: list[str], root_dir: str, crop: str = "square_padded_crop"):
    from clip_assisted_data_labeling_tpu.ops.diversity import farthest_point_order
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar, resolve_crop_key

    uuids = [os.path.splitext(os.path.basename(f))[0] for f in image_files]
    embs = []
    store = None
    store_base = os.path.join(root_dir, ".ctpu_store")
    if os.path.isdir(store_base):
        for d in sorted(os.listdir(store_base)):
            try:
                import json

                with open(os.path.join(store_base, d, "meta.json")) as f:
                    model = json.load(f)["model_name"]
                store = EmbeddingStore.open(root_dir, model)
                break
            except Exception:
                continue
    kept_idx = []
    for i, u in enumerate(uuids):
        try:
            if store is not None:
                row = store.index_of(u)
                if not bool(store.valid[row]):
                    continue
                embs.append(np.asarray(store.embeddings[row, store.crop_index(crop)], np.float32))
            else:
                d = read_sidecar(os.path.join(root_dir, u + ".pt"))
                feats = d[next(iter(d.keys()))]
                key = resolve_crop_key(feats, crop) if isinstance(feats, dict) else None
                if key is None:
                    continue
                embs.append(np.asarray(feats[key], np.float32).reshape(-1))
            kept_idx.append(i)
        except Exception:
            continue
    if len(embs) < 2:
        return image_files
    order = farthest_point_order(np.stack(embs), n_order=min(500, len(embs)))
    ordered = [image_files[kept_idx[i]] for i in order]
    kept = set(kept_idx)
    missing = [f for i, f in enumerate(image_files) if i not in kept]
    return ordered + missing


def re_order_images(image_files: list[str], database, root_dir: str, sort: str):
    """Order image files per the chosen acquisition strategy (reference _3:180-213)."""
    sort = SORT_ALIASES.get(sort, sort)
    if sort == "uuid":
        return image_files
    if sort == "diversity":
        return _diversity_order(image_files, root_dir)

    df = database.df
    if sort == "bad_first":
        sorted_idx = df["predicted_label"].argsort().values
    elif sort == "good_first":
        sorted_idx = df["predicted_label"].argsort().values[::-1]
    elif sort == "middle":
        median = df["predicted_label"].median()
        sorted_idx = (df["predicted_label"] - median).abs().argsort().values
    elif sort == "review":
        disagreement = (df["label"] - df["predicted_label"]).abs().values
        # rows without both a human label and a prediction are excluded
        valid = ~np.isnan(disagreement)
        sorted_idx = np.argsort(-np.where(valid, disagreement, -np.inf))
        uuids = [df["uuid"].values[i] for i in sorted_idx if valid[i]]
        available = set(image_files)
        candidates = [os.path.join(root_dir, f"{u}.jpg") for u in uuids]
        return [f for f in candidates if f in available]
    else:
        raise ValueError(f"unknown sort option {sort}; choose from {SORT_OPTIONS}")

    uuids = df["uuid"].values[sorted_idx]
    available = set(image_files)
    candidates = [os.path.join(root_dir, f"{u}.jpg") for u in uuids]
    return [f for f in candidates if f in available]


def prompt_sort_option(default: str = "uuid") -> str:
    """Interactive replacement for the reference's tkinter dialog."""
    print("Sort options:", ", ".join(SORT_OPTIONS))
    choice = input(f"Choose sort order [{default}]: ").strip()
    return choice or default
