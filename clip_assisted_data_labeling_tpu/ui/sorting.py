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

Deliberate divergences from _3:194-213 (documented in PARITY.md): rows with
no prediction sort LAST in every strategy (the reference's plain reversal put
every unscored image FIRST in good_first), nested-dataset images resolve
through their discovered paths, and images missing from the DB tail the
session instead of vanishing.

New beyond the reference:
  review      already-labeled images whose model prediction disagrees most
              with their human label, descending |label − predicted_label| —
              a relabeling/QA pass over suspect ground truth (unlabeled rows
              are excluded; needs a prior predict run)
  diversity_sampled
              the reference's own 100-candidate sampled farthest-point
              (_3:147-150) as a distinct strategy: the exact global version
              ('diversity') chases outliers, which measurably HURTS label
              efficiency on a closed-loop run (benchmarks/bench_al_loop.py);
              the sampled variant tempers selection toward dense regions
"""
from __future__ import annotations

import os

import numpy as np

SORT_OPTIONS = ("uuid", "bad_first", "good_first", "middle", "diversity",
                "diversity_sampled", "review")
# reference dialog labels → our names, for drop-in familiarity
SORT_ALIASES = {
    "Predicted bad first": "bad_first",
    "Predicted good first": "good_first",
    "middle first": "middle",
    "diversity sorted": "diversity",
}


def _diversity_order(image_files: list[str], root_dir: str,
                     crop: str = "square_padded_crop",
                     candidates: int | None = None):
    from clip_assisted_data_labeling_tpu.ops.diversity import farthest_point_order
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar, resolve_crop_key

    from clip_assisted_data_labeling_tpu.store.columnar import list_models

    uuids = [os.path.splitext(os.path.basename(f))[0] for f in image_files]
    embs = []
    store = None
    for model in list_models(root_dir):
        try:
            cand = EmbeddingStore.open(root_dir, model)
            cand.crop_index(crop)  # must actually hold the diversity crop
            store = cand
            break
        except Exception:
            continue  # next store; sidecar fallback if none qualifies
    kept_idx = []
    if store is not None:
        # one vectorized gather instead of a per-uuid loop (same pattern as
        # store.columnar.assemble_batch_from_stores: the loop is the session
        # startup cost at large N)
        pos = store.uuid_index()
        idx = np.fromiter((pos.get(u, -1) for u in uuids), np.int64,
                          count=len(uuids))
        ok = idx >= 0
        ok[ok] = np.asarray(store.valid[idx[ok]], bool)
        rows = idx[ok]
        embs = list(np.asarray(
            store.embeddings[rows, store.crop_index(crop)], np.float32
        ))
        kept_idx = np.nonzero(ok)[0].tolist()
    else:
        for i, u in enumerate(uuids):
            try:
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
        print("WARNING: diversity sort found <2 usable embeddings "
              "(store/sidecars missing the crop?) — keeping uuid order")
        return image_files
    order = farthest_point_order(np.stack(embs), n_order=min(500, len(embs)),
                                 candidates=candidates)
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
    if sort == "diversity_sampled":
        # the reference's candidate count (_3_label_images.py:135)
        return _diversity_order(image_files, root_dir, candidates=100)

    df = database.df
    # uuid → actual discovered path: label.py globs recursively, so nested
    # images must resolve through their real paths (a root_dir join silently
    # dropped every nested image from prediction-sorted sessions)
    by_uuid = {os.path.splitext(os.path.basename(f))[0]: f for f in image_files}
    pred = df["predicted_label"]
    # NaN (unpredicted) rows sort LAST for every strategy — pandas argsort
    # places NaN positions at the end, so the reference's plain [::-1]
    # reversal (_3:197-198) put every UNSCORED image first in good_first;
    # filling with the worst sort key keeps the documented semantics
    if sort == "bad_first":
        sorted_idx = np.argsort(pred.fillna(np.inf).values, kind="stable")
    elif sort == "good_first":
        sorted_idx = np.argsort(-pred.fillna(-np.inf).values, kind="stable")
    elif sort == "middle":
        median = pred.median()
        sorted_idx = np.argsort((pred - median).abs().fillna(np.inf).values,
                                kind="stable")
    elif sort == "review":
        disagreement = (df["label"] - pred).abs().values
        # rows without both a human label and a prediction are excluded
        valid = ~np.isnan(disagreement)
        sorted_idx = np.argsort(-np.where(valid, disagreement, -np.inf))
        uuids = [df["uuid"].values[i] for i in sorted_idx if valid[i]]
        return [by_uuid[u] for u in uuids if u in by_uuid]
    else:
        raise ValueError(f"unknown sort option {sort}; choose from {SORT_OPTIONS}")

    candidates = [by_uuid[u] for u in df["uuid"].values[sorted_idx] if u in by_uuid]
    seen = set(candidates)
    # images not (yet) in the DB tail the session instead of vanishing
    return candidates + [f for f in image_files if f not in seen]


def prompt_sort_option(default: str = "uuid") -> str:
    """Interactive replacement for the reference's tkinter dialog
    (_3_label_images.py sort chooser). Non-interactive runs (closed stdin —
    scripts, CI, headless drives without --sort) get the default instead of
    an EOFError crash."""
    print("Sort options:", ", ".join(SORT_OPTIONS))
    try:
        choice = input(f"Choose sort order [{default}]: ").strip()
    except EOFError:
        print(f"(stdin closed — using '{default}')")
        return default
    return choice or default
