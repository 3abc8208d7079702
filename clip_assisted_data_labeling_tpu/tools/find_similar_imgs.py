"""Similarity search: learn a context embedding from one directory, find the
top-N most similar images in another (reference tools/find_similar_imgs.py).

The reference linear-scans with a Python top-N accumulator over per-file
torch.loads; here the context mean and the full scan run as batched device ops
over the columnar store (sidecar fallback), and top-N is one ``lax.top_k``.
"""
from __future__ import annotations

import argparse
import os
import shutil
from pathlib import Path

import numpy as np

from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar, resolve_crop_key


def _collect_from_stores(directory: str, clip_models: list[str], crop_name: str):
    """Store-backed sibling of the sidecar walk below: one vectorized gather
    per model instead of a torch.load per image (the walk costs ~30+ min per
    1M sidecars). Returns None when the store(s) can't serve the request
    (absent, missing a model, or missing the crop) — callers fall back."""
    from clip_assisted_data_labeling_tpu.store.columnar import (
        EmbeddingStore,
        list_models,
    )

    available = list_models(directory)
    if not available:
        return None
    # sorted, matching the sidecar path's sorted(d.keys()) "all" resolution
    resolved = sorted(available) if clip_models[0] == "all" else list(clip_models)
    stores = {}
    for m in resolved:
        if not EmbeddingStore.exists(directory, m):
            return None
        s = EmbeddingStore.open(directory, m)
        try:
            s.crop_index(crop_name)
        except KeyError:
            return None
        stores[m] = s
    base = stores[resolved[0]]
    uuids = base.uuids
    n = len(uuids)
    ok = np.ones(n, bool)
    rows_per_model = []
    for m in resolved:
        s = stores[m]
        pos = s.uuid_index()
        rows = np.fromiter((pos.get(u, -1) for u in uuids), np.int64, count=n)
        present = rows >= 0
        ok &= present
        valid_here = np.zeros(n, bool)
        if present.any():
            valid_here[present] = np.asarray(s.valid[rows[present]], bool)
        ok &= valid_here
        rows_per_model.append((s, rows))
    if not ok.any():
        return [], [], np.zeros((0, 1), np.float32)
    emb = np.concatenate(
        [np.asarray(s.embeddings[rows[ok], s.crop_index(crop_name)], np.float32)
         for s, rows in rows_per_model],
        axis=1,
    )
    rels = base.rel_paths()
    names, paths = [], []
    for u, rel, k in zip(uuids, rels, ok):
        if not k:
            continue
        names.append(u + ".pt")
        paths.append(os.path.join(
            directory, os.path.splitext(rel)[0] + ".pt"
        ))
    print(f"----> Using columnar store(s) in {directory}: {resolved}")
    return names, paths, emb


def _collect_embeddings(directory: str, clip_models: list[str], crop_name: str):
    """(names, paths, embeddings) — columnar store first, .pt walk fallback."""
    from_store = _collect_from_stores(directory, clip_models, crop_name)
    if from_store is not None:
        return from_store
    names, paths, embs = [], [], []
    resolved = list(clip_models)
    for root, _dirs, files in os.walk(directory):
        for f in sorted(files):
            if not f.endswith(".pt"):
                continue
            full = os.path.join(root, f)
            try:
                d = read_sidecar(full)
                if resolved[0] == "all":
                    # sorted: context and search dirs may have been embedded
                    # with different sidecar key orders; same-dim models would
                    # otherwise concatenate in swapped halves with no error
                    resolved = sorted(d.keys())
                    print(f"----> Using all found clip models: {resolved}")
                parts = []
                for m in resolved:
                    feats = d[m]
                    key = resolve_crop_key(feats, crop_name)
                    parts.append(np.asarray(feats[key], np.float32).reshape(-1))
                embs.append(np.concatenate(parts))
                names.append(f)
                paths.append(full)
            except Exception as e:
                print(e)
                continue
    return names, paths, (np.stack(embs) if embs else np.zeros((0, 1), np.float32))


def compute_distances(context: np.ndarray, embeddings: np.ndarray, measure: str):
    import jax.numpy as jnp

    c = jnp.asarray(context)
    e = jnp.asarray(embeddings)
    if measure == "cosine":
        cn = c / jnp.linalg.norm(c)
        en = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return np.asarray((1.0 - en @ cn) / 2.0)
    if measure == "l2":
        return np.asarray(jnp.sqrt(jnp.sum((e - c) ** 2, axis=1) + 1e-12))
    raise NotImplementedError(f"Similarity measure {measure} not implemented!")


def find_similar_imgs(context_dir: str, search_dir: str, output_dir: str,
                      clip_models: list[str], crop_name: str, measure: str,
                      top_n: int) -> list[tuple[float, str]]:
    ctx_names, _paths, ctx_emb = _collect_embeddings(context_dir, clip_models, crop_name)
    if not len(ctx_emb):
        print(f"No embeddings in context dir {context_dir}")
        return []
    context = ctx_emb.mean(axis=0)
    print(f"Context embedding from {len(ctx_emb)} samples, shape {context.shape}")

    names, pt_paths, emb = _collect_embeddings(search_dir, clip_models, crop_name)
    keep = []
    for i, p in enumerate(pt_paths):
        img = p[:-3] + ".jpg"
        if os.path.exists(img) and Path(img).name.replace(".jpg", ".pt") not in ctx_names:
            keep.append((i, img))
    if not keep:
        return []
    idxs = [i for i, _ in keep]
    dists = compute_distances(context, emb[idxs], measure)
    order = np.argsort(dists)[:top_n]

    os.makedirs(output_dir, exist_ok=True)
    results = []
    for rank in order:
        dist = float(dists[rank])
        img_path = keep[rank][1]
        out = os.path.join(output_dir, f"{dist:.3f}_{Path(img_path).stem}.jpg")
        shutil.copy(img_path, out)
        results.append((dist, img_path))
    print(f"Copied {len(results)} similar images to {output_dir}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--context_dir", required=True)
    parser.add_argument("--search_dir", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--clip_models_to_use", metavar="S", type=str, nargs="+",
                        default=["all"])
    parser.add_argument("--crop_name_to_use", default="square_padded_crop")
    parser.add_argument("--similarity_measure", default="l2", choices=["l2", "cosine"])
    parser.add_argument("--top_n", default=30, type=int)
    args = parser.parse_args(argv)

    # context dir without .pt files → treat each subdir as its own context
    if not any(f.endswith(".pt") for f in os.listdir(args.context_dir)):
        context_dirs = [
            os.path.join(args.context_dir, d) for d in sorted(os.listdir(args.context_dir))
            if os.path.isdir(os.path.join(args.context_dir, d))
        ]
    else:
        context_dirs = [args.context_dir]

    for context_dir in context_dirs:
        out = args.output_dir or os.path.join(context_dir, "_similar")
        find_similar_imgs(
            context_dir, args.search_dir, out, args.clip_models_to_use,
            args.crop_name_to_use, args.similarity_measure, args.top_n,
        )


if __name__ == "__main__":
    main()
