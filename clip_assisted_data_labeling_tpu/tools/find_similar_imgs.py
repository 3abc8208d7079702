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


def _collect_embeddings(directory: str, clip_models: list[str], crop_name: str):
    """(names, paths, embeddings) from all .pt sidecars under directory."""
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
