"""SVM-based similarity ranking — the reference's SVM_TODO.py sketch, integrated.

The reference repo carries an unintegrated synthetic sketch of Karpathy's
"use an SVM instead of kNN" exemplar-search trick (SVM_TODO.py:31-50). Here it is
a working tool over the real feature store: the context images are positives, the
search set is the (unlabeled) background, a balanced linear SVM is fit on the
embeddings, and the search set is ranked by decision-function margin — usually a
sharper ranking than mean-embedding cosine for multi-modal contexts. The heavy
part (feature assembly) shares tools/find_similar_imgs.py's loaders.
"""
from __future__ import annotations

import argparse
import os
import shutil
from pathlib import Path

import numpy as np

from clip_assisted_data_labeling_tpu.tools.find_similar_imgs import _collect_embeddings


def svm_rank(context_emb: np.ndarray, search_emb: np.ndarray, c: float = 0.1,
             max_iter: int = 10000) -> np.ndarray:
    """Margin score per search row, higher = more context-like."""
    from sklearn import svm

    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    x = np.concatenate([_norm(context_emb), _norm(search_emb)])
    y = np.zeros(len(x))
    y[: len(context_emb)] = 1.0
    clf = svm.LinearSVC(class_weight="balanced", max_iter=max_iter, tol=1e-6, C=c)
    clf.fit(x, y)
    return clf.decision_function(_norm(search_emb))


def find_similar_svm(context_dir: str, search_dir: str, output_dir: str,
                     clip_models: list[str], crop_name: str, top_n: int,
                     c: float = 0.1) -> list[tuple[float, str]]:
    ctx_names, _p, ctx_emb = _collect_embeddings(context_dir, clip_models, crop_name)
    names, pt_paths, emb = _collect_embeddings(search_dir, clip_models, crop_name)
    if not len(ctx_emb) or not len(emb):
        print("Missing embeddings in context or search dir")
        return []
    keep = [
        (i, p[:-3] + ".jpg")
        for i, p in enumerate(pt_paths)
        if os.path.exists(p[:-3] + ".jpg") and Path(p).name not in ctx_names
    ]
    if not keep:
        print("No search images with sibling .jpg files — nothing to rank")
        return []
    scores = svm_rank(ctx_emb, emb[[i for i, _ in keep]], c=c)
    order = np.argsort(-scores)[:top_n]

    os.makedirs(output_dir, exist_ok=True)
    results = []
    for rank in order:
        score, img = float(scores[rank]), keep[rank][1]
        shutil.copy(img, os.path.join(output_dir, f"{score:+.3f}_{Path(img).stem}.jpg"))
        results.append((score, img))
    print(f"Copied {len(results)} SVM-ranked images to {output_dir}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--context_dir", required=True)
    parser.add_argument("--search_dir", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--clip_models_to_use", type=str, nargs="+", default=["all"])
    parser.add_argument("--crop_name_to_use", default="square_padded_crop")
    parser.add_argument("--top_n", default=30, type=int)
    parser.add_argument("--svm_c", default=0.1, type=float)
    args = parser.parse_args(argv)
    out = args.output_dir or os.path.join(args.context_dir, "_svm_similar")
    find_similar_svm(args.context_dir, args.search_dir, out, args.clip_models_to_use,
                     args.crop_name_to_use, args.top_n, args.svm_c)


if __name__ == "__main__":
    main()
