"""Reproduce the config-4 numbers in BENCH_NOTES.md: train the FC regressor at
the reference's provenance scale (9.4k labeled embeddings, 60 epochs) and
predict 100k unlabeled.

    python benchmarks/bench_active_learning.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_train", type=int, default=9400)
    parser.add_argument("--n_predict", type=int, default=100_000)
    parser.add_argument("--feature_dim", type=int, default=1536)
    parser.add_argument("--n_epochs", type=int, default=60)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

    from clip_assisted_data_labeling_tpu.config import TrainConfig
    from clip_assisted_data_labeling_tpu.pipeline.train import train_regressor

    rng = np.random.default_rng(0)
    feats = rng.normal(0, 0.03, (args.n_train, args.feature_dim)).astype(np.float32)
    w_true = rng.normal(0, 1, args.feature_dim).astype(np.float32)
    labels = (
        1 / (1 + np.exp(-(feats @ w_true) * 2))
        + rng.normal(0, 0.05, args.n_train)
    ).astype(np.float32)

    cfg = TrainConfig(n_epochs=args.n_epochs, batch_size=16,
                      hidden_sizes=(264, 128, 64),
                      crop_names=("centre_crop", "subcrop2_0.1"))
    t0 = time.time()
    model, hist = train_regressor(feats, labels, cfg, ["bench"], plot_dir="/tmp",
                                  verbose=False)
    t_train = time.time() - t0

    big = rng.normal(0, 0.03, (args.n_predict, args.feature_dim)).astype(np.float32)
    t0 = time.time()
    scores = model.predict(big)
    t_pred = time.time() - t0

    print(json.dumps({
        "train_seconds": round(t_train, 1),
        "final_test_mse": round(hist["test"][-1], 4),
        "predict_seconds": round(t_pred, 1),
        "predictions_per_sec": round(args.n_predict / t_pred),
        "n_scores": int(len(scores)),
    }))


if __name__ == "__main__":
    main()
