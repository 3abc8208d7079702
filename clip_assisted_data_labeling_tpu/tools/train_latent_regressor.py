"""Prompt-latent → score regressor (the reference's experimental
utils/train_latent_regressor.py, finished and ported to the jitted trainer).

Given a dataset of diffusion prompt embeddings (``<uuid>.pth`` tensors, e.g.
[2, 77, 768] c/uc stacks) and the label CSV, learns a mapping from prompt latents
to aesthetic scores — intended for prompt augmentation in latent space. Matches
the reference's semantics: rows without a human label use
``predicted_label * 0.5`` as a soft pseudo-label (train_latent_regressor.py:52),
labels min-max normalized, MSE on a sigmoid-headed FC stack.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from clip_assisted_data_labeling_tpu.config import TrainConfig
from clip_assisted_data_labeling_tpu.pipeline.train import save_model, train_regressor


def load_latents(train_data_dir: str, train_data_names: list[str],
                 seed: int = 42):
    import pandas as pd
    import torch

    features, labels = [], []
    for name in train_data_names:
        data = pd.read_csv(os.path.join(train_data_dir, name + ".csv"), dtype={"uuid": str})
        # seeded: --random_seed must make the whole run reproducible, and an
        # unseeded shuffle here feeds the (seeded) split different row sets
        data = data.sample(frac=1, random_state=seed).reset_index(drop=True)
        n_samples, skips = 0, 0
        for _, row in data.iterrows():
            try:
                label = (
                    row["label"]
                    if not np.isnan(row["label"])
                    else row["predicted_label"] * 0.5
                )
                if np.isnan(label):
                    raise ValueError("no label")
                latents = torch.load(
                    os.path.join(train_data_dir, name, f"{row['uuid']}.pth"),
                    map_location="cpu", weights_only=True,
                )
                features.append(np.asarray(latents.float().numpy()).reshape(-1))
                labels.append(float(label))
                n_samples += 1
            except Exception:
                skips += 1
        print(f"Loaded {n_samples} samples from {name}" + (f" ({skips} skipped)" if skips else ""))
    return np.stack(features).astype(np.float32), np.asarray(labels, np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_data_dir", required=True)
    parser.add_argument("--train_data_names", type=str, nargs="+", required=True)
    parser.add_argument("--model_name", default="latent_regressor")
    parser.add_argument("--test_fraction", type=float, default=0.25)
    parser.add_argument("--n_epochs", type=int, default=40)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--weight_decay", type=float, default=6e-4)
    parser.add_argument("--dropout_prob", type=float, default=0.5)
    parser.add_argument("--hidden_sizes", type=int, nargs="+", default=[264, 128, 64])
    parser.add_argument("--random_seed", type=int, default=42)
    parser.add_argument("--dont_save", action="store_true")
    args = parser.parse_args(argv)

    cfg = TrainConfig(
        clip_models_to_use=("prompt_latents",),
        crop_names=("prompt_latents",),
        test_fraction=args.test_fraction,
        n_epochs=args.n_epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        dropout_prob=args.dropout_prob,
        hidden_sizes=tuple(args.hidden_sizes),
        random_seed=args.random_seed,
        model_name=args.model_name,
        dont_save=args.dont_save,
    )
    features, labels = load_latents(args.train_data_dir, args.train_data_names,
                                    seed=args.random_seed)
    print("Features shape:", features.shape)
    model, history = train_regressor(features, labels, cfg, ["prompt_latents"])
    if not args.dont_save:
        save_model(model, history, cfg)


if __name__ == "__main__":
    main()
