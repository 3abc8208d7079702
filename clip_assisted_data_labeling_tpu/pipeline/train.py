"""Stage 4 — train the FC label regressor on (embedding → label) pairs.

TPU-native rework of _4_train_model.py: feature assembly streams from the
columnar store when present (falling back to per-uuid ``.pt`` sidecars for
reference-embedded datasets), the whole dataset lives on device, and each epoch
is ONE jitted ``lax.scan`` over batches (forward, backward, Adam update, dropout)
instead of a per-batch Python loop.

Replicated training semantics: torch-Adam-style L2 (weight decay folded into the
gradient), CosineAnnealingWarmRestarts stepped per epoch, MSE on sigmoid outputs,
min-max label normalization to [0,1] with the bounds recorded in the checkpoint
metadata, dummy-mean baseline loss reported alongside, loss/r² plot artifacts.
"""
from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_assisted_data_labeling_tpu.config import TrainConfig
from clip_assisted_data_labeling_tpu.models.regressor import (
    RegressorMeta,
    SimpleFCRegressor,
    regressor_apply,
)
from clip_assisted_data_labeling_tpu.store.columnar import (
    EmbeddingStore,
    assemble_batch_from_stores as _assemble_batch_from_stores,
)
from clip_assisted_data_labeling_tpu.store.sidecar import assemble_features, read_sidecar
from clip_assisted_data_labeling_tpu.utils import plots


# --------------------------------------------------------------------------------
# data loading
# --------------------------------------------------------------------------------
def load_training_data(
    train_data_dir: str,
    train_data_names: list[str],
    clip_models_to_use: list[str],
    crop_names: list[str],
    use_img_stat_features: bool,
):
    """Assemble (features, labels) over ≥1 labeled datasets (reference _4:28-81)."""
    import pandas as pd

    features, labels = [], []
    resolved_models = list(clip_models_to_use)

    for name in train_data_names:
        csv_path = os.path.join(train_data_dir, name + ".csv")
        root = os.path.join(train_data_dir, name)
        data = pd.read_csv(csv_path, dtype={"uuid": str}).dropna(subset=["label"])
        data = data.sample(frac=1).reset_index(drop=True)

        if resolved_models[0] == "all":
            resolved_models = _discover_models(root, data)
            print(f"----> Using all found clip models: {resolved_models}")

        stores = {}
        for m in resolved_models:
            if EmbeddingStore.exists(root, m):
                stores[m] = EmbeddingStore.open(root, m)

        if len(stores) == len(resolved_models):
            # vectorized batch gather; a row is skipped exactly when the old
            # per-uuid loop's assemble call raised (missing/invalid uuid)
            row_uuids = [str(u) for u in data["uuid"].values]
            keep, feats = _assemble_batch_from_stores(
                stores, resolved_models, crop_names, use_img_stat_features,
                row_uuids,
            )
            features.extend(feats)
            labels.extend(float(l) for l in data["label"].values[keep])
            n_samples, skips = int(keep.sum()), int((~keep).sum())
        else:
            n_samples, skips = 0, 0
            for _, row in data.iterrows():
                uuid, label = row["uuid"], row["label"]
                try:
                    sidecar = read_sidecar(os.path.join(root, f"{uuid}.pt"))
                    feats = assemble_features(
                        sidecar, resolved_models, crop_names, use_img_stat_features
                    )
                    features.append(feats)
                    labels.append(float(label))
                    n_samples += 1
                except Exception:
                    skips += 1
        print(f"Loaded {n_samples} samples from {name}" + (f" (skipped {skips})" if skips else ""))

    return np.stack(features).astype(np.float32), np.asarray(labels, np.float32), resolved_models


def _discover_models(root: str, data) -> list[str]:
    from clip_assisted_data_labeling_tpu.store.columnar import list_models

    names = list_models(root)
    if names:
        return names
    for uuid in data["uuid"].values[:50]:
        p = os.path.join(root, f"{uuid}.pt")
        if os.path.exists(p):
            return list(read_sidecar(p).keys())
    raise FileNotFoundError(f"No embeddings found under {root}")


# --------------------------------------------------------------------------------
# jitted training
# --------------------------------------------------------------------------------
def _lr_at_epoch(epoch, cfg: TrainConfig) -> float:
    """CosineAnnealingWarmRestarts(T_0=restart_epochs, T_mult=1) stepped per epoch."""
    t_cur = epoch % cfg.restart_epochs
    return cfg.min_lr + (cfg.lr - cfg.min_lr) * (
        1 + np.cos(np.pi * t_cur / cfg.restart_epochs)
    ) / 2


def make_optimizer(weight_decay: float):
    # torch-Adam semantics: weight decay is L2 added to the gradient before the
    # moment updates (reference uses Adam(weight_decay=…), not AdamW); the
    # per-epoch learning rate is applied manually so the warm-restart schedule
    # lives outside the optimizer state.
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
    )


def _xent(logits, y_idx):
    """Per-sample cross-entropy for integer class targets carried as floats."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(
        logp, y_idx.astype(jnp.int32)[:, None], axis=1)[:, 0]


def _epoch_body(params, opt_state, x, y, w, lr, key,
                dropout_prob: float, weight_decay: float, batch_size: int,
                n_classes: int):
    """One epoch, fully on device: shuffle (device PRNG), batch, and scan the
    forward/backward/Adam steps.

    x/y/w are pre-padded to a multiple of batch_size with w=0 rows (padding is
    strictly smaller than one batch, so no batch can be all-padding).
    n_classes=0 is regression (sigmoid + MSE); otherwise y holds class
    indices and the loss is softmax cross-entropy over n_classes logits."""
    opt = make_optimizer(weight_decay)
    n = x.shape[0]
    n_batches = n // batch_size
    key, perm_key = jax.random.split(key)
    perm = jax.random.permutation(perm_key, n)
    xb = x[perm].reshape(n_batches, batch_size, -1)
    yb = y[perm].reshape(n_batches, batch_size)
    wb = w[perm].reshape(n_batches, batch_size)

    def loss_fn(p, xi, yi, wi, k):
        if n_classes:
            logits = regressor_apply(p, xi, dropout_prob=dropout_prob,
                                     dropout_key=k, head="linear")
            per = _xent(logits, yi) * wi
        else:
            out = regressor_apply(p, xi, dropout_prob=dropout_prob,
                                  dropout_key=k)[:, 0]
            per = (out - yi) ** 2 * wi
        return jnp.sum(per) / jnp.maximum(jnp.sum(wi), 1.0)

    def step(carry, batch):
        p, s, k = carry
        xi, yi, wi = batch
        k, sub = jax.random.split(k)
        loss, grads = jax.value_and_grad(loss_fn)(p, xi, yi, wi, sub)
        updates, s = opt.update(grads, s, p)
        p = jax.tree.map(lambda a, u: a - lr * u, p, updates)
        return (p, s, k), loss

    (params, opt_state, _), losses = jax.lax.scan(
        step, (params, opt_state, key), (xb, yb, wb)
    )
    return params, opt_state, jnp.mean(losses)


@functools.partial(
    jax.jit,
    static_argnames=("dropout_prob", "weight_decay", "batch_size", "n_classes"),
    donate_argnums=(0, 1),
)
def _train_run(params, opt_state, x, y, w, x_test, y_test, lrs, key, cvals,
               dropout_prob: float, weight_decay: float, batch_size: int,
               n_classes: int = 0):
    """The ENTIRE training run as one XLA program: scan over epochs, each epoch
    an inner scan over shuffled batches, with the test/dummy MSE evaluated per
    epoch. One dispatch total — only the loss curves return to host.

    Classification (n_classes > 0): losses are cross-entropy, the per-epoch
    third metric is test ACCURACY (the regression path reports the
    dummy-mean baseline there), and final_preds are softmax-expected label
    values via ``cvals`` [n_classes] so the scatter plot stays in label
    units."""
    has_test = x_test.shape[0] > 0  # static

    def scores(p, xt):
        if n_classes:
            return jax.nn.softmax(
                regressor_apply(p, xt, head="linear"), axis=-1) @ cvals
        return regressor_apply(p, xt)[:, 0]

    def epoch_step(carry, lr):
        p, s, k = carry
        k, sub = jax.random.split(k)
        p, s, train_loss = _epoch_body(
            p, s, x, y, w, lr, sub, dropout_prob, weight_decay, batch_size,
            n_classes
        )
        if has_test and n_classes:
            logits = regressor_apply(p, x_test, head="linear")
            test_loss = jnp.mean(_xent(logits, y_test))
            third = jnp.mean(
                (jnp.argmax(logits, axis=-1) == y_test.astype(jnp.int32))
                .astype(jnp.float32))
        elif has_test:
            out = regressor_apply(p, x_test)[:, 0]
            test_loss = jnp.mean((out - y_test) ** 2)
            third = jnp.mean((jnp.mean(y_test) - y_test) ** 2)
        else:
            test_loss = jnp.float32(-1.0)
            third = jnp.float32(-1.0)
        return (p, s, k), (train_loss, test_loss, third)

    (params, opt_state, _), history = jax.lax.scan(
        epoch_step, (params, opt_state, key), lrs
    )
    final_preds = scores(params, x_test) if has_test else jnp.zeros((0,))
    return params, opt_state, history, final_preds


def _pad_to_batches(x, y, batch_size):
    """Pad (x, y) to a batch_size multiple with zero-weight rows (uploaded to
    device once; per-epoch shuffling happens on device)."""
    n = len(x)
    n_batches = max(1, (n + batch_size - 1) // batch_size)
    pad = n_batches * batch_size - n
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        y = np.concatenate([y, np.zeros(pad, y.dtype)])
    return x, y, w


def train_regressor(
    features: np.ndarray,
    labels: np.ndarray,
    cfg: TrainConfig,
    clip_models: list[str],
    plot_dir: str = ".",
    verbose: bool = True,
):
    rng = np.random.default_rng(cfg.random_seed)

    lmin, lmax = float(labels.min()), float(labels.max())
    class_values = None
    if cfg.classification:
        # classification (reference README TODO "class labels +
        # classification"): distinct label values become classes; y carries
        # the class INDEX (as float — one shared device array with the
        # regression path); labels stay in their raw units in metadata
        class_values = np.unique(labels.astype(np.float32))
        if len(class_values) < 2:
            raise ValueError(
                f"--classification needs >=2 distinct label values, got "
                f"{class_values.tolist()}"
            )
        labels = np.searchsorted(class_values, labels.astype(np.float32)
                                 ).astype(np.float32)
        print(f"Classification over {len(class_values)} classes: "
              f"{class_values.tolist()}")
    else:
        # min-max label normalization (reference _4:84-88), bounds in metadata
        denom = (lmax - lmin) if lmax > lmin else 1.0
        labels = (labels - lmin) / denom

    n = len(features)
    test_size = int(cfg.test_fraction * n)
    perm = rng.permutation(n)
    test_idx, train_idx = perm[:test_size], perm[test_size:]
    x_train, y_train = features[train_idx], labels[train_idx]
    x_test = jnp.asarray(features[test_idx])
    y_test = jnp.asarray(labels[test_idx])
    if verbose:
        print(f"Training on {len(train_idx)} samples, testing on {len(test_idx)}.")

    meta = RegressorMeta(
        clip_models=tuple(clip_models),
        crop_names=tuple(cfg.crop_names),
        input_size=int(features.shape[1]),
        hidden_sizes=tuple(cfg.hidden_sizes),
        output_size=len(class_values) if class_values is not None else 1,
        use_img_stat_features=cfg.use_img_stat_features,
        dropout_prob=cfg.dropout_prob,
        data_min=lmin,
        data_max=lmax,
        class_values=(tuple(float(v) for v in class_values)
                      if class_values is not None else None),
    )
    model = SimpleFCRegressor.create(jax.random.key(cfg.random_seed), meta)
    if cfg.print_network_layout:
        print(model.describe())
    params = model.params

    opt = make_optimizer(cfg.weight_decay)
    opt_state = opt.init(params)
    key = jax.random.key(cfg.random_seed + 1)

    xp, yp, wp = _pad_to_batches(x_train, y_train, cfg.batch_size)
    lrs = [_lr_at_epoch(e, cfg) for e in range(cfg.n_epochs)]

    n_classes = len(class_values) if class_values is not None else 0
    cvals_dev = jnp.asarray(class_values if class_values is not None
                            else np.zeros(1), jnp.float32)
    # the whole run is ONE device dispatch (scan over epochs); arrays upload once
    params, opt_state, history_dev, final_preds = _train_run(
        params,
        opt_state,
        jnp.asarray(xp),
        jnp.asarray(yp),
        jnp.asarray(wp),
        x_test,
        y_test,
        jnp.asarray(lrs, jnp.float32),
        key,
        cvals_dev,
        float(cfg.dropout_prob),
        float(cfg.weight_decay),
        int(cfg.batch_size),
        n_classes,
    )
    train_losses = [float(v) for v in np.asarray(history_dev[0])]
    test_losses = [float(v) for v in np.asarray(history_dev[1])]
    third_metric = [float(v) for v in np.asarray(history_dev[2])]

    loss_name = "xent" if n_classes else "mse"
    third_name = "test acc" if n_classes else "dummy"
    if verbose:
        for epoch in range(0, cfg.n_epochs, 2):
            print(
                f"Epoch {epoch + 1}/{cfg.n_epochs}, train-{loss_name}: "
                f"{train_losses[epoch]:.4f}, lr: {lrs[epoch]:.6f}, "
                f"test {loss_name}: {test_losses[epoch]:.4f} "
                f"({third_name}: {third_metric[epoch]:.4f})"
            )
    if test_size > 0 and verbose:
        best = int(np.argmin(test_losses))
        print(f"---> Best test {loss_name} loss: {test_losses[best]:.4f} "
              f"in epoch {best + 1}")
        if n_classes:
            counts = np.bincount(np.asarray(y_test, np.int64), minlength=n_classes)
            print(f"     (majority-class baseline accuracy: "
                  f"{counts.max() / max(counts.sum(), 1):.4f}; final test "
                  f"accuracy: {third_metric[-1]:.4f})")
    plots.plot_losses(
        train_losses, test_losses, lrs,
        out_path=os.path.join(plot_dir, "training_progress.png"),
    )
    if test_size > 0:
        # scatter stays in label units: classification y_test holds class
        # indices — map back through class_values
        y_plot = (np.asarray(cvals_dev)[np.asarray(y_test, np.int64)]
                  if n_classes else np.asarray(y_test))
        plots.plot_test_scatter(
            y_plot, np.asarray(final_preds), cfg.n_epochs - 1,
            out_path=os.path.join(plot_dir, "test_set_predictions.png"),
        )

    model.params = params
    history = {"train": train_losses, "test": test_losses, "lrs": lrs,
               "n_train": len(train_idx)}
    return model, history


def save_model(model: SimpleFCRegressor, history: dict, cfg: TrainConfig,
               out_dir: str = "models") -> str:
    """Reference-style self-describing filename (_4_train_model.py:231-238)."""
    os.makedirs(out_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d_%H:%M:%S")
    # test_fraction=0 leaves the -1.0 no-test sentinel in history['test'];
    # bake the train loss in that case (labeled as such) rather than a bogus
    # "-1.0000_mse" a human or the fuzzy model lookup would read as real
    loss_name = "xent" if model.meta.class_values is not None else "mse"
    mse = (f"{history['test'][-1]:.4f}_{loss_name}" if history["test"][-1] >= 0
           else f"{history['train'][-1]:.4f}_train_{loss_name}")
    name = (
        f"{cfg.model_name}_{stamp}_{history['n_train'] / 1000:.1f}k_imgs_"
        f"{cfg.n_epochs}_epochs_{mse}.npz"
    )
    path = os.path.join(out_dir, name)
    model.save(path)
    print("Final model saved as:", path)
    if cfg.export_torch:
        pth = path[: -len(".npz")] + ".pth"
        model.save_torch_pickle(pth)
        print("Reference-compatible torch pickle saved as:", pth)
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_data_dir", type=str, required=True)
    parser.add_argument("--train_data_names", type=str, nargs="+", required=True)
    parser.add_argument("--model_name", type=str, default="regressor")
    parser.add_argument("--dont_save", action="store_true")
    parser.add_argument("--export_torch", action="store_true",
                        help="also save a reference-loadable .pth module "
                        "pickle next to the .npz checkpoint")
    parser.add_argument("--clip_models_to_use", metavar="S", type=str, nargs="+",
                        default=["all"])
    parser.add_argument("--crop_names", type=str, nargs="+",
                        default=["centre_crop", "subcrop2_0.1"])
    parser.add_argument("--use_img_stat_features", action="store_true")
    parser.add_argument("--test_fraction", type=float, default=0.25)
    parser.add_argument("--n_epochs", type=int, default=60)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("--restart_epochs", type=int, default=10)
    parser.add_argument("--weight_decay", type=float, default=6e-4)
    parser.add_argument("--dropout_prob", type=float, default=0.5)
    parser.add_argument("--hidden_sizes", type=int, nargs="*",
                        default=[264, 128, 64],
                        help="hidden layer widths; pass with NO values for a "
                        "pure linear(-logistic) model — the 'more linear "
                        "component' the reference README's TODO asks for "
                        "(more robust on the tiny 10-minute-bootstrap "
                        "label sets)")
    parser.add_argument("--random_seed", type=int, default=42)
    parser.add_argument("--print_network_layout", action="store_true",
                        help="print the regressor layer layout (reference _4:261)")
    parser.add_argument("--classification", action="store_true",
                        help="train a softmax classifier over the distinct "
                        "label values instead of the sigmoid regressor "
                        "(reference README TODO); predicted_label becomes "
                        "the softmax-expected label value")
    parser.add_argument("--debug_nans", action="store_true",
                        help="trap NaNs in device computations (jax_debug_nans)")
    args = parser.parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    cfg = TrainConfig(
        clip_models_to_use=args.clip_models_to_use,
        crop_names=args.crop_names,
        use_img_stat_features=args.use_img_stat_features,
        test_fraction=args.test_fraction,
        n_epochs=args.n_epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        min_lr=args.min_lr,
        restart_epochs=args.restart_epochs,
        weight_decay=args.weight_decay,
        dropout_prob=args.dropout_prob,
        hidden_sizes=args.hidden_sizes,
        random_seed=args.random_seed,
        model_name=args.model_name,
        dont_save=args.dont_save,
        export_torch=args.export_torch,
        print_network_layout=args.print_network_layout,
        classification=args.classification,
    )
    np.random.seed(cfg.random_seed)
    features, labels, models = load_training_data(
        args.train_data_dir, args.train_data_names, list(cfg.clip_models_to_use),
        list(cfg.crop_names), cfg.use_img_stat_features,
    )
    print("Features shape:", features.shape, "Labels shape:", labels.shape)
    model, history = train_regressor(features, labels, cfg, models)
    if not cfg.dont_save:
        save_model(model, history, cfg)


if __name__ == "__main__":
    main()
