"""The active-learning LOOP as one command: label → train → predict → re-sort.

The reference describes this cycle as its core workflow
(/root/reference/README.md:6-20 — label some images (3), train (4), predict
(5), "loop back to (3)" with a prediction-driven sort) but ships it as four
manual CLI invocations per lap. This stage drives the cycle end-to-end:

    python -m clip_assisted_data_labeling_tpu.pipeline.loop \
        --root_dir D --clip_models ViT-L-14/openai --sort middle --laps 3

Each lap: (1) open the labeling UI over the current acquisition ordering
(first lap has no predictions — every prediction-driven sort degrades to
natural order, as in the reference); (2) retrain the regressor on all labels
so far; (3) predict the whole dataset, which re-sorts the next lap. The loop
ends after --laps laps, or early when a lap adds no new labels (the operator
quit immediately). Measured label-efficiency curves for the sort policies are
in BENCH_NOTES.md "Active-learning loop" (benchmarks/bench_al_loop.py).
"""
from __future__ import annotations

import argparse
import os

from clip_assisted_data_labeling_tpu.config import TrainConfig
from clip_assisted_data_labeling_tpu.ui.sorting import SORT_OPTIONS


def run_loop(
    root_dir: str,
    cfg: TrainConfig,
    sort: str = "middle",
    laps: int = 3,
    backend=None,
    backend_factory=None,
    models_dir: str = "models",
    batch_size: int = 512,
) -> list[dict]:
    """Drive ≥1 label→train→predict laps. Returns one summary dict per lap.

    ``backend_factory`` (lap_index → LabelBackend) supplies the labeling
    backend per lap; default is the interactive OpenCV window each lap."""
    from clip_assisted_data_labeling_tpu.pipeline.label import label_dataset
    from clip_assisted_data_labeling_tpu.pipeline.predict import predict_labels
    from clip_assisted_data_labeling_tpu.pipeline.train import (
        load_training_data,
        save_model,
        train_regressor,
    )
    from clip_assisted_data_labeling_tpu.ui.backend import OpenCVBackend

    root_dir = os.path.abspath(root_dir)
    parent, name = os.path.split(root_dir.rstrip(os.sep))
    if backend_factory is None:
        if backend is not None:
            one = backend
            backend_factory = lambda _lap: one  # noqa: E731
        else:
            backend_factory = lambda _lap: OpenCVBackend()  # noqa: E731

    history: list[dict] = []
    prev_labeled = -1
    for lap in range(laps):
        db = label_dataset(root_dir, backend_factory(lap), sort=sort)
        n_labeled = db.n_labeled()
        if n_labeled == prev_labeled:
            print(f"Lap {lap + 1}: no new labels — stopping the loop.")
            break
        prev_labeled = n_labeled

        feats, labels, models = load_training_data(
            parent, [name], list(cfg.clip_models_to_use), list(cfg.crop_names),
            cfg.use_img_stat_features,
        )
        model, train_hist = train_regressor(feats, labels, cfg, models,
                                            plot_dir=parent)
        path = save_model(model, train_hist, cfg, out_dir=models_dir)
        n_pred = predict_labels(root_dir, path, batch_size=batch_size,
                                copy_imgs_fraction=0.0)
        summary = {
            "lap": lap + 1,
            "labels": n_labeled,
            "predicted": n_pred,
            "model_path": path,
            "final_train_loss": float(train_hist["train"][-1]),
        }
        history.append(summary)
        print(f"Lap {lap + 1}/{laps}: {n_labeled} labels, {n_pred} predictions"
              f" — next lap re-sorts by '{sort}'")
    return history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--laps", type=int, default=3)
    parser.add_argument("--sort", type=str, default="middle",
                        choices=list(SORT_OPTIONS))
    parser.add_argument("--clip_models", type=str, nargs="+", default=["all"])
    parser.add_argument("--crop_names", type=str, nargs="+",
                        default=["centre_crop", "subcrop2_0.1"])
    parser.add_argument("--use_img_stat_features", action="store_true")
    parser.add_argument("--model_name", type=str, default="loop_regressor")
    parser.add_argument("--models_dir", type=str, default="models")
    parser.add_argument("--n_epochs", type=int, default=60)
    parser.add_argument("--test_fraction", type=float, default=0.15)
    parser.add_argument("--hidden_sizes", type=int, nargs="+",
                        default=[264, 128, 64])
    parser.add_argument("--batch_size", type=int, default=512,
                        help="predict batch size")
    parser.add_argument("--backend", type=str, default="opencv",
                        choices=["opencv", "headless"])
    parser.add_argument("--keys", type=str, default="",
                        help="';'-separated per-lap key scripts for "
                        "--backend headless (each lap's keys comma-separated,"
                        " e.g. '3,7,q;9,1,q')")
    args = parser.parse_args(argv)

    cfg = TrainConfig(
        clip_models_to_use=tuple(args.clip_models),
        crop_names=tuple(args.crop_names),
        use_img_stat_features=args.use_img_stat_features,
        n_epochs=args.n_epochs,
        test_fraction=args.test_fraction,
        hidden_sizes=tuple(args.hidden_sizes),
        model_name=args.model_name,
    )
    backend_factory = None
    if args.backend == "headless":
        from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend

        scripts = [s.split(",") if s else ["quit"]
                   for s in args.keys.split(";")]

        def backend_factory(lap):
            keys = scripts[lap] if lap < len(scripts) else ["quit"]
            return HeadlessBackend([k if k != "q" else "quit" for k in keys])

    history = run_loop(
        args.root_dir, cfg, sort=args.sort, laps=args.laps,
        backend_factory=backend_factory, models_dir=args.models_dir,
        batch_size=args.batch_size,
    )
    print(f"Loop finished: {len(history)} laps, "
          f"{history[-1]['labels'] if history else 0} total labels.")


if __name__ == "__main__":
    main()
