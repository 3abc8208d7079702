"""One-chain large-N measurements (VERDICT r3 #5): replace per-part
composition arithmetic with single measured runs.

Mode A — ``--predict1m [N]``: ONE predict-stage run over an N-row (default
1M) synthetic store, driven through the real ``pipeline.predict`` CLI main
with per-phase wall-clock (feature assembly / device inference / DB merge /
CSV save / histogram) captured by wrapping the stage's own entry points.
The store is synthetic (zero egress: no 1M real embeddings exist here) but
every byte flows the production path: fp16 memmap store -> vectorized batch
assembly -> fp16 device wire -> outer-merge -> histogram.

Mode B — ``--chain [N]``: N real JPEGs (default 100k, written by this
script) through embed -> dedup -> train -> predict as ONE process / one
chip grant, timing each stage CLI exactly as a user would run it.
Matches BASELINE.md's "1M images < 15 min on v5e-8" target shape: this is
the measured single-chip chain those projections compose from.

Timing convention (CLAUDE.md): host fetches synchronize; stage boundaries
are process wall-clock, so host decode / IO / tunnel H2D are all included.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_LABELED = 2000
TRAIN_ARGS = ["--test_fraction", "0.2", "--n_epochs", "30", "--batch_size",
              "64", "--hidden_sizes", "264", "128", "64"]


def _plant_labels(root: str, uuids: list[str], rng) -> None:
    """Synthetic labels for the first N_LABELED uuids (labeling is the one
    interactive stage; its cost is human, not machine)."""
    from clip_assisted_data_labeling_tpu.store.database import LabelDatabase

    db = LabelDatabase.load_or_create(root)
    db.ensure_rows(uuids)
    sel = uuids[:N_LABELED]
    for u, v in zip(sel, rng.random(len(sel))):
        db.relabel(u, round(float(v), 2))
    db.save()


def _train(data_dir: str, name: str, model_name: str,
           extra: tuple = ()) -> str:
    from clip_assisted_data_labeling_tpu.pipeline import train

    train.main(["--train_data_dir", data_dir, "--train_data_names", name,
                "--model_name", model_name, *TRAIN_ARGS, *extra])
    cands = sorted(
        (f for f in os.listdir("models") if f.startswith(model_name)),
        key=lambda f: os.path.getmtime(os.path.join("models", f)),
    )
    return os.path.join("models", cands[-1])


def predict_1m(n: int, batch_size: int) -> None:
    from clip_assisted_data_labeling_tpu.pipeline import predict as P
    from clip_assisted_data_labeling_tpu.models.regressor import SimpleFCRegressor
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
    from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
    from clip_assisted_data_labeling_tpu.utils import plots

    base = f"/tmp/chain_predict_{n}"
    root = os.path.join(base, "imgs")
    model = "ViT-L-14/openai"
    crops = ["centre_crop", "square_padded_crop"]
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    os.makedirs(root, exist_ok=True)
    uuids = [f"u{i:012d}" for i in range(n)]
    if not os.path.exists(os.path.join(root, uuids[-1] + ".jpg")):
        for u in uuids:  # the stage enumerates *.jpg — bodies never read
            open(os.path.join(root, u + ".jpg"), "a").close()
    print(f"[setup] {n} uuid files: {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    if EmbeddingStore.exists(root, model):  # re-measure runs reuse the store
        print(f"[setup] reusing existing {n}-row store", flush=True)
    else:
        store = EmbeddingStore.create(root, model, crops, 768, uuids,
                                      dtype="float16", with_stats=True)
        for s in range(0, n, 65536):
            m = min(65536, n - s)
            emb = rng.normal(0, 1, (m, len(crops), 768)).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
            store.write_rows(s, emb, stats=rng.random((m, 22), np.float32) * 4)
        store.flush()
        print(f"[setup] {n}x{len(crops)}x768 fp16 store: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    existing = sorted(
        (f for f in os.listdir("models") if f.startswith(f"chain1m_{n}_")),
        key=lambda f: os.path.getmtime(os.path.join("models", f)),
    ) if os.path.isdir("models") else []
    if existing:
        model_path = os.path.join("models", existing[-1])
        print(f"[train] reusing {model_path}", flush=True)
    else:
        _plant_labels(root, uuids, rng)
        t0 = time.perf_counter()
        model_path = _train(base, "imgs", f"chain1m_{n}",
                            extra=("--crop_names", *crops))
        print(f"[train] {N_LABELED} rows, 30 epochs: "
              f"{time.perf_counter() - t0:.1f}s -> {model_path}", flush=True)

    # phase instrumentation: wrap the stage's own calls, run the real CLI
    phases: dict[str, float] = {}

    def timed(obj, attr, key):
        fn = getattr(obj, attr)

        def wrap(*a, **k):
            t = time.perf_counter()
            r = fn(*a, **k)
            phases[key] = phases.get(key, 0.0) + time.perf_counter() - t
            return r

        setattr(obj, attr, wrap)
        return fn

    origs = [
        (P, "_gather_features", timed(P, "_gather_features", "assemble")),
        (SimpleFCRegressor, "predict",
         timed(SimpleFCRegressor, "predict", "device")),
        (LabelDatabase, "merge_predictions",
         timed(LabelDatabase, "merge_predictions", "db_merge")),
        (LabelDatabase, "save", timed(LabelDatabase, "save", "csv_save")),
        (plots, "plot_label_distribution",
         timed(plots, "plot_label_distribution", "histogram")),
    ]
    try:
        t0 = time.perf_counter()
        P.main(["--root_dir", root, "--model_file", model_path,
                "--batch_size", str(batch_size), "--copy_imgs_fraction", "0"])
        total = time.perf_counter() - t0
    finally:
        for obj, attr, fn in origs:
            setattr(obj, attr, fn)
    phases["other(listdir+load)"] = total - sum(phases.values())
    print(json.dumps({
        "bench": "predict_one_run", "rows": n, "batch_size": batch_size,
        "wire": "float16", "total_s": round(total, 1),
        "rows_per_sec": round(n / total, 1),
        "phases_s": {k: round(v, 1) for k, v in phases.items()},
    }), flush=True)


def chain(n: int, model: str, batch: int) -> None:
    from PIL import Image

    from clip_assisted_data_labeling_tpu.pipeline import dedup as D
    from clip_assisted_data_labeling_tpu.pipeline import embed as E
    from clip_assisted_data_labeling_tpu.pipeline import predict as P

    base = f"/tmp/chain_e2e_{n}"
    root = os.path.join(base, "imgs")
    rng = np.random.default_rng(1)

    t0 = time.perf_counter()
    os.makedirs(root, exist_ok=True)
    uuids = [f"c{i:012d}" for i in range(n)]
    if not os.path.exists(os.path.join(root, uuids[-1] + ".jpg")):
        arr = None
        for i, u in enumerate(uuids):
            # every 5000th image re-saves the previous one at a different
            # JPEG quality: a planted near-duplicate for the dedup stage
            if not (i % 5000 == 1 and arr is not None):
                h = int(rng.integers(96, 192))
                arr = rng.integers(0, 256, (h, 160, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, u + ".jpg"),
                                      quality=90 if i % 5000 != 1 else 80)
    print(f"[setup] {n} JPEGs: {time.perf_counter() - t0:.1f}s", flush=True)

    stage_s: dict[str, float] = {}

    def run(key, fn, *argv):
        t = time.perf_counter()
        fn(list(argv))
        stage_s[key] = round(time.perf_counter() - t, 1)
        print(f"[chain] {key}: {stage_s[key]}s", flush=True)

    run("embed", E.main, "--root_dir", root, "--models_to_use", model,
        "--batch_size", str(batch))
    # --test (dry-run) + a tight threshold: random-INIT weights embed noise
    # images into a narrow cone (any pair can read cos >0.96), so a real
    # move would gut the dataset before predict; the similarity compute —
    # the part being measured — is identical either way
    run("dedup", D.main, "--root_dir", root, "--mode", "move",
        "--threshold", "0.999", "--test")
    _plant_labels(root, uuids, rng)  # untimed: interactive stage stand-in
    t0 = time.perf_counter()
    model_path = _train(base, "imgs", f"chain_{n}")
    stage_s["train"] = round(time.perf_counter() - t0, 1)
    print(f"[chain] train: {stage_s['train']}s", flush=True)
    run("predict", P.main, "--root_dir", root, "--model_file", model_path,
        "--batch_size", "65536", "--copy_imgs_fraction", "0")

    total = sum(stage_s.values())
    print(json.dumps({
        "bench": "chain_one_run", "images": n, "model": model,
        "stages_s": stage_s, "total_s": round(total, 1),
        "imgs_per_sec_chain": round(n / total, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--predict1m", nargs="?", const=1_000_000, type=int,
                    default=None, metavar="N")
    ap.add_argument("--chain", nargs="?", const=100_000, type=int,
                    default=None, metavar="N")
    ap.add_argument("--model", default="ViT-L-14/openai")
    ap.add_argument("--batch_size", type=int, default=40)
    ap.add_argument("--predict_batch", type=int, default=65536)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    if args.predict1m:
        predict_1m(args.predict1m, args.predict_batch)
    if args.chain:
        chain(args.chain, args.model, args.batch_size)
    if not args.predict1m and not args.chain:
        print("nothing to do: pass --predict1m [N] and/or --chain [N]")


if __name__ == "__main__":
    main()
