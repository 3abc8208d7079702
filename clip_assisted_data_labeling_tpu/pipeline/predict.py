"""Stage 5 — predict labels for all images with a trained regressor.

TPU-native rework of _5_predict_labels.py: feature assembly streams from the
columnar store when present (one memmap read instead of N torch.loads), inference
is one jitted batched forward, and all the reference's side effects are kept:
outer-merge into the CSV DB, ``predicted_label`` writeback into per-image
``.json`` sidecars, optional score-prefixed preview copies, periodic CSV flushes,
and the final label-distribution histogram.

Model files: our ``.npz`` checkpoints or the reference's ``.pth`` module pickles
(both self-describe their CLIP models + crops); fuzzy substring lookup in
``models/`` matches the reference's find_model (_5:48-56).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np

from clip_assisted_data_labeling_tpu.models.regressor import SimpleFCRegressor
from clip_assisted_data_labeling_tpu.store.columnar import (
    EmbeddingStore,
    assemble_batch_from_stores,
)
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.store.sidecar import assemble_features, read_sidecar
from clip_assisted_data_labeling_tpu.utils import plots


def find_model(model_name: str, model_dir: str = "models") -> str | None:
    """Exact path, else substring lookup in model_dir (reference _5:48-56).

    Divergence from the reference: among multiple matches the NEWEST checkpoint
    wins (the reference returned the first directory-listing hit, silently
    predicting with a stale model after retraining)."""
    if os.path.isfile(model_name):
        return model_name
    if not os.path.isdir(model_dir):
        return None
    matches = [
        os.path.join(model_dir, f) for f in os.listdir(model_dir) if model_name in f
    ]
    if not matches:
        return None
    return max(matches, key=os.path.getmtime)


def load_model(path: str) -> SimpleFCRegressor:
    if path.endswith(".npz"):
        return SimpleFCRegressor.load(path)
    return SimpleFCRegressor.load_torch_pickle(path)


_UNSET = object()


def _open_feature_stores(root_dir: str, model: SimpleFCRegressor):
    """Open every columnar store the model needs ONCE (each open builds a
    uuid index — O(dataset) work that must not repeat per chunk). Returns the
    store dict, or None when any model lacks a store (sidecar fallback)."""
    clip_models = list(model.meta.clip_models)
    stores = {}
    for m in clip_models:
        if EmbeddingStore.exists(root_dir, m):
            stores[m] = EmbeddingStore.open(root_dir, m)
    if len(stores) != len(clip_models):
        return None
    if model.meta.use_img_stat_features:
        missing = [m for m, s in stores.items() if s.img_stats is None]
        if missing:
            # fail ONCE and loudly: per-uuid skipping would finish the run
            # "successfully" with zero predictions
            raise ValueError(
                f"model needs img_stat features but store(s) {missing} have "
                "none — re-embed without --no_image_stats"
            )
    return stores


def _gather_features(root_dir: str, uuids: list[str], model: SimpleFCRegressor,
                     stores=_UNSET):
    """Returns (kept_uuids, features[N,F]). Prefers the columnar store."""
    clip_models = list(model.meta.clip_models)
    crop_names = list(model.meta.crop_names)
    if stores is _UNSET:
        stores = _open_feature_stores(root_dir, model)

    if stores is not None:
        # vectorized batch gather (~13x the per-uuid loop on a warm store —
        # the host-side bound of a production 1M-row predict)
        keep, feats = assemble_batch_from_stores(
            stores, clip_models, crop_names,
            model.meta.use_img_stat_features, uuids,
        )
        for uuid, ok in zip(uuids, keep):
            if not ok:
                print(f"WARNING: {uuid} missing or invalid in the store(s), "
                      "skipping this sample..")
        return [u for u, ok in zip(uuids, keep) if ok], feats

    kept, feats = [], []
    for uuid in uuids:
        try:
            sidecar = read_sidecar(os.path.join(root_dir, uuid + ".pt"))
            feats.append(
                assemble_features(
                    sidecar, clip_models, crop_names,
                    model.meta.use_img_stat_features,
                )
            )
            kept.append(uuid)
        except Exception as e:
            print(f"WARNING: {e} for {uuid}, skipping this sample..")
    if not feats:
        return [], np.zeros((0, model.meta.input_size), np.float32)
    return kept, np.stack(feats).astype(np.float32)


# rows per assembly chunk: big enough that the vectorized store gather runs at
# full speed and the device sees full batches, small enough that the feature
# matrix never materializes whole (1M × 1536 f32 = 6 GB; one chunk is ~400 MB)
ASSEMBLE_CHUNK = 65536


def _prefetched_chunks(root_dir, uuids, model, stores, chunk: int):
    """Yield per-chunk (kept_uuids, features) with the NEXT chunk assembling
    on a background thread while the caller runs device inference on the
    current one. The measured 1M-row predict splits ~50/50 between host
    assembly (218.6 s) and device batches (185.5 s, BENCH_NOTES round-9),
    and the device phase is dominated by transfer WAIT (not CPU), so the
    prefetch wins even on a ONE-core host: the interleaved A/B
    (benchmarks/ab_predict_overlap.py, BENCH_NOTES round-9) measured
    200k rows in 34.3/33.3 s overlapped vs 54.9/43.9 s sequential on the
    1-core VM. (A naive time-separated comparison first suggested the
    opposite — the tunnel's H2D rate drifts >4x between runs; only the
    interleaved A/B is trustworthy.)
    maxsize=1 bounds live memory to ~3 chunks (assembling + queued + in use)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=1)

    def worker():
        try:
            for s in range(0, len(uuids), chunk):
                q.put((None, _gather_features(
                    root_dir, uuids[s : s + chunk], model, stores)))
        except BaseException as e:  # surface in the consumer, never hang it
            q.put((e, None))
        else:
            q.put((None, None))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        err, item = q.get()
        if err is not None:
            raise err
        if item is None:
            return
        yield item


def predict_labels(
    root_dir: str,
    model_file: str,
    batch_size: int = 512,
    copy_imgs_fraction: float = 0.01,
    seed: int = 0,
    wire: str = "float16",
    sharded: bool = False,
) -> int:
    model_path = find_model(model_file)
    if model_path is None:
        raise FileNotFoundError(f"could not find model file {model_file}")
    model = load_model(model_path)
    print(f"Loaded regression model trained on CLIP models: {list(model.meta.clip_models)}")

    db = LabelDatabase.load_or_create(root_dir)
    uuids = [
        os.path.splitext(f)[0] for f in os.listdir(root_dir) if f.endswith(".jpg")
    ]
    print(f"Predicting labels for up to {len(uuids)} images...")
    stores = _open_feature_stores(root_dir, model)

    all_scores = None
    if sharded:
        # DP over all local devices (parallel/predict_sharded.py): one sharded
        # pass up front, then the per-batch side-effect loop indexes into it
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh
        from clip_assisted_data_labeling_tpu.parallel.predict_sharded import (
            predict_sharded,
        )

        kept, feats = _gather_features(root_dir, uuids, model, stores)
        if not kept:
            return 0
        all_scores = predict_sharded(model.params, feats, get_mesh(), wire=wire,
                                     class_values=model.meta.class_values)
        chunks = iter([(kept, feats)])
    else:
        # chunked assembly bounds live memory at any N, and the next chunk
        # assembles WHILE the device runs the current one — the two dominant,
        # ~equal phases of a large-N run overlap (measured +28-60% end-to-end
        # even on a 1-core host; see _prefetched_chunks)
        chunks = _prefetched_chunks(root_dir, uuids, model, stores,
                                    max(batch_size, ASSEMBLE_CHUNK))

    output_dir = root_dir.rstrip("/") + "_predicted_scores"
    rng = np.random.default_rng(seed)
    n_flushed = 0
    batch_no = 0
    last_save = time.monotonic()
    for kept, feats in chunks:
        if not kept:
            continue
        # bulk row registration per chunk so the per-batch merges below are
        # pure in-place updates (no per-batch frame concat on a fresh dataset)
        db.ensure_rows(kept)
        for start in range(0, len(kept), batch_size):
            batch_uuids = kept[start : start + batch_size]
            if all_scores is not None:
                scores = all_scores[start : start + batch_size]
            else:
                scores = model.predict(feats[start : start + batch_size],
                                       wire=wire)
            db.merge_predictions(batch_uuids, scores)

            # predicted_label writeback into .json sidecars (ref _5:159-167)
            for uuid, score in zip(batch_uuids, scores):
                jpath = os.path.join(root_dir, uuid + ".json")
                if os.path.exists(jpath):
                    try:
                        with open(jpath) as f:
                            data = json.load(f)
                        data["predicted_label"] = float(score)
                        with open(jpath, "w") as f:
                            json.dump(data, f)
                    except Exception as e:
                        print(f"WARNING: could not update {jpath}: {e}")

            if copy_imgs_fraction > 0:  # preview copies (reference _5:170-177)
                os.makedirs(output_dir, exist_ok=True)
                pick = rng.random(len(batch_uuids)) < copy_imgs_fraction
                for uuid, score, take in zip(batch_uuids, scores, pick):
                    if take:
                        src = os.path.join(root_dir, uuid + ".jpg")
                        if os.path.exists(src):
                            shutil.copy(
                                src,
                                os.path.join(output_dir,
                                             f"{score:.3f}_{uuid}.jpg"),
                            )

            # periodic crash-safety flush (reference _5:179-180),
            # time-throttled: a full-CSV rewrite per 10 batches is O(N) each
            # and would cost ~an hour of pure CSV IO over a 1M-row run
            if batch_no % 10 == 9 and time.monotonic() - last_save > 30:
                db.save()
                last_save = time.monotonic()
            batch_no += 1
            n_flushed += len(batch_uuids)

    if n_flushed == 0:
        return 0
    db.save()
    plots.plot_label_distribution(db.df["predicted_label"].values, root_dir)
    print(f"{n_flushed} of {len(uuids)} imgs predicted.")
    mean = np.nanmean(db.df["predicted_label"].astype(float).values)
    print(f"Average predicted label: {mean:.3f}")
    print(f"Database saved at {db.path}")
    return n_flushed


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--model_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--copy_imgs_fraction", type=float, default=0.01)
    parser.add_argument("--num_workers", type=int, default=4,
                        help="accepted for reference-CLI compatibility")
    parser.add_argument("--wire", default="float16",
                        choices=["float16", "float32", "int8"],
                        help="host->device format for the feature matrix; "
                        "the fp16 default halves the H2D transfer this stage "
                        "is bound by (scores move <~1e-4); int8 halves it "
                        "again via per-row quantization (scores move ~1e-3 — "
                        "opt-in for thin links); f32 is the exact wire")
    parser.add_argument("--sharded", action="store_true",
                        help="shard inference over all local devices "
                        "(data-parallel; single device runs unchanged)")
    args = parser.parse_args(argv)

    # recursively apply to all subdirectories holding jpgs (reference _5:204-210)
    for root, _dirs, files in os.walk(args.root_dir):
        if any(f.endswith(".jpg") for f in files) and "_predicted_scores" not in root:
            print(f"\nPredicting labels for {root}...")
            predict_labels(
                root, args.model_file, args.batch_size, args.copy_imgs_fraction,
                wire=args.wire, sharded=args.sharded,
            )


if __name__ == "__main__":
    main()
