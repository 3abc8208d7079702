"""Stage 1 — embed every image with CLIP: 4 crops + handcrafted stats.

TPU-native rework of _1_embed_with_CLIP.py: the host loader decodes onto fixed
canvases; ONE jitted program per batch does 4-crop extraction, resize,
normalization, the ViT forward, and the 22 image stats. Outputs go to both the
reference-compatible ``.pt`` sidecars (incremental per-model merge, skip-if-
already-embedded) and the columnar store that downstream stages stream from.

CLI mirrors the reference's flags (_1:186-197) plus TPU-specific knobs.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.config import ALL_CROPS, EmbedConfig
from clip_assisted_data_labeling_tpu.data.loader import BatchedImageLoader, find_images
from clip_assisted_data_labeling_tpu.models.encoders import create_encoder
from clip_assisted_data_labeling_tpu.ops.image_stats import (
    IMG_STAT_KEYS,
    image_stats_batch,
)
from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
from clip_assisted_data_labeling_tpu.store.sidecar import has_model_key, read_sidecar, write_sidecar
from clip_assisted_data_labeling_tpu.utils.timer import StageTimer

# how long non-zero hosts wait for host 0's published int8_static calibration
# (shared-FS multi-host runs; module-level so tests can shrink it)
CALIB_WAIT_S = 1800.0

log = logging.getLogger(__name__)


def _uuid_of(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _host_exact_stats(batch) -> np.ndarray:
    """Reference-exact img stats (host cv2) for --exact_stats runs. Images are
    re-decoded from disk at ORIGINAL resolution (the canvas copy may be
    pre-downscaled when larger than the canvas, which would skew the
    width/height/detail stats vs the reference)."""
    import cv2

    from clip_assisted_data_labeling_tpu.ops.image_stats import image_stats_reference

    out = np.zeros((batch.n_valid, len(IMG_STAT_KEYS)), np.float32)
    for i, path in enumerate(batch.paths):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        stats = image_stats_reference(img)
        out[i] = [stats[k] for k in IMG_STAT_KEYS]
    return out


def _sidecar_path(path: str) -> str:
    return os.path.splitext(path)[0] + ".pt"


def embed_dataset(root_dir: str, cfg: EmbedConfig) -> dict[str, EmbeddingStore | None]:
    """Run every requested model over the dataset. Returns per-model stores."""
    img_paths = find_images(root_dir)
    if cfg.shuffle_filenames:
        random.shuffle(img_paths)
    else:
        img_paths.sort()
    print(f"---> Found {len(img_paths)} images in {root_dir}")

    # the on-disk contract keys everything by basename uuid (sidecars, CSV DB);
    # colliding basenames across subdirectories would silently cross-contaminate
    # store rows, so drop duplicates loudly (stage-0 prep guarantees uniqueness).
    # This must run BEFORE host sharding so collisions can't hide on different
    # hosts' shards.
    seen: set[str] = set()
    unique_paths = []
    for p in img_paths:
        u = _uuid_of(p)
        if u in seen:
            log.warning(
                "Duplicate basename %r (%s) — skipping; uuid-rename the dataset "
                "with the prep stage to embed all copies", u, p,
            )
            continue
        seen.add(u)
        unique_paths.append(p)
    img_paths = unique_paths

    if cfg.host_count > 1:
        if not cfg.write_sidecars:
            raise ValueError(
                "--host_count > 1 requires sidecars (the per-shard results have "
                "no other output); drop --no_sidecars"
            )
        # multi-host scale-out: each host embeds a deterministic disjoint shard
        # of the (sorted) file list; sidecars are per-image so shards compose
        img_paths.sort()
        img_paths = img_paths[cfg.host_index :: cfg.host_count]
        print(
            f"Host shard {cfg.host_index}/{cfg.host_count}: {len(img_paths)} images"
        )

    stores: dict[str, EmbeddingStore | None] = {}
    for model_name in cfg.models_to_use:
        print(f"\n--- Processing model: {model_name} ---")
        stores[model_name] = _embed_one_model(root_dir, img_paths, model_name, cfg)
    return stores


def _embed_one_model(root_dir, img_paths, model_name, cfg: EmbedConfig):
    timer = StageTimer()

    # incremental skip: only embed images whose sidecar lacks this model's key
    # (reference _1:117-128); the check itself is parallelized
    if cfg.force_reencode:
        todo = list(img_paths)
        skipped = []
    else:
        with timer.time("skip_check", len(img_paths)):
            with ThreadPoolExecutor(cfg.num_workers) as pool:
                have = list(
                    pool.map(
                        lambda p: has_model_key(_sidecar_path(p), model_name), img_paths
                    )
                )
        todo = [p for p, h in zip(img_paths, have) if not h]
        skipped = [p for p, h in zip(img_paths, have) if h]
    print(f"Embedding {len(todo)} images ({len(skipped)} already embedded)")

    # int8_static calibration persistence (VERDICT r2 #3): default "auto" pins
    # the scales to one npz next to the dataset, so re-runs, different dataset
    # orders, and incremental resumes all embed bit-identically (an unpinned
    # calibration takes whichever batch happens to run first)
    calibration_path = None
    publish_calib = False  # host 0, empty todo: publish scales for the fleet
    if cfg.compute_dtype == "int8_static" and cfg.calibration != "none":
        from clip_assisted_data_labeling_tpu.models.encoders import calibration_file

        calibration_path = (
            calibration_file(model_name, root_dir)
            if cfg.calibration == "auto" else cfg.calibration
        )
        if cfg.host_count > 1 and not os.path.exists(calibration_path):
            # multi-host shards must embed with ONE set of static scales
            # (independent per-host calibrations would give each file shard
            # different quantization — violating the pinning contract this
            # file exists for). Host 0 calibrates and atomically publishes
            # the npz — from its first batch, or from an already-embedded
            # image when its todo shard is empty (an incremental run whose
            # only new images landed on OTHER shards still needs the scales
            # published); the others wait for it on the shared filesystem
            # this mode already assumes. A waiting host with no work of its
            # own skips the wait entirely (it never consumes the scales).
            if cfg.host_index == 0:
                # with a non-empty todo the first real batch calibrates
                # anyway; the explicit publish covers the empty-todo case
                publish_calib = bool(img_paths) and not todo
                if not img_paths:
                    print(
                        "WARNING: host 0 sees no images, so no calibration "
                        "will be published — other hosts with work will "
                        "time out; pass --calibration"
                    )
            elif todo:
                import time as _time

                print(f"Host {cfg.host_index}: waiting for host 0's "
                      f"calibration at {calibration_path} ...")
                deadline = _time.time() + CALIB_WAIT_S
                while not os.path.exists(calibration_path):
                    if _time.time() > deadline:
                        raise TimeoutError(
                            f"host 0 never published {calibration_path}"
                        )
                    _time.sleep(min(5.0, CALIB_WAIT_S / 10))

    compute = cfg.compute_dtype
    if cfg.aspect == "native" and compute.startswith("int8"):
        # same honest-downgrade contract as the conv-tower/unsupported-int8
        # cases in models/encoders.py: the masked variable-patch-grid path
        # has no int8 formulation, so the stage default (int8_static) must
        # not make --aspect native unusable
        print("--aspect native has no int8 formulation; running bfloat16 "
              "(pass --compute_dtype float32 for the strict-parity path)")
        compute = "bfloat16"
    encoder = create_encoder(
        model_name,
        model_path=cfg.model_path,
        # "int8"/"int8_static" are mode strings, not numpy dtypes
        compute_dtype=(compute if compute.startswith("int8")
                       else jnp.dtype(compute)),
        calibration_path=calibration_path,
    )

    # --aspect native: one extra embedding per image at its NATIVE aspect via
    # the naflex masked variable-patch-grid path (models/naflex.py), stored as
    # a fifth pseudo-crop "native_aspect" (VERDICT r4 #6: product entry point
    # for the variable-aspect capability). The reference has no analog — its
    # open_clip towers are fixed-square-resolution only.
    native_aspect = cfg.aspect == "native"
    if native_aspect and not getattr(encoder.cfg, "naflex", False):
        raise ValueError(
            f"--aspect native requires a naflex tower; {model_name} is "
            "fixed-resolution (use a '…-naflex' SigLIP2 model name)"
        )
    crop_names_out = list(cfg.crop_names) + (
        ["native_aspect"] if native_aspect else []
    )

    # data-parallel path: shard the batch over all visible devices
    import jax

    sharded = None
    batch_size = cfg.batch_size
    # DP shards over this host's LOCAL chips: on a multi-host run each process
    # embeds its own file shard as an independent program (merge via
    # 'pipeline.store rebuild'), so cross-host devices never enter this mesh
    if jax.local_device_count() > 1:
        from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        n_dev = jax.local_device_count()
        batch_size = ((cfg.batch_size + n_dev - 1) // n_dev) * n_dev
        sharded = ShardedEmbedder(
            encoder.params, encoder.cfg, mesh,
            compute_dtype=encoder.compute_dtype,  # int8 mode pre-quantizes params
            parity_preprocess=encoder.parity_preprocess,
            calibration_path=calibration_path,
            model_name=encoder.model_name,
        )
        print(f"Data-parallel embedding over {n_dev} devices (batch {batch_size})")

    if publish_calib:
        # host 0's todo shard is empty but the fleet needs the scales: run
        # the calibration forward on one already-embedded batch and publish
        print("Host 0: publishing calibration from an already-embedded batch")
        tiny = BatchedImageLoader(
            img_paths[:batch_size], canvas_size=cfg.canvas_size,
            out_size=encoder.img_resolution, batch_size=batch_size,
            num_workers=cfg.num_workers, crop_names=cfg.crop_names,
        )
        for batch in tiny:
            if sharded is not None:
                sharded.calibrate_static(batch.canvas, batch.crop_params)
            else:
                encoder.embed_crops(batch.canvas, batch.crop_params)
            break

    uuids_all = [_uuid_of(p) for p in img_paths]
    store = None
    if cfg.host_count > 1:
        # hosts share the filesystem: per-image sidecars compose across shards,
        # but the columnar store is one file — build it once afterwards with
        # EmbeddingStore.from_sidecars on any single host
        print(
            "Multi-host shard run: writing sidecars only; build the columnar "
            "store afterwards via EmbeddingStore.from_sidecars."
        )
    else:
        store = EmbeddingStore.create(
            root_dir,
            model_name,
            crop_names_out,
            encoder.embed_dim,
            uuids_all,
            with_stats=cfg.with_image_stats,
            rel_paths=[os.path.relpath(p, root_dir) for p in img_paths],
        )
    row_of = {u: i for i, u in enumerate(uuids_all)}

    loader = BatchedImageLoader(
        todo,
        canvas_size=cfg.canvas_size,
        out_size=encoder.img_resolution,
        batch_size=batch_size,
        num_workers=cfg.num_workers,
        crop_names=cfg.crop_names,
        bucketed=True,  # small-image batches ship on small canvases
        sort_by_size=True,  # size-homogeneous batches maximize bucket hits
    )

    def write_batch_sidecars(paths, emb_np, stats_arr):
        for bi, path in enumerate(paths):
            crop_embs = {
                crop: emb_np[bi, ci] for ci, crop in enumerate(crop_names_out)
            }
            img_stats = (
                dict(zip(IMG_STAT_KEYS, map(float, stats_arr[bi])))
                if stats_arr is not None
                else None
            )
            write_sidecar(
                _sidecar_path(path), model_name, crop_embs, img_stats,
                merge=not cfg.force_reencode,
            )

    device_stats = cfg.with_image_stats and not cfg.exact_stats

    def dispatch(batch):
        """Enqueue the batch's device work; returns device arrays (async)."""
        if sharded is not None:
            if encoder.static_quant:
                # one extra (pure-XLA) forward on the first batch, then no-op
                sharded.calibrate_static(batch.canvas, batch.crop_params)
            if device_stats:
                return sharded.embed(batch.canvas, batch.crop_params, batch.stat_params)
            return sharded.embed(batch.canvas, batch.crop_params), None
        emb_dev = encoder.embed_crops(batch.canvas, batch.crop_params)
        stats_dev = (
            image_stats_batch(batch.canvas, batch.stat_params) if device_stats else None
        )
        return emb_dev, stats_dev

    n_done = 0
    writer_futures = []
    with ThreadPoolExecutor(max(2, cfg.num_workers // 2)) as writer_pool:

        def consume(batch, emb_dev, stats_dev):
            nonlocal n_done
            with timer.time("device", batch.n_valid):
                emb = np.asarray(emb_dev)[: batch.n_valid]
                if native_aspect:
                    # slice each image's original-aspect pixels back off its
                    # centered canvas (stat_params = [ox, oy, w, h, …]) and
                    # run the masked variable-grid forward
                    imgs = []
                    for bi in range(batch.n_valid):
                        ox, oy, w, h = (
                            int(v) for v in batch.stat_params[bi, :4]
                        )
                        imgs.append(batch.canvas[bi, oy:oy + h, ox:ox + w])
                    nat = np.asarray(encoder.encode_variable(imgs), np.float32)
                    emb = np.concatenate([emb, nat[:, None, :]], axis=1)
                stats_np = (
                    np.asarray(stats_dev)[: batch.n_valid]
                    if stats_dev is not None
                    else None
                )
            if cfg.with_image_stats and cfg.exact_stats:
                with timer.time("exact_stats", batch.n_valid):
                    stats_np = _host_exact_stats(batch)

            if store is not None:
                with timer.time("store_write", batch.n_valid):
                    for bi, path in enumerate(batch.paths):
                        store.write_rows(
                            row_of[_uuid_of(path)],
                            emb[bi : bi + 1],
                            None if stats_np is None else stats_np[bi : bi + 1],
                        )
            if cfg.write_sidecars:
                writer_futures.append(
                    writer_pool.submit(write_batch_sidecars, batch.paths, emb, stats_np)
                )
            n_done += batch.n_valid
            if n_done and n_done % 1000 < cfg.batch_size:
                print(f"Processed {n_done}/{len(todo)} images")

        # depth-2 software pipeline: dispatch batch i+1 (host→device transfer +
        # compute enqueue) before blocking on batch i's results, so transfer,
        # compute, and host-side writes overlap
        import collections

        pending: collections.deque = collections.deque()
        for batch in loader:
            pending.append((batch, *dispatch(batch)))
            if len(pending) > 1:
                consume(*pending.popleft())
        while pending:
            consume(*pending.popleft())

    # surface any sidecar-write failure: the .pt files are the interop contract,
    # so a silent partial write would corrupt downstream stages
    write_errors = [f.exception() for f in writer_futures if f.exception() is not None]
    if write_errors:
        raise RuntimeError(
            f"{len(write_errors)} sidecar write batches failed; first error: "
            f"{write_errors[0]!r}"
        )

    # backfill store rows for already-embedded images from their sidecars
    # (crop names resolve through the alias map so reference-written sidecars
    # with plain "subcrop1"/"subcrop2" keys backfill too)
    from clip_assisted_data_labeling_tpu.store.sidecar import resolve_crop_key

    for path in skipped if store is not None else []:
        try:
            d = read_sidecar(_sidecar_path(path))[model_name]
            keys = [resolve_crop_key(d, c) for c in store.meta["crop_names"]]
            if any(k is None for k in keys):
                raise KeyError(
                    f"missing crops {[c for c, k in zip(store.meta['crop_names'], keys) if k is None]}"
                )
            emb = np.stack([np.asarray(d[k], np.float32).reshape(-1) for k in keys])
            stats = (
                np.asarray([float(d[k]) for k in IMG_STAT_KEYS if k in d], np.float32)
                if cfg.with_image_stats
                else None
            )
            if stats is not None and len(stats) != len(IMG_STAT_KEYS):
                stats = None
            store.write_rows(
                row_of[_uuid_of(path)], emb[None],
                None if stats is None else stats[None],
            )
        except Exception as e:  # keep going; row stays invalid
            log.warning("Could not backfill %s: %s", path, e)
            store.valid[row_of[_uuid_of(path)]] = False
    if store is not None:
        for path in loader.skipped:
            store.valid[row_of[_uuid_of(path)]] = False
        store.flush()

    print("\n--- Feature encoding done! ---")
    print(f"Embedded {n_done} images ({len(skipped)} already embedded); model key '{model_name}'")
    print(timer.report())
    return store


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True,
                        help="Root directory of the dataset (can contain subdirectories)")
    parser.add_argument("--models_to_use", type=str, nargs="+",
                        default=["ViT-L-14-336/openai"],
                        help="CLIP (Arch/pretrained) or PE (PE-…) models to use")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--force_reencode", action="store_true")
    parser.add_argument("--model_path", type=str, default=None,
                        help="Local directory with model weights (.npz or torch)")
    parser.add_argument("--canvas_size", type=int, default=1024)
    parser.add_argument("--compute_dtype", type=str, default="int8_static",
                        choices=["bfloat16", "float32", "int8", "int8_static"],
                        help="int8_static (default) = W8A8 with fixed "
                        "activation scales calibrated on the first batch and "
                        "pinned to <root_dir>/<model>.calib.npz (fastest; "
                        "cosine ~1e-4 vs f32 on the trained-weights harness); "
                        "int8 = dynamic quantization (no calibration file, "
                        "cosine ~1e-3); bfloat16/float32 = strict-parity paths")
    parser.add_argument("--no_sidecars", action="store_true",
                        help="Skip per-image .pt sidecars (columnar store only)")
    parser.add_argument("--no_image_stats", action="store_true")
    parser.add_argument("--exact_stats", action="store_true",
                        help="compute img_stat_* on host with cv2 "
                        "(reference-exact values; slower)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Write a jax.profiler trace of the run here")
    parser.add_argument("--host_index", type=int, default=0,
                        help="multi-host runs: this host's index in [0, host_count)")
    parser.add_argument("--host_count", type=int, default=1,
                        help="multi-host runs: total hosts; each embeds a "
                        "deterministic disjoint shard of the file list")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (coordinator from "
                        "--coordinator_address or $COORDINATOR_ADDRESS) and "
                        "derive --host_index/--host_count from the process "
                        "rank; run one launch per host, then merge with "
                        "'pipeline.store rebuild'")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for --distributed")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--debug_nans", action="store_true",
                        help="trap NaNs in device computations (jax_debug_nans)")
    parser.add_argument("--aspect", type=str, default="square",
                        choices=["square", "native"],
                        help="'native' (naflex towers, bfloat16/float32 only): "
                        "also embed each image at its native aspect ratio via "
                        "the masked variable-patch-grid path, stored as a "
                        "fifth pseudo-crop 'native_aspect'")
    parser.add_argument("--calibration", type=str, default="auto",
                        help="int8_static activation-scale persistence: 'auto' "
                        "(default) pins scales to <root_dir>/<model>.calib.npz "
                        "— loaded when present, saved after first-batch "
                        "calibration, so embeddings are dataset-order- and "
                        "resume-independent; 'none' keeps them in-memory; any "
                        "other value is an explicit npz path")
    args = parser.parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.distributed:
        from clip_assisted_data_labeling_tpu.parallel.mesh import multihost_init

        args.host_index, args.host_count = multihost_init(
            args.coordinator_address, args.num_processes, args.process_id
        )
        print(f"jax.distributed up: host {args.host_index}/{args.host_count}")

    cfg = EmbedConfig(
        models_to_use=args.models_to_use,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        force_reencode=args.force_reencode,
        model_path=args.model_path,
        crop_names=ALL_CROPS,
        canvas_size=args.canvas_size,
        compute_dtype=args.compute_dtype,
        with_image_stats=not args.no_image_stats,
        exact_stats=args.exact_stats,
        host_index=args.host_index,
        host_count=args.host_count,
        write_sidecars=not args.no_sidecars,
        calibration=args.calibration,
        aspect=args.aspect,
    )
    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            embed_dataset(args.root_dir, cfg)
    else:
        embed_dataset(args.root_dir, cfg)


if __name__ == "__main__":
    main()
