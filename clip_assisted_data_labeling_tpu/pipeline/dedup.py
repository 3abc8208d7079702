"""Stage 2 — near-duplicate removal via all-pairs cosine similarity.

TPU-native rework of _2_remove_duplicates.py. The reference loads every ``.pt``
sidecar, builds a full N×N matrix on one GPU, and therefore (a) caps a pass at
~10k images and (b) only finds duplicates *within* a chunk/subdir (README.md:70-71).
Here embeddings stream from the columnar store (sidecar fallback), the similarity
runs tiled on-device (ops/similarity.py) or ring-sharded over the mesh
(parallel/dedup_sharded.py), and the WHOLE dataset is searched in one global pass
— no chunk boundaries, no missed cross-chunk pairs.

File handling replicates the reference: above-threshold pairs send the *target*
file-group (all extensions sharing the basename) to a sibling
``near_duplicates_{sim}_{thr}`` dir with ``{sim:.3f}_{idx:08d}_`` prefixes; copy
mode also copies the source group; ``--test`` dry-runs.
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from clip_assisted_data_labeling_tpu.config import DedupConfig
from clip_assisted_data_labeling_tpu.ops.similarity import DedupResult, find_duplicate_pairs
from clip_assisted_data_labeling_tpu.store.columnar import (
    EmbeddingStore,
    list_models,
)
from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar, resolve_crop_key


def load_embeddings(root_dir: str, cfg: DedupConfig):
    """(paths, embeddings [N, D]) for the dedup crop. Store-first, sidecars second."""
    model = cfg.clip_model_to_use
    if model is None:
        names = list_models(root_dir)
        if names:
            model = names[0]
            print(f"----> clip_model_to_use not specified, using store: {model}")
    if model is not None and EmbeddingStore.exists(root_dir, model):
        store = EmbeddingStore.open(root_dir, model)
        ci = store.crop_index(cfg.crop_to_use)
        valid = np.asarray(store.valid)
        emb = np.asarray(store.embeddings[:, ci], np.float32)[valid]
        paths = [
            os.path.join(root_dir, rel)
            for rel, v in zip(store.rel_paths(), valid)
            if v
        ]
        return paths, emb

    # sidecar fallback (reference-embedded datasets, _2:8-49 semantics)
    paths, embs = [], []
    for sub, _dirs, files in os.walk(root_dir):
        stems = {}
        for f in files:
            stem, ext = os.path.splitext(f)
            stems.setdefault(stem, set()).add(ext)
        for stem, exts in sorted(stems.items()):
            if ".jpg" not in exts or ".pt" not in exts:
                continue
            try:
                d = read_sidecar(os.path.join(sub, stem + ".pt"))
                if model is None:
                    model = next(iter(d.keys()))
                    print(f"----> clip_model_to_use not specified, defaulting to: {model}")
                feats = d[model]
                key = resolve_crop_key(feats, cfg.crop_to_use)
                if key is None:
                    continue
                embs.append(np.asarray(feats[key], np.float32).reshape(-1))
                paths.append(os.path.join(sub, stem + ".jpg"))
            except Exception:
                continue
    return paths, (np.stack(embs) if embs else np.zeros((0, 1), np.float32))


def fix_duplicate(index: int, pair_paths, outdir: str, sim_value: float, mode: str,
                  group_lookup=None):
    """Move/copy the file groups of a duplicate pair (reference _2:102-125).

    Divergences from the reference (PARITY #7): a file group is the EXACT
    basename stem (the prep contract: ``uuid.ext`` sidecar families), where
    the reference substring-matched ``stem in f`` — which on un-prepped
    datasets also swept unrelated files whose names merely contain the stem
    (``img_1`` matches ``img_10.jpg``). ``group_lookup`` (dirname → stem →
    files, built once by run_dedup) replaces the reference's per-pair
    ``os.listdir`` — O(pairs × dir size) over a big run; the ``exists``
    guard below keeps a cached listing safe once move-mode renames begin."""
    for role, path in zip(("source", "target"), pair_paths):
        dirname = os.path.dirname(path)
        stem = os.path.splitext(os.path.basename(path))[0]
        if group_lookup is not None:
            group = group_lookup(dirname).get(stem, [])
        else:
            try:
                group = [f for f in os.listdir(dirname)
                         if os.path.splitext(f)[0] == stem]
            except FileNotFoundError:
                continue
        for f in group:
            src = os.path.join(dirname, f)
            dst = os.path.join(outdir, f"{sim_value:.3f}_{index:08d}_{role}_{f}")
            if mode == "copy":
                shutil.copy(src, dst)
            elif mode == "move" and role == "target" and os.path.exists(src):
                os.rename(src, dst)


def run_dedup(root_dir: str, cfg: DedupConfig, use_mesh: bool | None = None,
              global_mesh: bool = False) -> DedupResult:
    """``global_mesh=True`` rings the similarity over EVERY host's devices —
    all processes must call this simultaneously with jax.distributed up (the
    multi-host recipe: embed per-host shards → 'store rebuild' → this); file
    moves then happen on process 0 only."""
    paths, emb = load_embeddings(root_dir, cfg)
    print(f"Loaded {len(paths)} embeddings, computing similarities..")
    if len(paths) < 2:
        return DedupResult(*(np.empty(0, np.int64),) * 2, np.empty(0, np.float32),
                           np.empty(0, np.int64))

    import jax

    if use_mesh is None:
        use_mesh = global_mesh or jax.local_device_count() > 1
    if use_mesh:
        from clip_assisted_data_labeling_tpu.parallel import (
            find_duplicate_pairs_sharded,
            get_mesh,
        )
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_global_mesh

        result = find_duplicate_pairs_sharded(
            emb, threshold=cfg.threshold, sim_type=cfg.sim_type,
            mesh=get_global_mesh() if global_mesh else get_mesh(),
            max_per_row=cfg.max_pairs_per_row, wire=cfg.wire,
        )
    else:
        result = find_duplicate_pairs(
            emb, threshold=cfg.threshold, sim_type=cfg.sim_type,
            max_per_row=cfg.max_pairs_per_row, wire=cfg.wire,
        )
    if result.overflow_rows.size:
        print(
            f"Note: {len(result.overflow_rows)} rows had more matches than the "
            f"configured per-row capacity ({cfg.max_pairs_per_row}); extraction "
            "capacity was escalated automatically to fit, all pairs recovered."
        )

    print(f"Found {len(result.rows)} duplicates!")
    if global_mesh:
        import jax

        if jax.process_index() != 0:
            return result  # every process computed the pairs; rank 0 moves files
    if len(result.rows) and not cfg.test:
        output_dir = os.path.join(
            os.path.dirname(root_dir.rstrip("/")),
            f"near_duplicates_{cfg.sim_type}_{cfg.threshold}",
        )
        os.makedirs(output_dir, exist_ok=True)
        verb = "copying" if cfg.mode == "copy" else "moving"
        print(f"{verb} {len(result.rows)} near duplicates to {output_dir}...")
        listing_cache: dict[str, dict[str, list[str]]] = {}

        def group_lookup(dirname: str) -> dict[str, list[str]]:
            if dirname not in listing_cache:
                groups: dict[str, list[str]] = {}
                try:
                    for f in os.listdir(dirname):
                        groups.setdefault(os.path.splitext(f)[0], []).append(f)
                except FileNotFoundError:
                    pass
                listing_cache[dirname] = groups
            return listing_cache[dirname]

        moved_targets = set()
        for idx, (i, j, sim) in enumerate(result.pairs()):
            if cfg.mode == "move" and j in moved_targets:
                continue
            fix_duplicate(idx, (paths[i], paths[j]), output_dir, sim, cfg.mode,
                          group_lookup=group_lookup)
            moved_targets.add(j)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=0.96)
    parser.add_argument("--mode", type=str, default="copy", choices=["copy", "move"])
    parser.add_argument("--sim_type", type=str, default="cosine",
                        choices=["cosine", "euclidean"])
    parser.add_argument("--clip_model_to_use", type=str, default=None)
    parser.add_argument("--chunk_size", type=int, default=0,
                        help="accepted for reference-CLI compatibility; the TPU "
                        "path searches the whole dataset globally")
    parser.add_argument("--max_pairs_per_row", type=int, default=16)
    parser.add_argument("--wire", type=str, default="int8",
                        choices=["int8", "fp16"],
                        help="on-device embedding format: int8 halves the "
                        "host->device bytes (pair set stays exact via an f32 "
                        "host recheck); fp16 is the reference-parity format")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="ring the similarity over ALL hosts' devices; "
                        "launch this CLI on every host simultaneously "
                        "(jax.distributed coordination as in embed "
                        "--distributed); rank 0 handles the file moves")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.distributed:
        from clip_assisted_data_labeling_tpu.parallel.mesh import multihost_init

        rank, count = multihost_init(
            args.coordinator_address, args.num_processes, args.process_id
        )
        print(f"jax.distributed up: process {rank}/{count}")

    cfg = DedupConfig(
        threshold=args.threshold,
        mode=args.mode,
        sim_type=args.sim_type,
        clip_model_to_use=args.clip_model_to_use,
        chunk_size=args.chunk_size,
        test=args.test,
        max_pairs_per_row=args.max_pairs_per_row,
        wire=args.wire,
    )
    run_dedup(args.root_dir, cfg, global_mesh=args.distributed)


if __name__ == "__main__":
    main()
