"""One-command multi-chip verification runbook.

Every multi-chip number in this repo so far is virtual-CPU-mesh correctness
plus single-chip-measured composition (BENCH_NOTES.md "v5e-8 projection") —
no real ICI hardware was reachable from the build environment. Run this the
day a real multi-chip TPU host (e.g. v5e-8) is available; it turns the
projection into measurements:

  1. correctness — ``__graft_entry__.dryrun_multichip`` on the real mesh
     (DP embed == single-device, TP int8_static bit-identity, ring-dedup
     planted-pair recovery, sharded train/predict exactness),
  2. embed — data-parallel throughput on 1 device vs the full mesh →
     imgs/sec/chip and scaling efficiency (``parallel/embed_sharded.py``),
  3. dedup — ring-sharded all-pairs similarity over ``--dedup_n`` synthetic
     embeddings with planted duplicate pairs (``parallel/dedup_sharded.py``),
  4. predict — sharded regressor inference throughput + exactness vs the
     single-device forward (``parallel/predict_sharded.py``).

Prints ONE JSON line with the measurements and pass/fail gates; exit code 0
iff every correctness gate passed. Scaling efficiency is reported, not gated
(it depends on the host's PCIe feed, see BENCH_NOTES "Host pipeline").

    python scripts/verify_multichip.py                       # real hardware
    python scripts/verify_multichip.py --smoke               # CI: virtual CPU mesh

Multi-HOST slices are out of scope here (one process, local devices); for the
multi-host recipe (per-host embed shards + global-mesh dedup over
jax.distributed) see README "Multi-host recipe" and
tests/test_multihost_distributed.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes on a virtual 8-device CPU mesh (CI)")
    p.add_argument("--devices", type=int, default=0,
                   help="mesh size (default: all local devices)")
    p.add_argument("--model", default="ViT-L-14/openai")
    p.add_argument("--compute_dtype", default="int8_static",
                   help="int8_static | int8 | bfloat16 | float32")
    p.add_argument("--batch_per_device", type=int, default=40,
                   help="per-device embed batch (40 = the headline bench shape)")
    p.add_argument("--canvas", type=int, default=768)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dedup_n", type=int, default=1_000_000)
    p.add_argument("--dedup_dim", type=int, default=768)
    p.add_argument("--predict_n", type=int, default=262_144)
    p.add_argument("--tp", action="store_true",
                   help="also measure embed on a 2-D (data, model=2) "
                        "tensor-parallel mesh (needs an even device count ≥4)")
    return p.parse_args()


def _fetch(x) -> None:
    """Synchronize via host fetch (block_until_ready is unreliable on some
    experimental platforms, CLAUDE.md gotchas)."""
    np.asarray(x).reshape(-1)[:1]


def stage_correctness(n: int) -> dict:
    from __graft_entry__ import dryrun_multichip

    t0 = time.perf_counter()
    dryrun_multichip(n)  # raises on any numeric divergence
    return {"ok": True, "seconds": round(time.perf_counter() - t0, 1)}


def stage_embed(args, mesh) -> dict:
    import jax

    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder

    n = mesh.devices.size
    encoder = CLIPImageEncoder(args.model, compute_dtype=(
        args.compute_dtype if args.compute_dtype.startswith("int8")
        else np.dtype(args.compute_dtype).name))
    canvases, crop_params = _example_batch(
        args.batch_per_device, args.canvas, encoder.img_resolution)

    def timed(fn, batch_imgs):
        for _ in range(args.warmup):
            _fetch(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(args.steps):
            out = fn()
        _fetch(out)  # executions queue in order; this drains all
        return batch_imgs * args.steps / (time.perf_counter() - t0)

    single = timed(lambda: encoder.embed_crops(canvases, crop_params),
                   args.batch_per_device)

    big_canvases = np.concatenate([canvases] * n)
    big_params = np.concatenate([crop_params] * n)
    sharded = ShardedEmbedder(
        encoder.params, encoder.cfg, mesh,
        compute_dtype=encoder.compute_dtype,
        parity_preprocess=encoder.parity_preprocess,
    )
    if args.compute_dtype == "int8_static":
        sharded.calibrate_static(big_canvases, big_params)
    meshed = timed(lambda: sharded.embed(big_canvases, big_params),
                   args.batch_per_device * n)

    report = {
        "devices": n,
        "single_device_imgs_per_sec": round(single, 2),
        "mesh_imgs_per_sec": round(meshed, 2),
        "imgs_per_sec_per_chip": round(meshed / n, 2),
        "scaling_efficiency": round(meshed / (n * single), 3),
    }

    if args.tp and n >= 4 and n % 2 == 0:
        # tensor-parallel serving (towers too big to replicate, e.g.
        # PE-G14-448): 2-D (data, model) mesh; int8_static switches to the
        # explicit-collective tp_static program, others take GSPMD TP specs
        from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d

        mesh2 = get_mesh_2d(n // 2, 2)
        tp = ShardedEmbedder(
            encoder.params, encoder.cfg, mesh2,
            compute_dtype=encoder.compute_dtype,
            parity_preprocess=encoder.parity_preprocess,
        )
        tp_canv = np.concatenate([canvases] * (n // 2))
        tp_cp = np.concatenate([crop_params] * (n // 2))
        if args.compute_dtype == "int8_static":
            tp.calibrate_static(tp_canv, tp_cp)
        tp_thr = timed(lambda: tp.embed(tp_canv, tp_cp),
                       args.batch_per_device * (n // 2))
        report["tp_mesh"] = {"data": n // 2, "model": 2}
        report["tp_imgs_per_sec"] = round(tp_thr, 2)
    return report


def stage_dedup(args, mesh) -> dict:
    from clip_assisted_data_labeling_tpu.parallel.dedup_sharded import (
        find_duplicate_pairs_sharded,
    )

    rng = np.random.default_rng(0)
    n, d = args.dedup_n, args.dedup_dim
    emb = rng.normal(0, 1, (n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    planted = [(5, n // 2), (123, n - 7), (n // 4, n // 4 + 9), (7, n - 1)]
    for i, j in planted:
        emb[j] = emb[i] + rng.normal(0, 0.005, d).astype(np.float32)
        emb[j] /= np.linalg.norm(emb[j])

    t0 = time.perf_counter()
    result = find_duplicate_pairs_sharded(emb, threshold=0.96, mesh=mesh)
    pairs = set(zip(np.asarray(result.rows).tolist(),
                    np.asarray(result.cols).tolist()))
    dt = time.perf_counter() - t0
    recovered = all((min(p), max(p)) in pairs for p in planted)
    return {
        "n": n,
        "seconds": round(dt, 1),
        "pairs_found": len(pairs),
        "planted_pairs_recovered": recovered,
        "ok": recovered,
    }


def stage_predict(args, mesh) -> dict:
    import jax

    from clip_assisted_data_labeling_tpu.models.regressor import (
        init_regressor_params,
        regressor_apply,
    )
    from clip_assisted_data_labeling_tpu.parallel.predict_sharded import (
        predict_sharded,
    )

    feat_dim = 3096 if not args.smoke else 64
    n = args.predict_n
    rng = np.random.default_rng(1)
    params = init_regressor_params(jax.random.key(0), feat_dim, [264, 128, 64])
    x = rng.normal(0, 1, (n, feat_dim)).astype(np.float32)

    t0 = time.perf_counter()
    scores = predict_sharded(params, x, mesh)  # fp16 wire (production default)
    dt = time.perf_counter() - t0

    probe = slice(0, min(4096, n))
    single = np.asarray(regressor_apply(params, x[probe]))[:, 0]
    # the fp16 feature wire quantizes inputs; bound the drift, don't demand
    # bit-equality (the f32 wire's exactness is gated in dryrun_multichip)
    ok = bool(np.allclose(scores[probe], single, atol=2e-2))
    return {
        "n": n,
        "preds_per_sec": round(n / dt, 1),
        "matches_single_device": ok,
        "ok": ok,
    }


def main():
    args = parse_args()
    if args.smoke:
        # virtual CPU mesh (same recipe as tests/conftest.py) + tiny shapes
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        args.model = "ViT-Test/tiny"
        args.compute_dtype = "bfloat16"
        args.batch_per_device = 4
        args.canvas = 128
        args.steps, args.warmup = 2, 1
        args.dedup_n, args.dedup_dim = 4096, 64
        args.predict_n = 8192
        args.tp = True  # cover the 2-D-mesh branch in CI

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh

    n = args.devices or jax.local_device_count()
    if n < 2:
        print(json.dumps({"ok": False,
                          "error": f"need ≥2 devices for a mesh, have {n}"}))
        return 1
    mesh = get_mesh(n)
    print(f"[verify] platform={jax.devices()[0].platform} devices={n} "
          f"model={args.model} dtype={args.compute_dtype}", file=sys.stderr)

    report = {"platform": jax.devices()[0].platform, "devices": n,
              "model": args.model, "compute_dtype": args.compute_dtype}
    report["correctness"] = stage_correctness(n)
    report["embed"] = stage_embed(args, mesh)
    report["dedup"] = stage_dedup(args, mesh)
    report["predict"] = stage_predict(args, mesh)
    report["ok"] = bool(report["correctness"]["ok"] and report["dedup"]["ok"]
                        and report["predict"]["ok"])
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
