"""Capture a device trace of the headline embed step and print per-op totals.

jax.profiler traces DO work through the axon tunnel (CLAUDE.md); this script
wraps the bench loop in ``jax.profiler.trace`` and then digests the chrome
trace JSON into a per-op-name duration table — the round-2/3 optimization log
in BENCH_NOTES.md is driven by these breakdowns.

Usage:
    python benchmarks/profile_embed.py [--compute_dtype int8] [--steps 3]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(model: str, batch: int, canvas: int, steps: int,
            compute_dtype: str, outdir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder

    enc = CLIPImageEncoder(model, parity_preprocess=False,
                           compute_dtype=compute_dtype)
    canvases, crop_params = _example_batch(batch, canvas, enc.img_resolution)
    dev = jax.devices()[0]
    canvases = jax.device_put(canvases, dev)
    crop_params = jax.device_put(crop_params, dev)
    # warm (compile) outside the trace
    np.asarray(enc.embed_crops(canvases, crop_params)[:1, :1, :4])

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            emb = enc.embed_crops(canvases, crop_params)
        np.asarray(emb[:1, :1, :4])


def summarize(outdir: str, top: int, steps: int) -> None:
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz found under {outdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-track events: pid names look like "/device:TPU:0" or "TPU:0 ..."
    device_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name.upper() or "device" in name.lower():
                device_pids.add(ev["pid"])
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for ev in events:
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            totals[ev["name"]] += ev.get("dur", 0.0)
            counts[ev["name"]] += 1
    grand = sum(totals.values())
    print(f"\ndevice op totals over {steps} steps "
          f"({grand / 1e3:.2f} ms total, {len(totals)} distinct ops):")
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us / 1e3 / steps:9.3f}  {100 * us / grand:5.1f}  "
              f"{counts[name]:6d}  {name[:110]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-L-14/openai")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--canvas", type=int, default=1024)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--compute_dtype", default="int8")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--outdir", default=None,
                   help="keep the raw trace here (default: temp dir)")
    args = p.parse_args()
    outdir = args.outdir or tempfile.mkdtemp(prefix="ctpu_prof_")
    capture(args.model, args.batch, args.canvas, args.steps,
            args.compute_dtype, outdir)
    summarize(outdir, args.top, args.steps)
    print(f"\nraw trace: {outdir}")


if __name__ == "__main__":
    main()
