"""Reproduce the dedup numbers in BENCH_NOTES.md: all-pairs near-duplicate
search over N synthetic 768-d embeddings with planted duplicates.

    python benchmarks/bench_dedup.py --n 100000
    python benchmarks/bench_dedup.py --n 1000000          # ~3.5 min on one v5e
    python benchmarks/bench_dedup.py --n 100000 --sharded # mesh ring version
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
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--threshold", type=float, default=0.96)
    parser.add_argument("--row_block", type=int, default=8192)
    parser.add_argument("--sharded", action="store_true")
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--wire", default="int8", choices=["int8", "fp16"],
                        help="on-device embedding format (single-device path)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (args.n, args.dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    planted = [
        (5, args.n // 2), (123, args.n - 7),
        (args.n // 4, args.n // 4 + 9), (7, args.n - 1),
    ]
    for i, j in planted:
        emb[j] = emb[i] + rng.normal(0, 0.005, args.dim).astype(np.float32)
        emb[j] /= np.linalg.norm(emb[j])

    if args.sharded:
        from clip_assisted_data_labeling_tpu.parallel import (
            find_duplicate_pairs_sharded as find,
            get_mesh,
        )

        kw = {"mesh": get_mesh(), "wire": args.wire}
    else:
        from clip_assisted_data_labeling_tpu.ops.similarity import (
            find_duplicate_pairs as find,
        )

        kw = {"row_block": args.row_block, "wire": args.wire}

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        res = find(emb, threshold=args.threshold, **kw)
        times.append(time.time() - t0)
        print(f"run {r}: {times[-1]:.1f}s, {len(res.rows)} pairs", flush=True)
    found = set(zip(res.rows.tolist(), res.cols.tolist()))
    assert all(p in found for p in planted), "planted duplicates missed!"
    out = {
        "metric": f"all-pairs dedup over {args.n} embeddings"
                  + f" ({args.wire} wire)",
        "value": round(min(times), 2),
        "unit": "seconds",
        "pairs": len(res.rows),
    }
    try:  # peak HBM (supported backends only; the ≥4M stress run wants it)
        stats = jax.devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            out["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
