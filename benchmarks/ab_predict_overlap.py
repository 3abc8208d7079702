"""Interleaved A/B of predict's assembly-prefetch overlap on a 1-core host.

The axon tunnel's H2D rate drifts by >4x across minutes (device phase of the
1M predict measured 185.5s, then 708s, then 897s across three runs hours
apart — BENCH_NOTES round-9), so time-separated comparisons are meaningless.
This driver alternates sequential / overlapped runs back-to-back over the
SAME reused store so each pair shares a tunnel-speed window:

    python benchmarks/ab_predict_overlap.py [N] [reps]

Forces the path by patching os.cpu_count (the production gate in
pipeline/predict.py) rather than a side-channel knob, so the A/B exercises
the exact shipped dispatch.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_chain  # noqa: E402  (sibling module)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

    real_cpu_count = os.cpu_count
    for rep in range(reps):
        for label, cores in (("sequential", 1), ("overlap", 2)):
            os.cpu_count = lambda c=cores: c  # gate input, nothing else
            try:
                print(f"=== rep {rep} {label} (cpu_count->{cores}) ===",
                      flush=True)
                bench_chain.predict_1m(n, 65536)
            finally:
                os.cpu_count = real_cpu_count


if __name__ == "__main__":
    main()
