"""Round-5b on-chip measurement batch — ONE process, one axon chip grant.

Rows for the towers added when the open_clip name surface was finished:
  * headline re-pin (ViT-L-14 int8_static b40, double-run — code-motion guard
    after the post-norm block restructure of models/vit._block),
  * CLIPA-L-14 (avg-pool readout on the identical L-14 trunk — the row proves
    the new readout costs nothing vs the cls path),
  * ViT-e-14 (1.8B-param plain pre-norm trunk — int8_static applies),
  * EVA02-E-14 (4.4B-param post-norm trunk, bf16 — the largest tower in the
    registry; params are INITIALIZED in bf16: an f32 pytree alone would be
    17.6 GB, over the 16 GB v5e HBM).

Timing convention (CLAUDE.md): block via a host fetch of a small slice;
steps amortized inside steady state; every number double-run.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

from benchmarks.run_round4_measure import bench_model, routing_report  # noqa: E402
from __graft_entry__ import _example_batch  # noqa: E402


def bench_lowmem(model, batch, dtype, runs=2, steps=10):
    """bench_model, but with the parameter pytree initialized in bf16 —
    needed for towers whose f32 pytree would blow the 16 GB HBM during init
    or during the f32→int8 quantization overlap (ViT-e: 1.8B params f32 is
    7.3 GB and OOMs alongside compile workspace; EVA02-E: 4.4B params f32 is
    17.6 GB outright). int8_static quantizes FROM the bf16 leaves — the
    amax/scale math is dtype-agnostic (ops/quant.quantize_vit_params)."""
    import json
    import time

    from benchmarks.run_round4_measure import measure
    from clip_assisted_data_labeling_tpu.models.encoders import (
        CLIPImageEncoder,
    )
    from clip_assisted_data_labeling_tpu.models.vit import (
        init_vit_params,
        resolve_config,
    )

    cfg = resolve_config(model)
    t0 = time.perf_counter()
    # jit the init: one device program instead of hundreds of eager tunnel
    # dispatches (ViT-e's eager init took 870 s), and XLA fuses each leaf's
    # normal-f32 → bf16 convert so no f32 temporary materializes (EVA02-E's
    # 7 GB fc1 f32 intermediate OOM'd the eager path alongside the resident
    # bf16 leaves)
    init = jax.jit(lambda k: init_vit_params(cfg, k, dtype=jnp.bfloat16))
    params = jax.block_until_ready(init(jax.random.key(0)))
    enc = CLIPImageEncoder(model, compute_dtype=dtype, params=params)
    canv, cp = _example_batch(batch, 1024, enc.img_resolution)
    dev = jax.devices()[0]
    canv = jax.device_put(canv, dev)
    cp = jax.device_put(cp, dev)
    print(f"[setup] {model} init+put {time.perf_counter() - t0:.1f}s",
          flush=True)
    vals = [measure(enc, canv, cp, batch, steps=steps) for _ in range(runs)]
    print(json.dumps({
        "model": model, "batch": batch, "dtype": f"{dtype}(bf16-params)",
        "imgs_per_sec": [round(v, 2) for v in vals],
    }), flush=True)
    del enc, canv, cp, params
    return vals


def main():
    which = set(sys.argv[1:]) or {"headline", "clipa", "vite", "evae"}
    print(f"[measure] devices: {jax.devices()}", flush=True)

    if "headline" in which:
        bench_model("ViT-L-14/openai", 40, "int8_static")
    if "clipa" in which:
        routing_report("ViT-L-14-CLIPA/datacomp1b")
        bench_model("ViT-L-14-CLIPA/datacomp1b", 40, "int8_static")
    if "vite" in which:
        routing_report("ViT-e-14/laion2b")
        bench_lowmem("ViT-e-14/laion2b", 16, "int8_static")
    if "evae" in which:
        routing_report("EVA02-E-14/laion2b_s4b_b115k")
        bench_lowmem("EVA02-E-14/laion2b_s4b_b115k", 8, "bfloat16", steps=5)
    if "evae-int8" in which:
        # post-norm int8_static (generic static block path; W8A8 weights
        # also halve the resident params: 4.4 GB int8 vs 8.8 GB bf16)
        bench_lowmem("EVA02-E-14/laion2b_s4b_b115k", 8, "int8_static",
                     steps=5)
        bench_lowmem("EVA02-E-14/laion2b_s4b_b115k", 16, "int8_static",
                     steps=5)


if __name__ == "__main__":
    main()
