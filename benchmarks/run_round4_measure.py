"""Round-4 on-chip measurement batch — ONE process, one axon chip grant.

Closes the VERDICT r3 asks that only need measurements:
  #1 SigLIP family on-chip (SO400M-14@384 double-run + a size-B row) with
     attention-kernel routing confirmation under real Mosaic,
  headline + ViT-L-336 revalidation (tunnel noise guard: double-run),
  RN50 bench row (new tower this round).

Timing convention (CLAUDE.md): block via a host fetch of a small slice;
steps amortized inside steady state; every number double-run.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

from __graft_entry__ import _example_batch
from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder


def measure(encoder, canvases, crop_params, batch, steps=10, warmup=2):
    for _ in range(warmup):
        np.asarray(encoder.embed_crops(canvases, crop_params)[:1, :1, :4])
    t0 = time.perf_counter()
    for _ in range(steps):
        emb = encoder.embed_crops(canvases, crop_params)
    np.asarray(emb[:1, :1, :4])
    return batch * steps / (time.perf_counter() - t0)


def routing_report(model):
    from clip_assisted_data_labeling_tpu.models.vit import resolve_config
    from clip_assisted_data_labeling_tpu.ops import attention as A

    cfg = resolve_config(model)
    s, w = cfg.seq_len, cfg.width
    s_pad = A._pad_for_tiling(s)
    if A.packed_attention_fits(s, w, 2):
        kernel = "whole-block"
        detail = f"s_pad={s_pad} q_tile={A._q_tile(s_pad)}"
    elif A.grouped_attention_fits(s, w, cfg.heads, 2):
        kernel, detail = "grouped", ""
    else:
        kernel, detail = "flash", ""
    q8s = A.packed_q8s_fits(s, w, cfg.heads)
    print(f"[route] {model}: S={s} w={w} d={cfg.head_dim} -> {kernel} "
          f"({detail}); q8s wire fits: {q8s}", flush=True)


def bench_model(model, batch, dtype, runs=2, steps=10):
    enc = CLIPImageEncoder(model, compute_dtype=dtype)
    canv, cp = _example_batch(batch, 1024, enc.img_resolution)
    dev = jax.devices()[0]
    canv = jax.device_put(canv, dev)
    cp = jax.device_put(cp, dev)
    vals = [measure(enc, canv, cp, batch, steps=steps) for _ in range(runs)]
    print(json.dumps({
        "model": model, "batch": batch, "dtype": dtype,
        "imgs_per_sec": [round(v, 2) for v in vals],
    }), flush=True)
    del enc, canv, cp
    return vals


def wire_ab(model, batch, steps=10):
    """A/B the int8 attention wire (VERDICT r3 #2) in ONE process: default
    int8_static (wire OFF), then CTPU_INT8_WIRE=1 with knobs.reload() + a jit
    cache clear (CLAUDE.md one-grant pattern), then OFF again to confirm the
    flip-back reproduces the baseline (guards against cache contamination)."""
    import os

    from clip_assisted_data_labeling_tpu.models import encoders as E
    from clip_assisted_data_labeling_tpu.ops import knobs

    def set_wire(on: bool):
        # explicit 1/0: the default is per-shape 'auto' since round 8
        os.environ["CTPU_INT8_WIRE"] = "1" if on else "0"
        knobs.reload()
        E._embed_crops_jit.clear_cache()

    routing_report(model)
    for phase, on in (("wire_off", False), ("wire_on", True),
                      ("wire_off_again", False)):
        set_wire(on)
        print(f"[wire_ab] {phase}", flush=True)
        bench_model(model, batch, "int8_static", steps=steps)
    os.environ.pop("CTPU_INT8_WIRE", None)
    knobs.reload()
    E._embed_crops_jit.clear_cache()


def main():
    which = set(sys.argv[1:]) or {"headline", "siglip", "336", "rn50"}
    print(f"[measure] devices: {jax.devices()}", flush=True)

    if "wire336" in which:
        wire_ab("ViT-L-14-336/openai", 16)
    if "wire224" in which:
        wire_ab("ViT-L-14/openai", 40)
    if "wire-so400m" in which:
        wire_ab("ViT-SO400M-14-SigLIP-384/webli", 16)

    if "headline" in which:
        bench_model("ViT-L-14/openai", 40, "int8_static")
    if "siglip" in which:
        routing_report("ViT-SO400M-14-SigLIP-384/webli")
        routing_report("ViT-B-16-SigLIP/webli")
        bench_model("ViT-SO400M-14-SigLIP-384/webli", 16, "int8_static")
        bench_model("ViT-B-16-SigLIP/webli", 64, "int8_static")
    if "336" in which:
        routing_report("ViT-L-14-336/openai")
        bench_model("ViT-L-14-336/openai", 16, "int8_static")
    if "rn50" in which:
        bench_model("RN50/openai", 32, "bfloat16")
        bench_model("RN50/openai", 64, "bfloat16")
    if "cnx" in which:  # A/B the W8A8 pointwise-matmul path vs bf16
        bench_model("convnext_base_w/laion2b_s13b_b82k", 32, "bfloat16")
        bench_model("convnext_base_w/laion2b_s13b_b82k", 64, "bfloat16")
        bench_model("convnext_base_w/laion2b_s13b_b82k", 64, "int8_static")
        bench_model("convnext_large_d/laion2b_s26b_b102k_augreg", 32,
                    "bfloat16")
        bench_model("convnext_large_d/laion2b_s26b_b102k_augreg", 32,
                    "int8_static")
    if "eva" in which:
        routing_report("EVA02-L-14/merged2b_s4b_b131k")
        bench_model("EVA02-L-14/merged2b_s4b_b131k", 40, "int8_static")
        bench_model("EVA02-L-14/merged2b_s4b_b131k", 40, "bfloat16")
    if "eva-breadth" in which:  # the other two EVA geometries
        bench_model("EVA02-B-16/merged2b_s8b_b131k", 64, "int8_static")
        bench_model("EVA01-g-14/laion400m_s11b_b41k", 16, "int8_static")
    if "big-vits" in which:  # registry giants with no recorded rows
        bench_model("ViT-H-14/laion2b_s32b_b79k", 32, "int8_static")
        bench_model("ViT-g-14/laion2b_s34b_b88k", 16, "int8_static")
        bench_model("ViT-bigG-14/laion2b_s39b_b160k", 16, "int8_static")
    if "rn-breadth" in which:
        bench_model("RN101/openai", 64, "bfloat16")
        bench_model("RN50x16/openai", 16, "bfloat16")
    if "cnx-xxl" in which:  # back the >=1536 auto gate at its other end
        bench_model("convnext_xxlarge/laion2b_s34b_b82k_augreg_soup", 16,
                    "bfloat16")
        bench_model("convnext_xxlarge/laion2b_s34b_b82k_augreg_soup", 16,
                    "int8_static")
    if "rn-int8" in which:  # W8A8 1x1-matmul path A/B (run with CTPU_RN_INT8=1
        # so the gate can't hide the path; bf16 rows ignore the knob).
        # Interleaved bf16/int8 pairs per the tunnel-drift rule (CLAUDE.md).
        for _ in range(2):
            bench_model("RN50x16/openai", 16, "bfloat16")
            bench_model("RN50x16/openai", 16, "int8_static")
        bench_model("RN50/openai", 64, "bfloat16")
        bench_model("RN50/openai", 64, "int8_static")
        bench_model("RN50x64/openai", 8, "int8_static")
        bench_model("RN50x64/openai", 8, "bfloat16")
    if "sweeps" in which:  # batch headroom on the small towers
        bench_model("ViT-B-16-SigLIP/webli", 128, "int8_static")
        bench_model("PE-Core-B16-224", 64, "int8_static")
    if "naflex" in which:  # masked variable-aspect path (bf16, own program)
        bench_naflex("ViT-B-16-SigLIP2-naflex", 64)
    if "coca" in which:  # CoCa towers (ViT trunk + attentional-pool readout);
        # the L-14 row is directly comparable to the ViT-L-14 headline (same
        # trunk geometry, the readout is the only delta)
        routing_report("coca_ViT-L-14/laion2b_s13b_b90k")
        bench_model("coca_ViT-L-14/laion2b_s13b_b90k", 40, "int8_static")
        bench_model("coca_ViT-B-32/laion2b_s13b_b90k", 64, "int8_static")


def bench_naflex(model, batch, runs=2, steps=10):
    """Steady-state throughput of the masked variable-aspect naflex path:
    mixed-aspect uint8 images -> per-image patch grids -> masked tower. Host
    preprocess (grid fit + pos-embed weights) is included once per batch,
    then reused — the point is the DEVICE program's rate (one jit, padded to
    the 256-position grid), so preprocess is staged outside the timed loop
    like bench_model's device-resident canvases."""
    enc = CLIPImageEncoder(model, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    aspects = [(512, 256), (384, 384), (256, 512), (448, 320)]
    images = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
              for h, w in (aspects * ((batch + 3) // 4))[:batch]]

    from clip_assisted_data_labeling_tpu.models.naflex import (
        build_pos_weights,
        naflex_encode,
        preprocess_variable,
    )

    n_max = enc.cfg.seq_len
    prepped = [preprocess_variable(np.asarray(im), enc.cfg, n_max)
               for im in images]
    patches = jax.device_put(np.stack([p for p, _, _ in prepped]))
    masks = jax.device_put(np.stack([m for _, m, _ in prepped]))
    pos_w = jax.device_put(build_pos_weights(
        [s for _, _, s in prepped], n_max, enc.cfg.grid))

    def step():
        return naflex_encode(enc.params, patches, pos_w, masks, enc.cfg,
                             compute_dtype=enc.compute_dtype)

    for _ in range(2):
        np.asarray(step()[:1, :4])
    t0 = time.perf_counter()
    for _ in range(steps):
        emb = step()
    np.asarray(emb[:1, :4])
    vals = [batch * steps / (time.perf_counter() - t0)]
    for _ in range(runs - 1):
        t0 = time.perf_counter()
        for _ in range(steps):
            emb = step()
        np.asarray(emb[:1, :4])
        vals.append(batch * steps / (time.perf_counter() - t0))
    print(json.dumps({
        "model": model, "batch": batch, "dtype": "bfloat16(naflex)",
        "imgs_per_sec": [round(v, 2) for v in vals],
    }), flush=True)


if __name__ == "__main__":
    main()
