"""Attention-kernel shootout at the shipped tower shapes.

Times each packed-attention implementation (whole-block, head-grouped,
k/v-streaming flash, XLA fallback) at ViT-L-224 / ViT-L-336 / PE-G14-448
shapes, amortized inside ONE jit (the axon tunnel's ~3 ms dispatch latency
swamps single-op timings) with the output folded into a scan carry so DCE
cannot elide the repeats. Host fetch at the end (block_until_ready is
unreliable on axon).

Also: the d=64-vs-128 MXU contraction probe (VERDICT r2 #2's "pack two heads
into the 128-lane tile" idea) — if a [S,64]x[64,S] matmul takes the SAME time
as [S,128]x[128,S], the array is half-idle and head-pair packing with a
block-diagonal K (2x FLOPs at 2x utilization) is exactly neutral; if it takes
HALF the time, there is nothing to recover.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

from clip_assisted_data_labeling_tpu.ops.attention import (
    _wholescore_group,
    attention_xla,
    flash_attention_packed,
    fused_attention_packed,
    fused_attention_packed_grouped,
    packed_attention_fits,
)

REPEATS = 24


def time_packed(fn_name, fn, qkv, heads, scale, s_real, steps=6, warmup=2):
    @jax.jit
    def repeated(qkv0):
        def body(carry, _):
            out = fn(carry, heads=heads, scale=scale, s_real=s_real)
            # fold output back into the carry (same shape family as input):
            # re-tile [B,S,w] to [B,S,3w] so the next iteration depends on it
            nxt = jnp.concatenate([out, out, out], axis=-1).astype(qkv0.dtype)
            return nxt * 1e-3 + qkv0, None

        final, _ = jax.lax.scan(body, qkv0, None, length=REPEATS)
        return final

    try:
        out = repeated(qkv)
        np.asarray(out[:1, :1, :4])
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            out = repeated(qkv)
            np.asarray(out[:1, :1, :4])
            times.append((time.perf_counter() - t0) / REPEATS)
        best = min(times) * 1e3
        print(f"  {fn_name:28s} {best:8.3f} ms/call")
        return best
    except Exception as e:  # noqa: BLE001 - report and continue the sweep
        print(f"  {fn_name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None


def xla_packed(qkv, heads, scale, s_real):
    b, s, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)  # noqa: E731
    out = attention_xla(rs(q), rs(k), rs(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(b, s, w)


def sweep(name, b, s, heads, d, dtype):
    from clip_assisted_data_labeling_tpu.ops.attention import _pad_for_tiling

    w = heads * d
    # the PRODUCTION pad (tile-friendly, models/vit.py pads once pre-scan) —
    # a plain 8-multiple (584 at ViT-L-336) times a clamped-overlap q tiling
    # the shipped path never runs
    s_pad = _pad_for_tiling(s)
    print(f"\n{name}: B={b} S={s} (pad {s_pad}) heads={heads} d={d} w={w} {dtype}")
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.normal(0, 1, (b, s_pad, 3 * w)).astype(np.float32), dtype=dtype
    )
    scale = d ** -0.5
    fits = packed_attention_fits(s_pad, w, jnp.dtype(dtype).itemsize)
    print(f"  whole-block fits VMEM: {fits}")
    if fits:
        time_packed("fused_attention_packed", fused_attention_packed, qkv,
                    heads, scale, s)
    time_packed("grouped", fused_attention_packed_grouped, qkv, heads, scale, s)
    hg = _wholescore_group(s, w, heads, jnp.dtype(dtype).itemsize)
    if hg is not None:
        print(f"  whole-scores group: {hg} heads/step")
        time_packed(
            f"grouped-wholescores (hg={hg})",
            functools.partial(fused_attention_packed_grouped,
                              whole_scores=True, head_group=hg),
            qkv, heads, scale, s)
    time_packed("flash", flash_attention_packed, qkv, heads, scale, s)
    time_packed("xla", xla_packed, qkv, heads, scale, s)


def mxu_probe():
    """d=64 vs d=128 contraction at the ViT-L scores shape, plus the exact
    head-PAIR-packed equivalent (VERDICT r2 #2): all 16 heads' scores as
    b=640 d=64 N=264 (today) vs b=320 d=128 N=528 (two heads per matmul with
    a block-diagonal K) — same output volume, doubled contraction."""
    print("\nMXU contraction probe (scores matmul [S,d]x[d,S]):")
    rng = np.random.default_rng(0)
    for b, n, d in ((640, 264, 64), (640, 264, 128), (640, 264, 256),
                    (320, 528, 128), (160, 1056, 256)):
        a = jnp.asarray(rng.normal(0, 1, (b, 264, d)).astype(np.float32),
                        dtype=jnp.bfloat16)
        bm = jnp.asarray(rng.normal(0, 1, (b, n, d)).astype(np.float32),
                         dtype=jnp.bfloat16)

        @jax.jit
        def rep(a0, b0):
            def body(c, _):
                s = jax.lax.dot_general(
                    a0 + c.astype(a0.dtype) * 1e-6, b0,
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                # full-output reduction: a narrow slice here lets XLA shrink
                # the matmul itself (the first probe of this idea lied)
                return jnp.sum(s, axis=2, keepdims=True) * 1e-6, None

            c0 = jnp.zeros((a0.shape[0], a0.shape[1], 1), jnp.float32)
            out, _ = jax.lax.scan(body, c0, None, length=REPEATS)
            return out

        out = rep(a, bm)
        np.asarray(out[:1, :1])
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = rep(a, bm)
            np.asarray(out[:1, :1])
            times.append((time.perf_counter() - t0) / REPEATS)
        best = min(times)
        flops = 2 * b * 264 * n * d
        print(f"  b={b:4d} N={n:5d} d={d:4d}: {best*1e3:7.3f} ms  "
              f"({flops/best/1e12:6.1f} TFLOP/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on sweep names")
    ap.add_argument("--mxu", action="store_true", help="run the MXU probe only")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if args.mxu:
        mxu_probe()
        return
    sweeps = [
        ("ViT-L-224 (batch 40x4 crops)", 160, 257, 16, 64, jnp.bfloat16),
        ("ViT-L-336 (batch 16x4 crops)", 64, 577, 16, 64, jnp.bfloat16),
        ("PE-G14-448 (batch 4x4 crops)", 16, 1024, 16, 96, jnp.bfloat16),
    ]
    for name, b, s, h, d, dt in sweeps:
        if args.only and args.only not in name:
            continue
        sweep(name, b, s, h, d, dt)
    mxu_probe()


if __name__ == "__main__":
    main()
