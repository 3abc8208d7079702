"""Microbenchmarks for the W8A8 path: where does the int8 time actually go?

Times the ViT-L linear shapes (batch 32 images × 4 crops × 257 tokens) through:
  xla_bf16        plain bf16 matmul (the roofline anchor)
  xla_int8_pre    int8×int8 matmul with PRE-quantized activations (isolates
                  the MXU int8 rate from quantize/dequant overhead)
  xla_int8_dyn    ops/quant.q_matmul — dynamic quantize + matmul + dequant
  pallas_fused    ops/quant_kernel.q_linear_fused
Host fetch after each timed loop (block_until_ready is unreliable on axon).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

from clip_assisted_data_labeling_tpu.ops.quant import q_matmul, quantize_weight
from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_linear_fused


REPEATS = 10  # in-jit repetitions: amortizes the axon tunnel's ~3 ms dispatch


def timeit(fn, *args, steps=20, warmup=3) -> float:
    """Time fn amortized over REPEATS in-jit applications (one dispatch)."""

    @jax.jit
    def repeated(*a):
        def body(carry, c):
            # roll keeps dtype and defeats loop-invariant hoisting (~0.1-0.2 ms,
            # charged identically to every variant)
            out = fn(jnp.roll(a[0], c, axis=0), *a[1:])
            first = jax.tree.leaves(out)[0]
            # full reduction so DCE can't skip computing any output element
            return carry + jnp.sum(first.astype(jnp.float32)).reshape(1, 1), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((1, 1), jnp.float32), jnp.arange(REPEATS, dtype=jnp.int32)
        )
        return acc

    for _ in range(warmup):
        out = repeated(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = repeated(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / (steps * REPEATS)


@jax.jit
def xla_bf16(x, w):
    return x @ w


@jax.jit
def xla_int8_pre(xq, wq, xs, ws):
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)


@jax.jit
def xla_quantize_only(x):
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(xf / (amax / 127.0)), -127, 127).astype(jnp.int8)
    return xq, amax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=32896)  # 32 imgs × 4 crops × 257
    p.add_argument("--shapes", type=str, default="1024x3072,1024x4096,4096x1024,1024x1024")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--block_m", type=int, default=512)
    p.add_argument("--block_n", type=int, default=1024)
    p.add_argument("--block_k", type=int, default=512)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    m = args.m
    for shape in args.shapes.split(","):
        k, n = (int(v) for v in shape.split("x"))
        flops = 2.0 * m * k * n
        x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.02, (k, n)).astype(np.float32), jnp.bfloat16)
        wq_np, ws_np = quantize_weight(np.asarray(w, np.float32))
        wq, ws = jnp.asarray(wq_np), jnp.asarray(ws_np)
        bias = jnp.zeros((n,), jnp.float32)

        t = timeit(xla_bf16, x, w, steps=args.steps)
        print(f"[{k}x{n}] xla_bf16      {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")

        xq, amax = jax.jit(xla_quantize_only)(x)
        xq = jax.block_until_ready(xq)
        xs = amax / 127.0
        t = timeit(xla_int8_pre, xq, wq, xs, ws, steps=args.steps)
        print(f"[{k}x{n}] xla_int8_pre  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")

        t = timeit(xla_quantize_only, x, steps=args.steps)
        print(f"[{k}x{n}] quantize_only {t*1e3:8.2f} ms  (activation pass)")

        t = timeit(
            jax.jit(lambda a, b, s, bb: q_matmul(a, b, s, bb)), x, wq, ws, bias,
            steps=args.steps,
        )
        print(f"[{k}x{n}] xla_int8_dyn  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")

        t = timeit(
            lambda a, b, s, bb: q_linear_fused(a, b, s, bb, block_m=args.block_m),
            x, wq, ws, bias, steps=args.steps,
        )
        print(f"[{k}x{n}] pallas_fused  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")


if __name__ == "__main__":
    main()
