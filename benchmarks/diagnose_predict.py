"""Decompose the predict stage's run-to-run throughput spread (VERDICT r2 #8).

The 100k-row predict benchmark has read anywhere from 2.7k to 5.9k preds/s
across runs. This script splits one 64k-row device batch into its parts and
times each several times:

  transfer   host→device jax.device_put of the [64k, 1536] f32 features
             (the tunnel's H2D is the suspected variable)
  compute    the jitted MLP forward on device-RESIDENT input, amortized
             over in-jit repeats (dispatch-latency-free)
  fetch      device→host of the [64k] scores
  end2end    model.predict() exactly as the pipeline calls it

If transfer's spread explains end2end's spread while compute is stable, the
production figure is compute + PCIe-speed transfer.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--trials", type=int, default=8)
    args = ap.parse_args()

    from clip_assisted_data_labeling_tpu.models.regressor import (
        SimpleFCRegressor,
        init_regressor_params,
    )
    from clip_assisted_data_labeling_tpu.models.regressor import (
        RegressorMeta,
        _as_tuple,
        _predict_jit,
    )

    rng = np.random.default_rng(0)
    feats = rng.normal(0, 0.03, (args.rows, args.dim)).astype(np.float32)
    params = init_regressor_params(jax.random.key(0), args.dim, [264, 128, 64])
    meta = RegressorMeta(crop_names=("centre_crop", "subcrop2_0.1"),
                         clip_models=("bench",), input_size=args.dim,
                         hidden_sizes=(264, 128, 64))
    model = SimpleFCRegressor(params=params, meta=meta)

    mb = feats.nbytes / 2**20
    print(f"rows={args.rows} dim={args.dim} ({mb:.0f} MB f32)")

    def timed(label, fn, n=args.trials):
        ts = []
        fn()  # warm
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts = np.asarray(ts)
        print(f"  {label:10s} min {ts.min()*1e3:8.1f} ms  median "
              f"{np.median(ts)*1e3:8.1f} ms  max {ts.max()*1e3:8.1f} ms  "
              f"(spread {ts.max()/max(ts.min(),1e-9):.2f}x)")
        return ts

    dev = jax.devices()[0]

    def do_transfer():
        x = jax.device_put(feats, dev)
        np.asarray(x[:1, :1])  # sync (block_until_ready unreliable on axon)
        return x

    t_transfer = timed("transfer", do_transfer)

    x_dev = jax.device_put(feats, dev)
    np.asarray(x_dev[:1, :1])
    pt = _as_tuple(model.params)

    REP = 16

    @jax.jit
    def compute_rep(x):
        def body(c, _):
            out = _predict_jit(pt, x + c)
            return c + out[:1, :1] * 0.0, None

        c0 = jnp.zeros((1, 1), jnp.float32)
        c, _ = jax.lax.scan(body, c0, None, length=REP)
        return _predict_jit(pt, x + c)

    def do_compute():
        out = compute_rep(x_dev)
        np.asarray(out[:1])

    t_compute = timed("compute*17", do_compute)

    out_dev = _predict_jit(pt, x_dev)

    def do_fetch():
        np.asarray(out_dev)

    t_fetch = timed("fetch", do_fetch)

    def do_e2e():
        model.predict(feats, wire="float32")

    t_e2e = timed("end2end", do_e2e)

    def do_e2e_fp16():
        model.predict(feats, wire="float16")  # the predict stage's default wire

    t_e2e16 = timed("e2e fp16", do_e2e_fp16)

    per_call_compute = t_compute.min() / (REP + 1)
    print(json.dumps({
        "transfer_ms_min_max": [round(t_transfer.min() * 1e3, 1),
                                round(t_transfer.max() * 1e3, 1)],
        "transfer_MBps_min_max": [round(mb / t_transfer.max(), 1),
                                  round(mb / t_transfer.min(), 1)],
        "compute_ms_per_batch": round(per_call_compute * 1e3, 2),
        "compute_preds_per_sec": round(args.rows / per_call_compute),
        "fetch_ms": round(t_fetch.min() * 1e3, 1),
        "e2e_preds_per_sec_min_max": [round(args.rows / t_e2e.max()),
                                      round(args.rows / t_e2e.min())],
        "e2e_fp16_preds_per_sec_min_max": [round(args.rows / t_e2e16.max()),
                                           round(args.rows / t_e2e16.min())],
    }))


if __name__ == "__main__":
    main()
