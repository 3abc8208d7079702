"""Data-parallel regressor inference over the device mesh.

The reference's predictor is strictly single-device (_5_predict_labels.py:91-188;
SURVEY §2b row "Data parallel" — absent upstream, first-class here). The FC
regressor is pure XLA (no Pallas), so plain GSPMD suffices: the [N, F] feature
matrix is sharded on its leading axis over the 1-D ``data`` mesh, the tiny
params are replicated, and the jitted forward runs with zero collectives (the
output stays batch-sharded until the host fetch).

On a thin host link the stage is H2D-bound (BENCH_NOTES: 99.96% transfer), so
sharding buys little on one host — its value is multi-host topologies where
every host feeds its local chips (aggregate H2D lanes scale with hosts) and
the BASELINE 1M-image projection's "predict sharded" leg, which this module
turns from arithmetic into a tested program (tests/test_predict_sharded.py,
dryrun step 4).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_assisted_data_labeling_tpu.models.regressor import (
    _as_tuple,
    quantize_feature_rows,
    regressor_apply,
)


@functools.lru_cache(maxsize=8)
def _predict_dp(mesh: Mesh, classification: bool = False, q8: bool = False):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def fwd(param_tuple, x, scale, cvals):
        params = [{"kernel": k, "bias": b} for k, b in param_tuple]
        # upcast on device: the wire may be fp16 or per-row int8
        # (transfer-bound stage); `scale` is the int8 wire's row scales
        # ([N, 1], batch-sharded like x) — on the fp16/f32 wires it is a
        # replicated (1, 1) dummy that never touches the data path (no
        # per-row bytes ride the H2D wire for nothing)
        x32 = x.astype(jnp.float32)
        if q8:
            x32 = x32 * scale
        if classification:  # softmax-expected label value (models/regressor)
            logits = regressor_apply(params, x32, head="linear")
            return (jax.nn.softmax(logits, axis=-1) @ cvals)[:, None]
        return regressor_apply(params, x32)

    return jax.jit(fwd, in_shardings=(repl, data, data if q8 else repl,
                                      repl),
                   out_shardings=data), data


def predict_sharded(
    params: list[dict],
    features: np.ndarray,
    mesh: Mesh,
    batch_size: int = 65536,
    wire: str = "float16",
    class_values=None,  # classification models: meta.class_values
) -> np.ndarray:
    """Batch-sharded scores for ``features`` [N, F] → [N].

    ``params`` is the regressor layer list (``SimpleFCRegressor.params``).
    Accepts any N: each device-bound chunk is zero-padded up to a multiple of
    the mesh size (pad rows cost one extra row per device at most and are
    sliced off after the fetch). ``wire`` follows
    :meth:`SimpleFCRegressor.predict`: fp16 halves the H2D transfer the stage
    is bound by; batches holding values outside fp16 range fall back to f32.
    """
    if wire not in ("float16", "float32", "int8"):
        raise ValueError(
            f"wire must be 'float16', 'float32' or 'int8', got {wire!r}")
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    cvals = jnp.asarray(class_values if class_values is not None else [0.0],
                        jnp.float32)
    # chunk size aligned to the mesh so every shard is equal
    chunk = max(n_dev, (batch_size // n_dev) * n_dev)
    outs = []
    for i in range(0, len(features), chunk):
        x_host = np.asarray(features[i : i + chunk], np.float32)
        pad = (-len(x_host)) % n_dev
        if pad:
            x_host = np.pad(x_host, [(0, pad), (0, 0)])
        q8 = quantize_feature_rows(x_host) if wire == "int8" else None
        fwd, data_sharding = _predict_dp(mesh, class_values is not None,
                                         q8 is not None)
        if q8 is not None:
            x_host, scale_host = q8
            scale = jax.device_put(scale_host, data_sharding)
        else:
            scale = jnp.ones((1, 1), jnp.float32)  # replicated dummy
            if (wire == "float16"
                    and np.abs(x_host).max(initial=0.0) <= 6.0e4):
                x_host = x_host.astype(np.float16)
        x = jax.device_put(x_host, data_sharding)
        out = np.asarray(fwd(_as_tuple(params), x, scale, cvals))
        outs.append(out[: len(out) - pad] if pad else out)
    if not outs:
        return np.zeros((0,), np.float32)
    return np.concatenate(outs, axis=0).reshape(len(features), -1)[:, 0]
