"""Fused W8A8 Pallas linear vs the XLA quantized path (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.ops.quant import q_matmul, quantize_weight
from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_linear_fused


def test_fused_matches_xla_path(rng):
    x = rng.normal(0, 1, (40, 64)).astype(np.float32)
    k = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)
    wq, scale = quantize_weight(k)

    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 jnp.asarray(b), out_dtype=jnp.float32)
    )
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       jnp.asarray(b), block_m=16, interpret=True,
                       out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_no_bias_and_padding(rng):
    # M not a multiple of block_m exercises the pad/slice path
    x = rng.normal(0, 1, (13, 32)).astype(np.float32)
    k = rng.normal(0, 0.05, (32, 16)).astype(np.float32)
    wq, scale = quantize_weight(k)
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       None, block_m=8, interpret=True, out_dtype=jnp.float32)
    )
    assert got.shape == (13, 16)
    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_non_divisible_dims(rng):
    """Regression (review finding): K/N not multiples of the block sizes must
    pad correctly, not silently truncate/NaN (e.g. ViT-B shapes K=768, N=2304)."""
    x = rng.normal(0, 1, (20, 48)).astype(np.float32)
    k = rng.normal(0, 0.05, (48, 72)).astype(np.float32)
    wq, scale = quantize_weight(k)
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       None, block_m=8, block_n=32, block_k=32,
                       interpret=True, out_dtype=jnp.float32)
    )
    assert got.shape == (20, 72)
    assert np.isfinite(got).all()
    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
