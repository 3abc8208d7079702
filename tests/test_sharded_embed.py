"""Data-parallel embedding over the 8-device CPU mesh matches single-device."""
import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from clip_assisted_data_labeling_tpu.models.vit import (
    init_vit_params,
    resolve_config,
    vit_encode_image,
)
from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize
from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh


def test_sharded_embed_matches_single(rng):
    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    canvases, crop_params = _example_batch(16, 128, cfg.image_size, seed=3)

    mesh = get_mesh()
    embedder = ShardedEmbedder(params, cfg, mesh, compute_dtype=jnp.float32)
    sharded = np.asarray(embedder.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        canvases, crop_params, out_size=cfg.image_size, parity=False,
        dtype=jnp.float32,
    )
    single = np.asarray(
        vit_encode_image(
            params, np.asarray(crops).reshape(-1, cfg.image_size, cfg.image_size, 3),
            cfg, compute_dtype=jnp.float32,
        )
    ).reshape(16, 4, -1)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_embed_siglip_matches_single(rng):
    """The DP shard_map path with a SigLIP config: per-model normalization
    constants (0.5/0.5) flow through _embed_jit via cfg, and the MAP-head
    readout runs per shard."""
    cfg = resolve_config("SigLIP-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(1))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=5)

    embedder = ShardedEmbedder(params, cfg, get_mesh(), compute_dtype=jnp.float32)
    sharded = np.asarray(embedder.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        canvases, crop_params, out_size=cfg.image_size, parity=False,
        dtype=jnp.float32, mean=cfg.norm_mean, std=cfg.norm_std,
    )
    single = np.asarray(
        vit_encode_image(
            params, np.asarray(crops).reshape(-1, cfg.image_size, cfg.image_size, 3),
            cfg, compute_dtype=jnp.float32,
        )
    ).reshape(8, 4, -1)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_embed_with_stats(rng):
    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=4)
    from clip_assisted_data_labeling_tpu.ops.image_stats import make_stat_params

    stat_params = np.stack([make_stat_params(100, 100, 128)] * 8)
    embedder = ShardedEmbedder(params, cfg, get_mesh())
    emb, stats = embedder.embed(canvases, crop_params, stat_params)
    assert emb.shape == (8, 4, cfg.embed_dim)
    assert stats.shape == (8, 22)
    assert np.isfinite(np.asarray(stats)).all()

def test_tp_sharded_embed_matches_single(rng):
    """Tensor-parallel layout (parallel/tp.py) over a 2-D (data, model) mesh
    reproduces the single-device embeddings; the specs live in the library,
    not inline in the driver entry."""
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d
    from clip_assisted_data_labeling_tpu.parallel.tp import (
        TP_BLOCK_SPECS,
        apply_tp_sharding,
    )

    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=5)

    mesh2 = get_mesh_2d(4, 2)
    embedder = ShardedEmbedder(params, cfg, mesh2, compute_dtype=jnp.float32)
    # every TP'd kernel really is laid out over the model axis
    qkv = embedder.params["blocks"]["qkv_kernel"]
    assert "model" in str(qkv.sharding.spec), qkv.sharding
    assert set(TP_BLOCK_SPECS) >= {"qkv_kernel", "out_kernel", "fc1_kernel", "fc2_kernel"}
    sharded = np.asarray(embedder.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        canvases, crop_params, out_size=cfg.image_size, parity=False,
        dtype=jnp.float32,
    )
    single = np.asarray(
        vit_encode_image(
            params, np.asarray(crops).reshape(-1, cfg.image_size, cfg.image_size, 3),
            cfg, compute_dtype=jnp.float32,
        )
    ).reshape(8, 4, -1)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_tp_sharded_embed_eva_matches_single(rng):
    """EVA02 (swiglu + sub-LN + rope) under the GSPMD TP path: the logical-
    shape program is partitioned by XLA (fc1's packed w1||w2 columns shard
    without the explicit pair-reorder the tp_static path needs), and the
    result must match the single-device forward."""
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d

    cfg = resolve_config("EVA-Test-Wide/tiny")
    params = init_vit_params(cfg, jax.random.key(2))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=6)

    mesh2 = get_mesh_2d(4, 2)
    embedder = ShardedEmbedder(params, cfg, mesh2, compute_dtype=jnp.float32)
    assert "model" in str(embedder.params["blocks"]["fc1_kernel"].sharding.spec)
    sharded = np.asarray(embedder.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        canvases, crop_params, out_size=cfg.image_size, parity=False,
        dtype=jnp.float32, mean=cfg.norm_mean, std=cfg.norm_std,
    )
    single = np.asarray(
        vit_encode_image(
            params, np.asarray(crops).reshape(-1, cfg.image_size, cfg.image_size, 3),
            cfg, compute_dtype=jnp.float32,
        )
    ).reshape(8, 4, -1)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_apply_tp_sharding_requires_model_axis():
    import pytest

    from clip_assisted_data_labeling_tpu.parallel.tp import apply_tp_sharding

    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="model"):
        apply_tp_sharding(params, get_mesh())


def test_sharded_static_calibration_matches_single_device(rng):
    """DP int8_static: calibrate_static on the mesh (cross-shard amax via the
    sharded batch reduction), then embeddings match the single-device static
    path."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        resolve_config,
        init_vit_params,
        vit_act_amax,
        vit_encode_image,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh
    from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize

    cfg = resolve_config("ViT-Test/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(1)))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=9)

    emb_sharded = ShardedEmbedder(qparams, cfg, get_mesh())
    emb_sharded.calibrate_static(canvases, crop_params)
    assert "act_amax" in emb_sharded.params["blocks"]
    got = np.asarray(emb_sharded.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        jnp.asarray(canvases), jnp.asarray(crop_params),
        out_size=cfg.image_size, parity=False, dtype=jnp.bfloat16)
    flat = crops.reshape((-1,) + crops.shape[2:])
    amax = jax.tree.map(np.asarray, vit_act_amax(qparams, flat, cfg))
    sp = attach_act_amax(qparams, {"act_amax": amax["act_amax"]})
    ref = np.asarray(vit_encode_image(sp, flat, cfg)).reshape(8, 4, -1)
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_sharded_embedder_eva_int8_static_2d(rng, monkeypatch):
    """EVA02 tower + int8_static on a 2-D (data, model) mesh: calibrate_static
    must switch to the explicit-collective tp_static formulation (the former
    NotImplementedError path) and the embeddings must match the single-device
    static forward within the EVA family's cosine budget."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        init_vit_params,
        resolve_config,
        vit_act_amax,
        vit_encode_image,
    )
    from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d

    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    cfg = resolve_config("EVA-Test-Wide/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(1)))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=9)

    embedder = ShardedEmbedder(qparams, cfg, get_mesh_2d(4, 2))
    embedder.calibrate_static(canvases, crop_params)
    assert embedder._tp_static, "2-D mesh + int8_static must take tp_static"
    got = np.asarray(embedder.embed(canvases, crop_params))

    crops = fused_crop_resize_normalize(
        jnp.asarray(canvases), jnp.asarray(crop_params),
        out_size=cfg.image_size, parity=False, dtype=jnp.bfloat16)
    flat = crops.reshape((-1,) + crops.shape[2:])
    amax = jax.tree.map(np.asarray, vit_act_amax(qparams, flat, cfg))
    sp = attach_act_amax(qparams, {"act_amax": amax["act_amax"]})
    ref = np.asarray(vit_encode_image(sp, flat, cfg)).reshape(8, 4, -1)
    # bf16 e2e: the jitted single-device swiglu chain is fusion-sensitive
    # (XLA excess precision), so the e2e comparison uses the EVA family's
    # cosine budget — exact TP identity vs the op-faithful forward is pinned
    # at f32 in tests/test_tp_static.py::test_tp_static_bit_identical_eva02
    cos = np.sum(got * ref, axis=-1)
    assert np.all(cos > 0.995), cos.min()
