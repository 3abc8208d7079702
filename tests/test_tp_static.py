"""Tensor-parallel int8_static (parallel/tp_static.py): the explicit-
collective shard_map formulation must be BIT-IDENTICAL to the single-device
static forward (int32 psums before dequant), closing the round-2 gap where TP
silently downgraded int8_static to dynamic quantization."""
import numpy as np

import jax
import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.vit import (
    attach_act_amax,
    init_vit_params,
    resolve_config,
    vit_act_amax,
    vit_encode_image,
)
from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params
from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d
from clip_assisted_data_labeling_tpu.parallel.tp_static import (
    place_tp_static,
    reorder_qkv_tp,
    vit_encode_tp_static,
)


def _static_params(name, rng, seed=0):
    cfg = resolve_config(name)
    params = init_vit_params(cfg, jax.random.key(seed))
    qparams = quantize_vit_params(params)
    calib = jnp.asarray(
        rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    amax = vit_act_amax(qparams, calib, cfg, compute_dtype=jnp.float32)
    return cfg, attach_act_amax(qparams, {"act_amax": amax["act_amax"]})


def test_reorder_qkv_is_exact(rng):
    """The per-device qkv column permutation must leave the (unsharded)
    forward unchanged when heads are regrouped accordingly — checked by
    reordering for m=1 (identity) and m=2 (permuted) and comparing the qkv
    projection outputs per head block."""
    cfg, sparams = _static_params("ViT-Test/tiny", rng)
    re2 = reorder_qkv_tp(sparams, cfg, 2)
    k0 = np.asarray(sparams["blocks"]["qkv_kernel"])
    k2 = np.asarray(re2["blocks"]["qkv_kernel"])
    w, d, hpd = cfg.width, cfg.head_dim, cfg.heads // 2
    # device 0's local packed block [q_0|k_0|v_0]
    local = k2[:, :, : 3 * hpd * d]
    np.testing.assert_array_equal(local[:, :, : hpd * d],
                                  k0[:, :, : hpd * d])  # q heads 0..hpd
    np.testing.assert_array_equal(local[:, :, hpd * d : 2 * hpd * d],
                                  k0[:, :, w : w + hpd * d])  # k heads
    np.testing.assert_array_equal(local[:, :, 2 * hpd * d :],
                                  k0[:, :, 2 * w : 2 * w + hpd * d])  # v heads


def test_tp_static_bit_identical_clip(rng):
    cfg, sparams = _static_params("ViT-Test/tiny", rng)
    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=False))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=False))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_coca(rng):
    """CoCa towers: standard trunk + the attentional-pool contrastive readout
    (replicated pool_* leaves, ln_post over the pooled dim) through the TP
    static path."""
    cfg, sparams = _static_params("CoCa-Test/tiny", rng)
    assert cfg.pool == "coca"
    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=False))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=False))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_pe(rng):
    """PE family: RoPE rotations + probe attention pooling through the TP
    static path."""
    cfg, sparams = _static_params("PE-Test/tiny", rng)
    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=False))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=False))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_siglip(rng):
    """SigLIP family: biased patch embed, gelu_tanh epilogues, MAP-head
    readout (probe MHA + residual MLP) through the TP static path — the
    head and patch-bias leaves are replicated compute over sharded trunk
    activations."""
    cfg, sparams = _static_params("SigLIP-Test/tiny", rng)
    x = jnp.asarray(
        rng.normal(0, 0.5, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=False))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=False))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_fused_attention(rng, monkeypatch):
    """The production default on real hardware runs the FUSED attention
    kernels (models/vit.default_fused_attention), where the TP shard routes
    by its LOCAL shape — this drives both sides through the fused path in
    interpreter mode so the bit-identity claim covers the shipped
    configuration, not just the XLA fallback the other tests pin."""
    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    cfg, sparams = _static_params("ViT-Test/tiny", rng)
    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=True))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=True))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_int8_wire(rng, monkeypatch):
    """The q8s int8 attention wire's TP formulation: qkv_amax is permuted
    with the qkv columns (reorder_qkv_tp) and sharded P(None, 'model'), each
    device folds its local [3·wl] scale slice, and the kernel's int8 output
    (under the replicated attn-out scalar) feeds the int32-psum row-parallel
    out-projection — BIT-identical to the single-device wire block
    (models/vit._block_int8_static_wire), interpreter-mode Pallas."""
    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    cfg = resolve_config("ViT-Test/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(0)))
    calib = jnp.asarray(
        rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    amax = vit_act_amax(qparams, calib, cfg, compute_dtype=jnp.float32)
    sparams = attach_act_amax(
        qparams, {"act_amax": amax["act_amax"], "qkv_amax": amax["qkv_amax"]})

    from clip_assisted_data_labeling_tpu.ops.attention import packed_q8s_fits

    # this shape must take the wire block on BOTH sides (global and 2-shard)
    assert packed_q8s_fits(cfg.seq_len, cfg.width, cfg.heads)
    assert packed_q8s_fits(cfg.seq_len, cfg.width // 2, cfg.heads // 2)

    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=True))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=True))
    np.testing.assert_array_equal(tp, single)


def test_tp_static_bit_identical_eva02(rng, monkeypatch):
    """EVA02 blocks (swiglu + sub-LNs + rope) through the explicit-collective
    TP path: fc1 columns pair-reordered per device, full-width sub-LNs via
    gather→replicated-LN→slice, int32-psum row-parallel matmuls.

    Bit-identity is asserted against the OP-FAITHFUL (eager) single-device
    forward: the jitted single-device swiglu chain is fusion-sensitive (XLA
    keeps excess precision through the fc1-epilogue→silu→ffn-LN chain, so the
    jitted forward differs from its own eager semantics by int8-rounding-
    boundary ulps — measured 7.7e-3 on random-init embeddings — with or
    without TP). Against the jitted production forward we therefore assert a
    tight cosine instead. Interpreter-mode Pallas, lnk route (width 128)."""
    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    cfg, sparams = _static_params("EVA-Test-Wide/tiny", rng)
    assert cfg.mlp_type == "swiglu" and cfg.attn_inner_ln and cfg.use_rope2d

    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    with jax.disable_jit():
        eager = np.asarray(vit_encode_image(
            sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=True,
            normalize=False))
    jitted = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=True))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp_raw = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=True, normalize=False))
    np.testing.assert_array_equal(tp_raw, eager)

    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=True))
    cos = np.sum(tp * jitted, axis=-1)
    assert np.all(cos > 0.999), cos


def test_reorder_swiglu_fc1_pairing(rng):
    """The swiglu fc1 pair-reorder must put [w1_j | w2_j] on device j so the
    silu gate is shard-local."""
    cfg, sparams = _static_params("EVA-Test-Wide/tiny", rng)
    mlp = np.asarray(sparams["blocks"]["fc1_kernel"]).shape[-1] // 2
    re2 = reorder_qkv_tp(sparams, cfg, 2)
    k0 = np.asarray(sparams["blocks"]["fc1_kernel"])
    k2 = np.asarray(re2["blocks"]["fc1_kernel"])
    ml = mlp // 2
    # device 0's local [w1_0 | w2_0]
    np.testing.assert_array_equal(k2[:, :, :ml], k0[:, :, :ml])
    np.testing.assert_array_equal(k2[:, :, ml : 2 * ml],
                                  k0[:, :, mlp : mlp + ml])
    # device 1's local [w1_1 | w2_1]
    np.testing.assert_array_equal(k2[:, :, 2 * ml : 3 * ml],
                                  k0[:, :, ml:mlp])
    np.testing.assert_array_equal(k2[:, :, 3 * ml :],
                                  k0[:, :, mlp + ml :])


def test_tp_static_requires_calibration(rng):
    import pytest

    cfg = resolve_config("ViT-Test/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(0)))
    mesh = get_mesh_2d(2, 2)
    x = jnp.zeros((4, cfg.image_size, cfg.image_size, 3), jnp.float32)
    with pytest.raises(ValueError, match="act_amax"):
        vit_encode_tp_static(qparams, x, cfg, mesh, compute_dtype=jnp.float32)


def test_sharded_embedder_tp_static_pipeline(rng, tmp_path):
    """Pipeline-level composition: a 2-D (data, model) ShardedEmbedder in
    int8_static mode must switch to the explicit-collective TP program after
    calibration (no silent dynamic-quant downgrade) and produce exactly the
    single-device static embeddings."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.encoders import load_calibration
    from clip_assisted_data_labeling_tpu.ops.crops import (
        fused_crop_resize_normalize,
    )
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import (
        ShardedEmbedder,
    )

    cfg = resolve_config("ViT-Test/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(0)))
    canvases, cp = _example_batch(4, 128, cfg.image_size)
    calib_path = str(tmp_path / "tiny.calib.npz")

    mesh2 = get_mesh_2d(2, 2)
    emb = ShardedEmbedder(qparams, cfg, mesh2, compute_dtype=jnp.float32,
                          calibration_path=calib_path,
                          model_name="ViT-Test/tiny")
    emb.calibrate_static(canvases, cp)
    assert emb._tp_static, "2-D mesh must take the explicit-collective path"
    got = np.asarray(emb.embed(canvases, cp))

    # single-device reference with the SAME persisted calibration
    amax = load_calibration(calib_path)
    amax.pop("_model_name", None)
    sparams = attach_act_amax(qparams, {"act_amax": amax["act_amax"]})
    crops = fused_crop_resize_normalize(
        jnp.asarray(canvases), jnp.asarray(cp), out_size=cfg.image_size,
        parity=False, dtype=jnp.float32,
    )
    b, n = crops.shape[:2]
    ref = np.asarray(vit_encode_image(
        sparams, crops.reshape((b * n,) + crops.shape[2:]), cfg,
        compute_dtype=jnp.float32, fused_attention=False,
    )).reshape(b, n, -1)
    np.testing.assert_array_equal(got, ref)


def test_tp_static_bit_identical_clipa(rng):
    """CLIPA towers: the avg-pool readout (mean over patch tokens, ln_post
    after pooling, no ln_pre) through the TP static path. Regression test
    for the round-5b review finding: tp_static's readout fell through to
    the cls branch for pool='avg', silently returning ln_post(x[:,0])@proj
    embeddings (min cosine 0.23 vs single-device) on 2-D meshes."""
    cfg, sparams = _static_params("CLIPA-Test/tiny", rng)
    assert cfg.pool == "avg" and not cfg.use_ln_pre
    x = jnp.asarray(
        rng.normal(0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )
    single = np.asarray(vit_encode_image(
        sparams, x, cfg, compute_dtype=jnp.float32, fused_attention=False))
    mesh = get_mesh_2d(2, 2)
    placed = place_tp_static(sparams, mesh, cfg)
    tp = np.asarray(vit_encode_tp_static(
        placed, x, cfg, mesh, compute_dtype=jnp.float32,
        fused_attention=False))
    np.testing.assert_array_equal(tp, single)
