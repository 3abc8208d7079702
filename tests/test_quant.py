"""W8A8 dynamic quantization: matmul accuracy and end-to-end ViT quality."""
import numpy as np

import jax
import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
from clip_assisted_data_labeling_tpu.models.vit import (
    init_vit_params,
    resolve_config,
    vit_encode_image,
)
from clip_assisted_data_labeling_tpu.ops.quant import (
    is_quantized,
    q_matmul,
    quantize_vit_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip(rng):
    k = rng.normal(0, 0.02, (64, 32)).astype(np.float32)
    q, scale = quantize_weight(k)
    assert q.dtype == np.int8 and scale.shape == (32,)
    recon = q.astype(np.float32) * scale
    assert np.abs(recon - k).max() <= np.abs(k).max() / 127 + 1e-6


def test_q_matmul_accuracy(rng):
    x = rng.normal(0, 1, (16, 64)).astype(np.float32)
    k = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)
    q, scale = quantize_weight(k)
    ref = x @ k + b
    got = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b),
                 out_dtype=jnp.float32)
    )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_quantized_vit_close_to_f32(rng):
    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    qparams = quantize_vit_params(params)
    assert is_quantized(qparams)
    assert qparams["blocks"]["qkv_kernel"].dtype == jnp.int8

    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    got = np.asarray(vit_encode_image(qparams, x, cfg, compute_dtype=jnp.float32))
    cos = np.sum(ref * got, axis=-1)
    assert np.all(cos > 0.995), cos  # int8 fast mode stays close


def test_sharded_embed_with_quantized_params(rng):
    """int8 mode composes with the data-parallel mesh path."""
    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh

    cfg = resolve_config("ViT-Test/tiny")
    qparams = quantize_vit_params(init_vit_params(cfg, jax.random.key(0)))
    canvases, crop_params = _example_batch(8, 128, cfg.image_size, seed=5)
    embedder = ShardedEmbedder(qparams, cfg, get_mesh())
    emb = np.asarray(embedder.embed(canvases, crop_params))
    assert emb.shape == (8, 4, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=2e-2)


def test_encoder_int8_mode(rng):
    enc = CLIPImageEncoder("ViT-Test/tiny", compute_dtype="int8")
    assert enc.quantized
    assert is_quantized(enc.params)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    emb = np.asarray(enc.encode(x))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-2)


def test_int8_error_on_trained_weights(rng):
    """VERDICT.md item 6: the int8 error budget was only ever measured on
    random-init weights; trained weights have heavier-tailed activations.
    Train a locally-instantiated HF CLIP vision tower for some Adam steps on
    synthetic data (non-random activation scales), convert, and pin the
    W8A8-vs-f32 embedding cosine error <= 1e-3."""
    import torch

    from tests.test_vit_parity import make_hf_model, our_config

    model = make_hf_model("quick_gelu")
    cfg = our_config("quick_gelu")
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    gen = torch.Generator().manual_seed(0)
    targets = torch.randn(8, cfg.embed_dim, generator=gen)
    imgs = torch.randn(8, 3, cfg.image_size, cfg.image_size, generator=gen)
    model.train()
    for _ in range(40):  # enough to move weights well off the init distribution
        opt.zero_grad()
        out = model(pixel_values=imgs).image_embeds
        loss = torch.mean((out - targets) ** 2)
        loss.backward()
        opt.step()
    model.eval()

    from clip_assisted_data_labeling_tpu.models.clip_weights import (
        convert_torch_state_dict,
    )

    params = convert_torch_state_dict(model.state_dict(), cfg)
    qparams = quantize_vit_params(params)

    x = rng.normal(0, 1, (16, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    e32 = np.asarray(vit_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    e8 = np.asarray(vit_encode_image(qparams, x, cfg, compute_dtype=jnp.float32))
    cos = np.sum(e32 * e8, axis=-1)
    assert np.all(cos > 1 - 1e-3), f"int8 cosine error on trained weights: {1 - cos.min()}"

    # sanity: the weights really moved (else this test proves nothing new)
    init = make_hf_model("quick_gelu").state_dict()
    delta = (model.state_dict()["visual_projection.weight"] - init["visual_projection.weight"]).abs().mean()
    assert float(delta) > 1e-3


def test_static_scale_int8_close_to_dynamic(rng):
    """int8_static mode: calibrated per-tensor static activation scales must
    track the dynamic per-row path closely (both within the fast-mode budget
    vs f32)."""
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        vit_act_amax,
    )

    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    qparams = quantize_vit_params(params)

    calib = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    amax = vit_act_amax(qparams, calib, cfg, compute_dtype=jnp.float32)
    assert amax["act_amax"].shape == (cfg.layers, 4)
    assert amax["qkv_amax"].shape == (cfg.layers, 3 * cfg.width)
    assert all(np.all(np.asarray(v) > 0) for v in amax.values())
    sparams = attach_act_amax(qparams, amax)

    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    dyn = np.asarray(vit_encode_image(qparams, x, cfg, compute_dtype=jnp.float32))
    stat = np.asarray(vit_encode_image(sparams, x, cfg, compute_dtype=jnp.float32))
    assert np.all(np.sum(ref * stat, axis=-1) > 0.995)
    assert np.all(np.sum(dyn * stat, axis=-1) > 0.995)


def test_encoder_int8_static_lazy_calibration(rng):
    enc = CLIPImageEncoder("ViT-Test/tiny", compute_dtype="int8_static")
    assert enc.static_quant and enc.quantized
    assert "act_amax" not in enc.params["blocks"]
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    emb = np.asarray(enc.encode(x))
    assert "act_amax" in enc.params["blocks"]  # calibrated on first batch
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-2)
    # second call reuses the attached scales (no shape/structure change)
    emb2 = np.asarray(enc.encode(x))
    np.testing.assert_allclose(emb, emb2, atol=1e-6)


def test_int8_static_error_on_trained_weights(rng):
    """Static scales must hold the <=2e-3 budget on trained (converted)
    weights, calibrated on one batch and evaluated on ANOTHER."""
    from tests.test_vit_parity import make_hf_model, our_config

    import torch

    from clip_assisted_data_labeling_tpu.models.clip_weights import (
        convert_torch_state_dict,
    )
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        vit_act_amax,
    )

    model = make_hf_model("quick_gelu")
    cfg = our_config("quick_gelu")
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    gen = torch.Generator().manual_seed(1)
    targets = torch.randn(8, cfg.embed_dim, generator=gen)
    imgs = torch.randn(8, 3, cfg.image_size, cfg.image_size, generator=gen)
    model.train()
    for _ in range(40):
        opt.zero_grad()
        loss = torch.mean((model(pixel_values=imgs).image_embeds - targets) ** 2)
        loss.backward()
        opt.step()
    model.eval()

    params = convert_torch_state_dict(model.state_dict(), cfg)
    qparams = quantize_vit_params(params)
    calib = rng.normal(0, 1, (8, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    amax = vit_act_amax(qparams, jnp.asarray(calib), cfg, compute_dtype=jnp.float32)
    sparams = attach_act_amax(qparams, amax)

    x = rng.normal(0, 1, (16, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    e32 = np.asarray(vit_encode_image(params, jnp.asarray(x), cfg, compute_dtype=jnp.float32))
    e8s = np.asarray(vit_encode_image(sparams, jnp.asarray(x), cfg, compute_dtype=jnp.float32))
    cos = np.sum(e32 * e8s, axis=-1)
    assert np.all(cos > 1 - 2e-3), f"static-int8 cosine error: {1 - cos.min()}"


def test_calibration_persistence_order_independent(rng, tmp_path):
    """VERDICT r2 #3: with a calibration file pinned, embedding the same
    dataset in two DIFFERENT orders yields bit-identical embeddings — the
    second run loads the first run's saved scales instead of calibrating on
    whatever batch happens to come first."""
    calib = str(tmp_path / "tiny.calib.npz")
    params = init_vit_params(resolve_config("ViT-Test/tiny"), jax.random.key(0))
    b1 = jnp.asarray(rng.normal(0, 1.0, (2, 32, 32, 3)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 2.5, (2, 32, 32, 3)).astype(np.float32))

    enc_a = CLIPImageEncoder("ViT-Test/tiny", params=params,
                             compute_dtype="int8_static",
                             calibration_path=calib)
    run_a = {"b1": np.asarray(enc_a.encode(b1)), "b2": np.asarray(enc_a.encode(b2))}
    import os

    assert os.path.exists(calib)  # saved after first-batch calibration

    # fresh encoder, REVERSED batch order: must load the saved scales
    enc_b = CLIPImageEncoder("ViT-Test/tiny", params=params,
                             compute_dtype="int8_static",
                             calibration_path=calib)
    assert enc_b.load_calibration()  # resume path reuses the file
    run_b = {"b2": np.asarray(enc_b.encode(b2)), "b1": np.asarray(enc_b.encode(b1))}
    np.testing.assert_array_equal(run_a["b1"], run_b["b1"])
    np.testing.assert_array_equal(run_a["b2"], run_b["b2"])

    # control: WITHOUT the file, reversed order calibrates on b2 and the
    # scales (hence embeddings) differ — the property the file pins down
    enc_c = CLIPImageEncoder("ViT-Test/tiny", params=params,
                             compute_dtype="int8_static")
    emb_c = np.asarray(enc_c.encode(b2))
    assert not np.array_equal(emb_c, run_a["b2"])

    # a wrong-model calibration file must fail loudly, not embed garbage
    import pytest

    enc_d = CLIPImageEncoder("ViT-Test2/tiny", compute_dtype="int8_static",
                             calibration_path=calib)
    with pytest.raises(ValueError, match="wrong model"):
        enc_d.load_calibration()
