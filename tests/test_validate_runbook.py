"""Real-weight validation runbook (scripts/validate_real_weights.py) +
int8_static outlier-injection stress test (VERDICT r2 #6).

The runbook's job is to close the zero-egress gap the day real checkpoints
land; CI exercises the whole command on a locally-TRAINED HF checkpoint (the
closest thing to real weights this environment can produce), and the stress
test bounds int8_static's clipping behavior under synthetic activation
outliers NOW."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _trained_hf_model(cfg_kw, steps=30, act="quick_gelu"):
    cfg = transformers.CLIPVisionConfig(hidden_act=act, **cfg_kw)
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(cfg).eval()
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    gen = torch.Generator().manual_seed(1)
    targets = torch.randn(8, cfg_kw["projection_dim"], generator=gen)
    imgs = torch.randn(8, 3, cfg_kw["image_size"], cfg_kw["image_size"],
                       generator=gen)
    model.train()
    for _ in range(steps):
        opt.zero_grad()
        loss = torch.mean((model(pixel_values=imgs).image_embeds - targets) ** 2)
        loss.backward()
        opt.step()
    return model.eval()


@pytest.mark.slow
def test_runbook_end_to_end(tmp_path):
    """The one-command runbook must convert, torch-parity-check, quantization-
    ladder and margin-audit a trained HF checkpoint and report PASS."""
    model = _trained_hf_model(dict(
        hidden_size=64, intermediate_size=256, num_hidden_layers=3,
        num_attention_heads=4, patch_size=8, image_size=32, projection_dim=16,
    ))
    ckpt = tmp_path / "trained.pt"
    torch.save(model.state_dict(), ckpt)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/validate_real_weights.py"),
         str(ckpt), "ViT-Test-HF/tiny", "--cpu"],
        capture_output=True, text=True, timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "PASS" in proc.stdout, out


@pytest.mark.slow
def test_runbook_siglip_checkpoint(tmp_path):
    """The runbook must route an HF SiglipVisionModel checkpoint through the
    SigLIP converter + torch executor (pooler_output) and the quant ladder."""
    cfg = transformers.SiglipVisionConfig(
        hidden_size=64, intermediate_size=224, num_hidden_layers=2,
        num_attention_heads=4, patch_size=8, image_size=32,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(cfg).eval()
    ckpt = tmp_path / "siglip.pt"
    torch.save(model.state_dict(), ckpt)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/validate_real_weights.py"),
         str(ckpt), "SigLIP-Test/tiny", "--cpu"],
        capture_output=True, text=True, timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "PASS" in proc.stdout, out
    assert "f32 vs HF torch" in proc.stdout, out  # the executor actually ran
    assert "torch-parity" in out and "OK" in out, out
    assert "[margin]" in out, out


def test_int8_static_outlier_stress(rng):
    """Synthetic outlier injection: scale a few MLP hidden channels 8x (the
    activation-outlier pattern trained CLIP towers are known for) and verify
    int8_static — calibrated on a DIFFERENT batch with the production margin —
    degrades gracefully: still within the fast-mode budget vs the f32 forward
    of the SAME outlier-heavy model."""
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        init_vit_params,
        resolve_config,
        vit_act_amax,
        vit_encode_image,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params

    cfg = resolve_config("ViT-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(0))
    blocks = dict(params["blocks"])
    fc1 = np.asarray(blocks["fc1_kernel"]).copy()
    cols = [3, 77, 145, 200]  # a few hidden channels become 8x outliers
    fc1[:, :, cols] *= 8.0
    blocks["fc1_kernel"] = jnp.asarray(fc1)
    params = {**params, "blocks": blocks}

    qparams = quantize_vit_params(params)
    calib = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    evalb = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    amax = vit_act_amax(qparams, calib, cfg, compute_dtype=jnp.float32)
    assert np.asarray(amax["act_amax"]).max() > 4.0  # outliers dominate a site
    sparams = attach_act_amax(qparams, {"act_amax": amax["act_amax"]})

    ref = np.asarray(vit_encode_image(params, evalb, cfg,
                                      compute_dtype=jnp.float32))
    stat = np.asarray(vit_encode_image(sparams, evalb, cfg,
                                       compute_dtype=jnp.float32))
    cos = np.sum(ref * stat, axis=-1)
    # graceful clipping bound: an 8x-outlier tower stays inside the fast-mode
    # budget (the per-tensor scale stretches, costing resolution everywhere —
    # this bounds that cost, it does not hide it)
    assert np.all(cos > 0.99), cos
    assert np.all(np.isfinite(stat))
