"""ConvNeXt tower parity: our JAX ConvNeXt forward + weight conversion vs a
locally-instantiated HF ``ConvNextModel`` mirror (zero egress — same policy
as the SigLIP family).

The reference reaches ConvNeXt towers through open_clip's generic dispatch
(utils/embedder.py:58-63, e.g. 'convnext_base_w/laion2b_s13b_b82k').
open_clip/timm is not installed here; HF's ConvNextModel implements the
identical trunk math (dw7x7 -> LN(1e-6) -> Linear 4x -> GELU -> Linear ->
layer-scale -> residual; stem conv4/4 + LN; LN + conv2/2 downsampling;
avg-pool -> LN readout), so it is the authoritative mirror for trunk parity.
The open_clip/timm checkpoint layout ('visual.trunk.*' + 'visual.head.*')
is exercised by key-renaming the same tensors — identical math, different
state-dict dialect — with both projection-head kinds (linear and mlp)."""
import dataclasses
import os

import numpy as np
import pytest

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.convnext import (
    CNX_TEST_TINY,
    CNXConfig,
    cnx_encode_image,
)
from clip_assisted_data_labeling_tpu.models.vit import resolve_config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_mirror(cfg: CNXConfig, seed: int = 0):
    torch.manual_seed(seed)
    hf_cfg = transformers.ConvNextConfig(
        num_channels=3, patch_size=4, num_stages=len(cfg.depths),
        hidden_sizes=list(cfg.dims), depths=list(cfg.depths),
        hidden_act="gelu", layer_norm_eps=cfg.head_ln_eps,
        layer_scale_init_value=1e-6, drop_path_rate=0.0,
        image_size=cfg.image_size,
    )
    model = transformers.ConvNextModel(hf_cfg).eval()
    # non-degenerate weights: _init_weights leaves LNs at 1/0 and gammas at
    # 1e-6, which would hide conversion bugs in those tensors
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, t in model.named_parameters():
            if "layernorm" in name or "layer_scale" in name:
                t.copy_(torch.randn(t.shape, generator=gen) * 0.3 + 0.8)
    return model


def _hf_forward(model, x: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(torch.tensor(x).permute(0, 3, 1, 2))
    return out.pooler_output.numpy()


def _to_timm_sd(hf_sd: dict, cfg: CNXConfig) -> dict:
    """Rename HF ConvNextModel keys to the open_clip/timm trunk layout."""
    ren = {
        "embeddings.patch_embeddings": "trunk.stem.0",
        "embeddings.layernorm": "trunk.stem.1",
        "layernorm": "trunk.head.norm",
    }
    out = {}
    for k, v in hf_sd.items():
        for src, dst in ren.items():
            if k.startswith(src + "."):
                k = dst + k[len(src):]
                break
        else:
            k = (k.replace("encoder.stages.", "trunk.stages.")
                 .replace(".downsampling_layer.", ".downsample.")
                 .replace(".layers.", ".blocks.")
                 .replace(".dwconv.", ".conv_dw.")
                 .replace(".layernorm.", ".norm.")
                 .replace(".pwconv1.", ".mlp.fc1.")
                 .replace(".pwconv2.", ".mlp.fc2.")
                 .replace(".layer_scale_parameter", ".gamma"))
        out["visual." + k] = v
    return out


def test_cnx_trunk_matches_hf(rng):
    """Trunk-only parity (identity proj): our forward == HF pooler_output."""
    cfg = dataclasses.replace(CNX_TEST_TINY, embed_dim=CNX_TEST_TINY.dims[-1])
    model = make_mirror(cfg)
    params = convert_torch_state_dict(model.state_dict(), cfg)
    x = rng.normal(0, 1, (3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ref = _hf_forward(model, x)
    out = np.asarray(cnx_encode_image(params, jnp.asarray(x), cfg,
                                      compute_dtype=jnp.float32,
                                      normalize=False))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_cnx_open_clip_layout_with_proj(rng, proj):
    """open_clip/timm key dialect + both projection-head kinds, L2-normalized
    output vs the HF trunk + a matching torch head."""
    cfg = dataclasses.replace(CNX_TEST_TINY, proj=proj)
    model = make_mirror(cfg, seed=3)
    sd = _to_timm_sd(model.state_dict(), cfg)
    cl, e = cfg.final_width, cfg.embed_dim
    torch.manual_seed(7)
    if proj == "linear":
        head = torch.nn.Linear(cl, e).eval()
        sd["visual.head.proj.weight"] = head.weight
        sd["visual.head.proj.bias"] = head.bias
        apply_head = lambda t: head(t)  # noqa: E731
    else:
        fc1 = torch.nn.Linear(cl, 2 * e).eval()
        fc2 = torch.nn.Linear(2 * e, e).eval()
        sd["visual.head.mlp.fc1.weight"] = fc1.weight
        sd["visual.head.mlp.fc1.bias"] = fc1.bias
        sd["visual.head.mlp.fc2.weight"] = fc2.weight
        sd["visual.head.mlp.fc2.bias"] = fc2.bias
        apply_head = lambda t: fc2(torch.nn.functional.gelu(fc1(t)))  # noqa: E731

    params = convert_torch_state_dict(sd, cfg)
    x = rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = apply_head(torch.tensor(_hf_forward(model, x))).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    out = np.asarray(cnx_encode_image(params, jnp.asarray(x), cfg,
                                      compute_dtype=jnp.float32))
    cos = np.sum(out * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_cnx_bf16_within_parity_budget(rng):
    """bf16 compute stays within the 1e-3 cosine budget of the f32 path
    (BASELINE.md budget, same bar as the ViT/RN towers)."""
    cfg = dataclasses.replace(CNX_TEST_TINY, embed_dim=CNX_TEST_TINY.dims[-1])
    model = make_mirror(cfg, seed=5)
    params = convert_torch_state_dict(model.state_dict(), cfg)
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32))
    f32 = np.asarray(cnx_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    bf16 = np.asarray(cnx_encode_image(params, x, cfg,
                                       compute_dtype=jnp.bfloat16))
    cos = np.sum(f32 * bf16, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"bf16 cosine error {1 - cos}"


def test_cnx_registry():
    for name, dim, res, proj in (
            ("convnext_base", 512, 224, "linear"),
            ("convnext_base_w", 640, 256, "linear"),
            ("convnext_base_w_320", 640, 320, "linear"),
            ("convnext_large_d", 768, 256, "mlp"),
            ("convnext_large_d_320", 768, 320, "mlp"),
            ("convnext_xxlarge", 1024, 256, "linear")):
        cfg = resolve_config(f"{name}/laion2b_s13b_b82k")
        assert isinstance(cfg, CNXConfig)
        assert cfg.embed_dim == dim and cfg.image_size == res
        assert cfg.proj == proj and cfg.patch_size is None


def test_cnx_encoder_wrapper(rng, caplog):
    """CLIPImageEncoder dispatches ConvNeXt names end-to-end: random-init
    encode, the fused embed_crops path, and the int8→bf16 downgrade guard."""
    import logging

    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.ops.crops import make_crop_params

    enc = CLIPImageEncoder("CNX-Test/laion2b", compute_dtype=jnp.float32)
    assert enc.img_resolution == 64 and enc.embed_dim == 16
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    emb = np.asarray(enc.encode(jnp.asarray(x)))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    canvas_size = 128
    sizes = [(120, 80), (40, 50)]  # (w, h)
    canvas = np.zeros((2, canvas_size, canvas_size, 3), dtype=np.uint8)
    params = np.zeros((2, 4, 2, 4), dtype=np.float32)
    for i, (w, h) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        oy, ox = (canvas_size - h) // 2, (canvas_size - w) // 2
        canvas[i, oy:oy + h, ox:ox + w] = img
        params[i] = make_crop_params(w, h, canvas_size, enc.img_resolution)
    out = np.asarray(enc.embed_crops(jnp.asarray(canvas), jnp.asarray(params)))
    assert out.shape == (2, 4, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    # dynamic int8 has no ConvNeXt formulation — downgrades with a warning
    with caplog.at_level(logging.WARNING):
        enc8 = CLIPImageEncoder("CNX-Test/laion2b", compute_dtype="int8")
    assert not enc8.quantized and not enc8.static_quant
    assert any("no int8 formulation" in r.message for r in caplog.records)


def test_cnx_int8_auto_gate():
    """The per-model auto default enables W8A8 exactly where it measured a
    win (final width >= 1536 — BENCH_NOTES round-10)."""
    from clip_assisted_data_labeling_tpu.models.convnext import (
        cnx_int8_static_enabled,
    )

    assert cnx_int8_static_enabled(resolve_config("convnext_large_d/x"))
    assert cnx_int8_static_enabled(resolve_config("convnext_xxlarge/x"))
    assert not cnx_int8_static_enabled(resolve_config("convnext_base_w/x"))
    assert not cnx_int8_static_enabled(resolve_config("CNX-Test/laion2b"))


def test_cnx_int8_static_within_budget(rng, monkeypatch):
    """ConvNeXt int8_static (W8A8 pointwise matmuls, models/convnext.py):
    first-batch calibration attaches per-stage [depth, 2] site amaxes and the
    static-path embeddings track f32 within the fast-mode cosine budget.
    (Knob forced ON: auto resolves off for the tiny test geometry —
    cnx_int8_static_enabled.)"""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.ops import knobs

    monkeypatch.setattr(knobs, "CNX_INT8", "on")

    x = rng.normal(0, 0.7, (2, 64, 64, 3)).astype(np.float32)

    ref = np.asarray(
        CLIPImageEncoder("CNX-Test/laion2b", compute_dtype=jnp.float32)
        .encode(jnp.asarray(x)))

    enc8 = CLIPImageEncoder("CNX-Test/laion2b", compute_dtype="int8_static")
    assert enc8.quantized and enc8.static_quant
    assert "s0_fc1_kernel_scale" in enc8.params
    got = np.asarray(enc8.encode(jnp.asarray(x)))
    assert enc8._calibrated()
    assert enc8.params["s0_act_amax"].shape == (
        resolve_config("CNX-Test/laion2b").depths[0], 2)
    cos = np.sum(ref * got, axis=-1)
    assert np.all(cos > 0.995), cos.min()

    # second encode takes the fully-static path with identical results
    again = np.asarray(enc8.encode(jnp.asarray(x)))
    np.testing.assert_array_equal(got, again)


def test_cnx_int8_static_calibration_roundtrip(rng, tmp_path, monkeypatch):
    """ConvNeXt calibration persistence: scales save to npz with provenance,
    reload on a fresh encoder (no recalibration forward), and a wrong-model
    file is rejected."""
    import pytest

    from clip_assisted_data_labeling_tpu.models.encoders import (
        CLIPImageEncoder,
        check_calibration,
        load_calibration,
    )
    from clip_assisted_data_labeling_tpu.ops import knobs

    monkeypatch.setattr(knobs, "CNX_INT8", "on")

    calib = str(tmp_path / "cnx.calib.npz")
    x = rng.normal(0, 0.7, (2, 64, 64, 3)).astype(np.float32)
    enc = CLIPImageEncoder("CNX-Test/laion2b", compute_dtype="int8_static",
                           calibration_path=calib)
    first = np.asarray(enc.encode(jnp.asarray(x)))
    assert os.path.exists(calib)

    enc2 = CLIPImageEncoder("CNX-Test/laion2b", compute_dtype="int8_static",
                            calibration_path=calib)
    assert enc2.load_calibration()
    np.testing.assert_array_equal(np.asarray(enc2.encode(jnp.asarray(x))),
                                  first)

    amax = load_calibration(calib)
    with pytest.raises(ValueError, match="calibrated for"):
        check_calibration(amax, resolve_config("CNX-Test/laion2b"), calib,
                          model_name="some-other-model")
    vit_cfg = resolve_config("ViT-Test/tiny")
    amax.pop("_model_name", None)
    with pytest.raises(ValueError):
        check_calibration(amax, vit_cfg, calib)
