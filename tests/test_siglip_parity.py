"""SigLIP encoder parity: our MAP-head ViT vs HF SiglipVisionModel.

The reference reaches SigLIP checkpoints through open_clip's
``create_model_and_transforms`` (utils/embedder.py:61-63, any
"Arch/pretrained" string — _1_embed_with_CLIP.py:69-75); open_clip's SigLIP
towers are weight-compatible with HF ``SiglipVisionModel``, which we can
instantiate locally with random weights (zero-egress environment). f32
agreement must be far inside the ≤1e-3 cosine budget (BASELINE.md)."""
import numpy as np
import pytest

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_siglip_visual,
    convert_torch_state_dict,
    load_params_npz,
    save_params_npz,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    MODEL_REGISTRY,
    init_vit_params,
    resolve_config,
    vit_encode_image,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = MODEL_REGISTRY["SigLIP-Test/tiny"]


def make_hf_model():
    cfg = transformers.SiglipVisionConfig(
        hidden_size=CFG.width,
        intermediate_size=CFG.mlp_dim,
        num_hidden_layers=CFG.layers,
        num_attention_heads=CFG.heads,
        patch_size=CFG.patch_size,
        image_size=CFG.image_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=CFG.ln_eps,
    )
    torch.manual_seed(0)
    return transformers.SiglipVisionModel(cfg).eval()


def test_tiny_config_matches_hf_defaults():
    """The registry config must describe the same architecture the converter
    expects: MAP pool, no cls/ln_pre/proj, biased patch conv, tanh gelu."""
    assert CFG.pool == "map" and not CFG.use_cls_token
    assert not CFG.use_ln_pre and not CFG.use_proj and CFG.patch_bias
    assert CFG.act == "gelu_tanh" and CFG.embed_dim == CFG.width
    assert CFG.seq_len == CFG.grid * CFG.grid  # no cls row


def test_siglip_matches_hf(rng):
    model = make_hf_model()
    params = convert_torch_state_dict(model.state_dict(), CFG)

    x = rng.normal(0, 0.5, (3, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(x).permute(0, 3, 1, 2)
        ).pooler_output
    ref = ref.numpy()
    ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    out = np.asarray(
        vit_encode_image(params, jnp.asarray(x), CFG, compute_dtype=jnp.float32)
    )
    cos = np.sum(out * ref_n, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"

    # unnormalized pooled vector too (the MAP head output itself)
    raw = np.asarray(vit_encode_image(
        params, jnp.asarray(x), CFG, compute_dtype=jnp.float32,
        normalize=False))
    np.testing.assert_allclose(raw, ref, atol=2e-4, rtol=1e-3)


def test_siglip_bf16_within_budget(rng):
    model = make_hf_model()
    params = convert_torch_state_dict(model.state_dict(), CFG)
    x = jnp.asarray(
        rng.normal(0, 0.5, (4, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32))
    f32 = np.asarray(vit_encode_image(params, x, CFG, compute_dtype=jnp.float32))
    bf16 = np.asarray(vit_encode_image(params, x, CFG, compute_dtype=jnp.bfloat16))
    cos = np.sum(f32 * bf16, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"bf16 cosine error {1 - cos}"


def test_siglip_npz_roundtrip(tmp_path, rng):
    """Checkpoint save/load preserves the MAP-head leaves (incl. patch_bias)."""
    model = make_hf_model()
    params = convert_siglip_visual(model.state_dict(), CFG)
    path = str(tmp_path / "siglip.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    assert set(loaded) == set(params)
    x = jnp.asarray(
        rng.normal(0, 0.5, (2, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32))
    a = np.asarray(vit_encode_image(params, x, CFG, compute_dtype=jnp.float32))
    b = np.asarray(vit_encode_image(loaded, x, CFG, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_siglip_registry_names():
    """Every SigLIP arch resolves via 'Arch/pretrained' like the reference's
    open_clip names, with the family's architectural flags set."""
    for name in (
        "ViT-B-16-SigLIP/webli",
        "ViT-L-16-SigLIP-384/webli",
        "ViT-SO400M-14-SigLIP-384/webli",
        "ViT-SO400M-14-SigLIP-384/webli2",  # arbitrary pretrained tag
    ):
        cfg = resolve_config(name)
        assert cfg.pool == "map" and cfg.act == "gelu_tanh"
        assert cfg.norm_mean == (0.5, 0.5, 0.5)
        assert not cfg.use_proj and cfg.embed_dim == cfg.width
    so = resolve_config("ViT-SO400M-14-SigLIP-384/webli")
    assert so.mlp_dim == 4304 and so.head_dim == 72


def test_siglip2_name_parsing():
    """SigLIP2 fixed-res names resolve by geometry parsing (no per-name
    table): same trunk as SigLIP, resolution/patch from the name."""
    cases = {
        "ViT-B-16-SigLIP2/webli": (768, 12, 16, 224),
        "ViT-B-16-SigLIP2-384/webli": (768, 12, 16, 384),
        "ViT-L-16-SigLIP2-512/webli": (1024, 24, 16, 512),
        "ViT-SO400M-14-SigLIP2-378/webli": (1152, 27, 14, 378),
        "ViT-SO400M-16-SigLIP2-256/webli": (1152, 27, 16, 256),
    }
    for name, (w, L, p, r) in cases.items():
        cfg = resolve_config(name)
        assert (cfg.width, cfg.layers, cfg.patch_size, cfg.image_size) == (
            w, L, p, r), name
        assert cfg.pool == "map" and not cfg.use_proj and cfg.embed_dim == w
    # non-patch-divisible resolutions are VALID (ADVICE r3): the patchify path
    # implements stride-p valid-padding conv semantics — 250 = 15*16 + 10,
    # trailing 10 px unread, grid 15 (see models/vit._patch_embed)
    ragged = resolve_config("ViT-B-16-SigLIP2-250/webli")
    assert (ragged.image_size, ragged.patch_size) == (250, 16)
    assert ragged.grid == 15
    # the gopt (giant-opt) family resolves since round 5 (big_vision g-opt
    # trunk: width 1536, depth 40 — tests/test_name_resolution.py)
    gopt = resolve_config("ViT-gopt-16-SigLIP2-384/webli")
    assert (gopt.width, gopt.layers, gopt.image_size) == (1536, 40, 384)
    with pytest.raises(ValueError):  # unknown family stays a loud error
        resolve_config("ViT-XQ-16-SigLIP2-384/webli")


@pytest.mark.parametrize("mode", ["int8", "int8_static"])
def test_siglip_int8_within_budget(mode, rng):
    """W8A8 modes must stay inside the ≤1e-3 cosine budget on the SigLIP
    tower too — exercises the quant kernels' gelu_tanh epilogue and the
    MAP-head (unquantized) readout over quantized trunk activations."""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from __graft_entry__ import _example_batch

    f32 = CLIPImageEncoder("SigLIP-Test/tiny", compute_dtype=np.float32)
    q = CLIPImageEncoder("SigLIP-Test/tiny", compute_dtype=mode)
    canv, cp = _example_batch(4, 64, f32.img_resolution, seed=3)
    a = np.asarray(f32.embed_crops(canv, cp), np.float32).reshape(-1, CFG.width)
    b = np.asarray(q.embed_crops(canv, cp), np.float32).reshape(-1, CFG.width)
    cos = np.sum(a * b, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"{mode} cosine error {1 - cos}"


def test_siglip_embed_pipeline(tmp_path, rng):
    """Full stage-1 drive with a SigLIP model: CLI embed → sidecars + store
    carry the model key, 4 crops at the SigLIP dim, and the img stats."""
    from PIL import Image

    from clip_assisted_data_labeling_tpu.pipeline import embed as embed_cli
    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

    root = tmp_path / "data"
    root.mkdir()
    for i in range(3):
        arr = (rng.uniform(0, 255, (40 + 8 * i, 56, 3))).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.jpg")
    embed_cli.main([
        "--root_dir", str(root), "--models_to_use", "SigLIP-Test/tiny",
        "--batch_size", "2", "--canvas_size", "64",
        "--compute_dtype", "float32",
    ])
    sc = read_sidecar(str(root / "img_0.pt"))
    feats = sc["SigLIP-Test/tiny"]
    assert feats["centre_crop"].shape == (1, CFG.width)
    assert any(k.startswith("img_stat_") for k in feats)


def test_siglip_random_init_runs(rng):
    """init_vit_params builds a complete MAP-head pytree (all pool leaves,
    patch bias, no ln_pre/proj) that runs end to end."""
    import jax

    params = init_vit_params(CFG, jax.random.key(0))
    assert "patch_bias" in params and "pool_fc1_kernel" in params
    assert "ln_pre_scale" not in params and "proj" not in params
    x = jnp.asarray(
        rng.normal(0, 0.5, (2, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32))
    out = np.asarray(vit_encode_image(params, x, CFG, compute_dtype=jnp.float32))
    assert out.shape == (2, CFG.width)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


RAGGED = MODEL_REGISTRY["SigLIP-Test-Ragged/tiny"]


def make_hf_ragged_model():
    cfg = transformers.SiglipVisionConfig(
        hidden_size=RAGGED.width,
        intermediate_size=RAGGED.mlp_dim,
        num_hidden_layers=RAGGED.layers,
        num_attention_heads=RAGGED.heads,
        patch_size=RAGGED.patch_size,
        image_size=RAGGED.image_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=RAGGED.ln_eps,
    )
    torch.manual_seed(1)
    return transformers.SiglipVisionModel(cfg).eval()


def test_siglip_non_divisible_resolution_matches_hf(rng):
    """SO400M-14 @384 geometry class (image_size % patch != 0): HF's
    valid-padding stride conv drops the trailing remainder pixels
    (SiglipVisionEmbeddings Conv2d padding="valid"); our patchify slice must
    reproduce it exactly. Regression for the 384=27*14+6 reshape crash."""
    model = make_hf_ragged_model()
    params = convert_torch_state_dict(model.state_dict(), RAGGED)
    assert RAGGED.image_size % RAGGED.patch_size != 0  # the point of the test
    x = rng.normal(0, 0.5, (3, RAGGED.image_size, RAGGED.image_size, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(x).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    ref_n = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    out = np.asarray(vit_encode_image(
        params, jnp.asarray(x), RAGGED, compute_dtype=jnp.float32))
    cos = np.sum(out * ref_n, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"


def test_non_divisible_crop_grid_matches_full_resample(rng):
    """The pre-patchified crop path must equal patchify(full resample) with
    the trailing remainder rows/cols dropped, to within ONE uint8 rounding
    step: the grid-split einsum may associate the canvas contraction
    differently (±1 ulp before parity mode's floor(x+0.5), flipping exact-.5
    roundings); the geometry itself must be exact."""
    from clip_assisted_data_labeling_tpu.ops.crops import (
        fused_crop_resize_normalize,
    )
    from clip_assisted_data_labeling_tpu.models.vit import patchify
    from __graft_entry__ import _example_batch

    R, p = RAGGED.image_size, RAGGED.patch_size
    g = R // p
    canv, cp = _example_batch(2, 64, R, seed=11)
    ns = dict(mean=RAGGED.norm_mean, std=RAGGED.norm_std)
    full = np.asarray(fused_crop_resize_normalize(
        canv, cp, out_size=R, parity=True, dtype=jnp.float32, **ns))
    b, n = full.shape[:2]
    sliced = full[:, :, : g * p, : g * p].reshape(b * n, g * p, g * p, 3)
    want = np.asarray(patchify(jnp.asarray(sliced), p)).reshape(
        b, n, g * g, p * p * 3)
    got = np.asarray(fused_crop_resize_normalize(
        canv, cp, out_size=R, parity=True, dtype=jnp.float32, patch_size=p,
        **ns))
    # one uint8 count in normalized units, per channel (SigLIP std = 0.5)
    step = 1.0 / (255.0 * np.min(RAGGED.norm_std))
    assert np.abs(got - want).max() <= step * 1.001, (
        f"max diff {np.abs(got - want).max()} vs one-uint8-step {step}")


def test_siglip_ragged_embed_crops_runs(rng):
    """The full encoder crops path (the one the embed CLI and bench drive)
    must run at a non-divisible resolution and produce unit embeddings."""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from __graft_entry__ import _example_batch

    enc = CLIPImageEncoder("SigLIP-Test-Ragged/tiny", compute_dtype=np.float32)
    canv, cp = _example_batch(2, 64, enc.img_resolution, seed=5)
    out = np.asarray(enc.embed_crops(canv, cp))
    assert out.shape == (2, 4, RAGGED.width)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
