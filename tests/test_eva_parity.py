"""EVA tower parity: our JAX EVA02 forward + weight conversion vs a from-spec
torch mirror of the BAAI EVA-CLIP vision trunk.

The reference reaches EVA towers through open_clip's generic dispatch
(utils/embedder.py:58-63, e.g. 'EVA02-L-14/merged2b_s4b_b131k'). Neither
open_clip nor timm is installed here (zero egress), so the mirror below
re-implements the EVA02 block from its spec — separate q/k/v projections
with NO k bias, interleaved-pair 2-D rope on q/k (identity on the cls
token), an inner_attn_ln sub-LN before the attention out-projection, and a
SwiGLU MLP (silu(w1·x)⊙(w2·x) → ffn_ln → w3) — emitting the EVA state-dict
key layout so convert_eva_visual's mapping (incl. the packed w1‖w2 fc1, the
zero-filled k bias, and the interleaved→half-split rope column permutation)
is exercised end to end. Exact constants (rope theta, swiglu hidden
rounding) re-pin when real checkpoints land — same policy as PE."""
import numpy as np
import pytest

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    resolve_config,
    vit_encode_image,
)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _rope_tables(grid: int, d: int, theta: float):
    """Interleaved-pair 2-D axial rope angles [S, d/2] (cls row = identity):
    the first d/4 pairs rotate by the patch column, the next d/4 by its row —
    the SAME frequencies as models/vit._rope2d_tables, in the interleaved
    (2i, 2i+1) pairing the converter permutes away."""
    quarter = d // 4
    freqs = 1.0 / (theta ** (np.arange(0, d, 4)[:quarter] / d))
    idx = np.arange(grid * grid)
    tx, ty = (idx % grid).astype(np.float64), (idx // grid).astype(np.float64)
    ang = np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)], axis=-1)
    ang = np.concatenate([np.zeros((1, ang.shape[1])), ang], axis=0)  # cls
    return (torch.tensor(np.cos(ang), dtype=torch.float32),
            torch.tensor(np.sin(ang), dtype=torch.float32))


def _apply_rope_interleaved(x, cos, sin):
    """x: [B, h, S, d]; rotate pairs (2i, 2i+1) by the per-token angles."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return torch.stack(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1
    ).flatten(-2)


class EvaAttention(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim, bias=True)
        self.k_proj = nn.Linear(dim, dim, bias=False)  # EVA: k has no bias
        self.v_proj = nn.Linear(dim, dim, bias=True)
        self.inner_attn_ln = nn.LayerNorm(dim, eps=1e-6)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.rope = rope

    def forward(self, x):
        B, S, w = x.shape
        h = self.heads
        d = w // h
        rs = lambda t: t.reshape(B, S, h, d).permute(0, 2, 1, 3)  # noqa: E731
        q, k, v = rs(self.q_proj(x)), rs(self.k_proj(x)), rs(self.v_proj(x))
        cos, sin = self.rope
        q = _apply_rope_interleaved(q, cos, sin)
        k = _apply_rope_interleaved(k, cos, sin)
        out = F.scaled_dot_product_attention(q, k, v, scale=d ** -0.5)
        out = out.permute(0, 2, 1, 3).reshape(B, S, w)
        return self.proj(self.inner_attn_ln(out))


class EvaSwiGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w1 = nn.Linear(dim, hidden)
        self.w2 = nn.Linear(dim, hidden)
        self.ffn_ln = nn.LayerNorm(hidden, eps=1e-6)
        self.w3 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w3(self.ffn_ln(F.silu(self.w1(x)) * self.w2(x)))


class EvaBlock(nn.Module):
    def __init__(self, dim, heads, hidden, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = EvaAttention(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = EvaSwiGLU(dim, hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class EvaMirror(nn.Module):
    def __init__(self, cfg: VitConfig, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        w, S = cfg.width, cfg.seq_len
        self.patch_embed = _PatchEmbed(cfg.patch_size, w)
        self.cls_token = nn.Parameter(torch.randn(1, 1, w) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, S, w) * 0.02)
        rope = _rope_tables(cfg.grid, cfg.head_dim, cfg.rope_theta)
        self.blocks = nn.ModuleList([
            EvaBlock(w, cfg.heads, cfg.mlp_dim, rope)
            for _ in range(cfg.layers)
        ])
        self.norm = nn.LayerNorm(w, eps=1e-6)
        self.head = nn.Linear(w, cfg.embed_dim, bias=False)
        # non-degenerate LN weights so conversion bugs in them can't hide
        gen = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for name, t in self.named_parameters():
                if "norm" in name or "ln" in name:
                    t.copy_(torch.randn(t.shape, generator=gen) * 0.2 + 1.0)

    def forward(self, x):  # x: [B, 3, R, R]
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def _parity(cfg: VitConfig, batch: int, rng, seed: int = 0):
    model = EvaMirror(cfg, seed=seed).eval()
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)
    x = rng.normal(0, 1, (batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    out = np.asarray(vit_encode_image(
        params, jnp.asarray(x), cfg, compute_dtype=jnp.float32,
        fused_attention=False))
    cos = np.sum(out * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_eva02_tiny_matches_torch(rng):
    """Tiny EVA02 geometry: swiglu + both sub-LNs + rope-with-cls exercised."""
    _parity(resolve_config("EVA-Test/tiny"), batch=3, rng=rng)


def test_eva02_b16_matches_torch(rng):
    """Full EVA02-B-16 geometry (the cheapest real EVA02 name)."""
    _parity(resolve_config("EVA02-B-16/merged2b_s8b_b131k"), batch=1, rng=rng)


def test_eva_fused_qkv_and_w12_checkpoint(rng):
    """The fused-checkpoint dialect (attn.qkv.weight + bare q_bias/v_bias
    params, mlp.w12 fused) must convert identically to the separate one."""
    cfg = resolve_config("EVA-Test/tiny")
    model = EvaMirror(cfg, seed=4).eval()
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    fused = {}
    for k, v in sd.items():
        if ".attn.q_proj.weight" in k:
            b = k[: -len("q_proj.weight")]
            fused[b + "qkv.weight"] = torch.cat(
                [sd[b + "q_proj.weight"], sd[b + "k_proj.weight"],
                 sd[b + "v_proj.weight"]], dim=0)
            fused[b + "q_bias"] = sd[b + "q_proj.bias"]
            fused[b + "v_bias"] = sd[b + "v_proj.bias"]
        elif ".attn.k_proj." in k or ".attn.v_proj.weight" in k or \
                ".attn.q_proj.bias" in k or ".attn.v_proj.bias" in k:
            continue
        elif ".mlp.w1.weight" in k:
            b = k[: -len("w1.weight")]
            fused[b + "w12.weight"] = torch.cat(
                [sd[b + "w1.weight"], sd[b + "w2.weight"]], dim=0)
            fused[b + "w12.bias"] = torch.cat(
                [sd[b + "w1.bias"], sd[b + "w2.bias"]], dim=0)
        elif ".mlp.w1.bias" in k or ".mlp.w2." in k:
            continue
        else:
            fused[k] = v
    pa = convert_torch_state_dict(sd, cfg)
    pb = convert_torch_state_dict(fused, cfg)
    for key in ("qkv_kernel", "qkv_bias", "fc1_kernel", "fc1_bias"):
        np.testing.assert_array_equal(np.asarray(pa["blocks"][key]),
                                      np.asarray(pb["blocks"][key]))


def test_eva_bf16_and_fused_attention_within_budget(rng):
    """bf16 + the Pallas fused-attention path stay within the 1e-3 cosine
    budget of the f32 XLA path (the rope-in-kernel path serves EVA too)."""
    cfg = resolve_config("EVA-Test/tiny")
    model = EvaMirror(cfg, seed=7).eval()
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    f32 = np.asarray(vit_encode_image(params, x, cfg,
                                      compute_dtype=jnp.float32,
                                      fused_attention=False))
    import os

    os.environ["CTPU_PALLAS_INTERPRET"] = "1"
    try:
        fused = np.asarray(vit_encode_image(params, x, cfg,
                                            compute_dtype=jnp.bfloat16,
                                            fused_attention=True))
    finally:
        os.environ.pop("CTPU_PALLAS_INTERPRET", None)
    cos = np.sum(f32 * fused, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"fused/bf16 cosine error {1 - cos}"


def test_eva02_int8_static_within_budget(rng):
    """EVA02's static-W8A8 path (the swiglu + sub-LN branches of
    vit_act_amax and _block_int8_static_lnk) must track f32 within the
    fast-mode budget — on the generic XLA path AND the fused lnk path
    (interpret mode; width-128 config passes the rowquant kernel gate)."""
    import os

    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        vit_act_amax,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params

    cfg = resolve_config("EVA-Test-Wide/tiny")
    model = EvaMirror(cfg, seed=9).eval()
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)
    qparams = quantize_vit_params(params)
    calib = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    amax = vit_act_amax(qparams, calib, cfg, compute_dtype=jnp.float32)
    assert amax["act_amax"].shape == (cfg.layers, 4)
    assert all(np.all(np.asarray(v) > 0) for v in amax.values())
    sparams = attach_act_amax(qparams, {"act_amax": amax["act_amax"]})

    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_encode_image(params, x, cfg,
                                      compute_dtype=jnp.float32,
                                      fused_attention=False))
    stat = np.asarray(vit_encode_image(sparams, x, cfg,
                                       compute_dtype=jnp.float32,
                                       fused_attention=False))
    assert np.all(np.sum(ref * stat, axis=-1) > 0.995)

    os.environ["CTPU_PALLAS_INTERPRET"] = "1"
    try:
        lnk = np.asarray(vit_encode_image(sparams, x, cfg,
                                          compute_dtype=jnp.bfloat16,
                                          fused_attention=True))
    finally:
        os.environ.pop("CTPU_PALLAS_INTERPRET", None)
    assert np.all(np.sum(ref * lnk, axis=-1) > 0.995)
    assert np.all(np.sum(stat * lnk, axis=-1) > 0.995)


def test_eva_registry():
    for name, dim, res, swiglu in (
            ("EVA01-g-14", 1024, 224, False),
            ("EVA02-B-16", 512, 224, True),
            ("EVA02-L-14", 768, 224, True),
            ("EVA02-L-14-336", 768, 336, True)):
        cfg = resolve_config(f"{name}/merged2b_s8b_b131k")
        assert cfg.embed_dim == dim and cfg.image_size == res
        assert (cfg.mlp_type == "swiglu") == swiglu
        assert cfg.attn_inner_ln == swiglu and cfg.use_rope2d == swiglu


def test_eva_encoder_wrapper(rng, caplog):
    """CLIPImageEncoder dispatches EVA names end-to-end: f32 encode,
    int8_static SUPPORTED (lazy calibration attaches act_amax), and the
    dynamic-int8 downgrade (no dynamic formulation for swiglu blocks)."""
    import logging

    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder

    enc = CLIPImageEncoder("EVA-Test/tiny", compute_dtype=jnp.float32)
    assert enc.img_resolution == 32 and enc.embed_dim == 16
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    emb = np.asarray(enc.encode(jnp.asarray(x)))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    enc_s = CLIPImageEncoder("EVA-Test/tiny", compute_dtype="int8_static")
    assert enc_s.quantized and enc_s.static_quant
    emb_s = np.asarray(enc_s.encode(jnp.asarray(x)))
    assert "act_amax" in enc_s.params["blocks"]  # calibrated on first batch
    cos = np.sum(emb * emb_s, axis=-1)
    assert np.all(cos > 0.99), f"int8_static EVA cosine {cos}"

    with caplog.at_level(logging.WARNING):
        enc8 = CLIPImageEncoder("EVA-Test/tiny", compute_dtype="int8")
    assert not enc8.quantized
    assert any("swiglu" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# EVA02-E 'enormous' block structure: POST-norm residuals, plain GELU MLP,
# no rope, no sub-LNs (timm eva02_enormous_patch14_clip_224 /
# EvaBlockPostNorm: x + norm1(attn(x)); x + norm2(mlp(x))).
# ---------------------------------------------------------------------------


class PostAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim, bias=True)
        self.k_proj = nn.Linear(dim, dim, bias=False)  # EVA: k has no bias
        self.v_proj = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        B, S, w = x.shape
        h = self.heads
        d = w // h
        rs = lambda t: t.reshape(B, S, h, d).permute(0, 2, 1, 3)  # noqa: E731
        q, k, v = rs(self.q_proj(x)), rs(self.k_proj(x)), rs(self.v_proj(x))
        out = F.scaled_dot_product_attention(q, k, v, scale=d ** -0.5)
        return self.proj(out.permute(0, 2, 1, 3).reshape(B, S, w))


class PostMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class EvaPostBlock(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = PostAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = PostMlp(dim, hidden)

    def forward(self, x):  # timm EvaBlockPostNorm
        x = x + self.norm1(self.attn(x))
        return x + self.norm2(self.mlp(x))


class EvaPostMirror(nn.Module):
    def __init__(self, cfg: VitConfig, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        w, S = cfg.width, cfg.seq_len
        self.patch_embed = _PatchEmbed(cfg.patch_size, w)
        self.cls_token = nn.Parameter(torch.randn(1, 1, w) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, S, w) * 0.02)
        self.blocks = nn.ModuleList([
            EvaPostBlock(w, cfg.heads, cfg.mlp_dim)
            for _ in range(cfg.layers)
        ])
        self.norm = nn.LayerNorm(w, eps=1e-6)
        self.head = nn.Linear(w, cfg.embed_dim, bias=False)
        gen = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for name, t in self.named_parameters():
                if "norm" in name:
                    t.copy_(torch.randn(t.shape, generator=gen) * 0.2 + 1.0)

    def forward(self, x):  # x: [B, 3, R, R]
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def test_eva02_e_post_norm_matches_torch(rng):
    """Tiny EVA02-E geometry: POST-norm residual placement + plain MLP."""
    cfg = resolve_config("EVA-Test-Post/tiny")
    assert cfg.block_norm == "post" and cfg.mlp_type == "mlp"
    model = EvaPostMirror(cfg, seed=2).eval()
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)
    x = rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    out = np.asarray(vit_encode_image(
        params, jnp.asarray(x), cfg, compute_dtype=jnp.float32,
        fused_attention=False))
    cos = np.sum(out * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_eva02_e_names_resolve():
    """EVA02-E-14[-plus] (open_clip model_configs) resolve with the enormous
    trunk geometry and post-norm blocks."""
    for name in ("EVA02-E-14/laion2b_s4b_b115k",
                 "EVA02-E-14-plus/laion2b_s9b_b144k"):
        cfg = resolve_config(name)
        assert cfg.width == 1792 and cfg.layers == 64 and cfg.heads == 16
        assert cfg.mlp_dim == 15360 and cfg.embed_dim == 1024
        assert cfg.block_norm == "post" and cfg.mlp_type == "mlp"
        assert not cfg.use_rope2d and not cfg.attn_inner_ln


def test_eva02_e_int8_static_accuracy(rng):
    """Post-norm towers run int8_static through the generic block path: the
    calibration forward (vit_act_amax) mirrors the post-norm sites — a[0]
    and a[2] quantize the RAW residual stream (no pre-LN exists), with
    per-layer scales absorbing depth-wise magnitude growth. Embeddings must
    stay close to the f32 path, and dynamic int8 must work too."""
    import numpy as np

    from clip_assisted_data_labeling_tpu.models.encoders import (
        CLIPImageEncoder,
    )

    x = rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32)
    enc_f32 = CLIPImageEncoder("EVA-Test-Post/tiny",
                               compute_dtype=jnp.float32)
    ref = np.asarray(enc_f32.encode(jnp.asarray(x)))

    enc_s = CLIPImageEncoder("EVA-Test-Post/tiny",
                             compute_dtype="int8_static")
    assert enc_s.quantized and enc_s.static_quant
    emb_s = np.asarray(enc_s.encode(jnp.asarray(x)))
    assert "act_amax" in enc_s.params["blocks"]  # calibrated on first batch
    cos = np.sum(ref * emb_s, axis=-1)
    assert np.all(cos > 0.99), f"post-norm int8_static cosine {cos}"

    enc_d = CLIPImageEncoder("EVA-Test-Post/tiny", compute_dtype="int8")
    assert enc_d.quantized and not enc_d.static_quant
    emb_d = np.asarray(enc_d.encode(jnp.asarray(x)))
    cos_d = np.sum(ref * emb_d, axis=-1)
    assert np.all(cos_d > 0.99), f"post-norm dynamic-int8 cosine {cos_d}"


def test_eva02_e_int8_static_rejects_tp_mesh():
    """tp_static's explicit-collective blocks are pre-norm formulations —
    a 2-D mesh calibrate_static on a post-norm tower must refuse loudly
    instead of computing the wrong network."""
    import numpy as np

    import jax

    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.vit import init_vit_params
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params
    from clip_assisted_data_labeling_tpu.parallel.embed_sharded import (
        ShardedEmbedder,
    )
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh_2d

    if jax.device_count() < 4:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = resolve_config("EVA-Test-Post/tiny")
    params = quantize_vit_params(
        init_vit_params(cfg, jax.random.key(0)))
    emb = ShardedEmbedder(params, cfg, get_mesh_2d(2, 2))
    canvas, cp = _example_batch(4, 64, cfg.image_size, seed=2)
    with pytest.raises(ValueError, match="post-norm"):
        emb.calibrate_static(canvas, cp)
