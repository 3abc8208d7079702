"""PE (Perception Encoder) family: architecture, converter, and torch parity.

The reference runs PE-Core towers via Meta's external perception_models repo
(``pe.CLIP.from_config``, utils/embedder.py:103-150). That repo is not
installable here (zero egress), so parity is checked against a from-spec torch
mirror of the published PE vision tower built in this file: CLIP-style
pre-LN transformer + 2-D axial RoPE on q/k (RoPE-ViT's ``compute_axial_cis``
scheme) + probe attention pooling (learned query + nn.MultiheadAttention +
layernorm) instead of the class-token readout. The torch mirror emits the PE
checkpoint key names, so the same test covers clip_weights.convert_pe_visual.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    resolve_config,
    vit_encode_image,
)


def compute_axial_cis(dim: int, grid: int, theta: float, cls_token: bool):
    """RoPE-ViT 2-D axial frequencies (the scheme PE adopts), torch side."""
    quarter = dim // 4
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[:quarter].float() / dim))
    idx = torch.arange(grid * grid)
    t_x, t_y = (idx % grid).float(), (idx // grid).float()
    ang = torch.cat([torch.outer(t_x, freqs), torch.outer(t_y, freqs)], dim=-1)
    cis = torch.polar(torch.ones_like(ang), ang)  # [S, dim/2] complex
    if cls_token:
        cis = torch.cat([torch.ones(1, cis.shape[1], dtype=cis.dtype), cis], dim=0)
    return cis


def apply_rope_torch(x: torch.Tensor, cis: torch.Tensor) -> torch.Tensor:
    """x: [B, h, S, d] — rotate consecutive feature pairs as complex lanes."""
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    return torch.view_as_real(xc * cis).flatten(3).to(x.dtype)


class _PEAttention(nn.Module):
    """Self-attention with PE's parameter naming (MHA-style packed in_proj)."""

    def __init__(self, width: int, heads: int):
        super().__init__()
        self.heads = heads
        self.in_proj_weight = nn.Parameter(torch.randn(3 * width, width) * width**-0.5)
        self.in_proj_bias = nn.Parameter(torch.randn(3 * width) * 0.02)
        self.out_proj = nn.Linear(width, width)

    def forward(self, x, cis):
        B, S, w = x.shape
        h, d = self.heads, w // self.heads
        qkv = x @ self.in_proj_weight.T + self.in_proj_bias
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(B, S, h, d).permute(0, 2, 1, 3)
        k = k.reshape(B, S, h, d).permute(0, 2, 1, 3)
        v = v.reshape(B, S, h, d).permute(0, 2, 1, 3)
        q, k = apply_rope_torch(q, cis), apply_rope_torch(k, cis)
        attn = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1) @ v
        return self.out_proj(attn.permute(0, 2, 1, 3).reshape(B, S, w))


class _PEBlock(nn.Module):
    def __init__(self, width: int, heads: int, mlp: int):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = _PEAttention(width, heads)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, mlp))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp, width))

    def forward(self, x, cis):
        x = x + self.attn(self.ln_1(x), cis)
        return x + self.mlp(self.ln_2(x))


class _PEAttnPool(nn.Module):
    """PE probe attention pooling: learned query + MHA + layernorm."""

    def __init__(self, width: int, heads: int):
        super().__init__()
        self.probe = nn.Parameter(torch.randn(1, 1, width) * 0.02)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.layernorm = nn.LayerNorm(width)

    def forward(self, x):
        probe = self.probe.expand(x.shape[0], -1, -1)
        pooled, _ = self.attn(probe, x, x, need_weights=False)
        return self.layernorm(pooled)[:, 0]


class TorchPEVision(nn.Module):
    """From-spec mirror of perception_models' VisionTransformer (PE-Core)."""

    def __init__(self, cfg: VitConfig):
        super().__init__()
        self.cfg = cfg
        w = cfg.width
        self.conv1 = nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size, bias=False)
        if cfg.use_cls_token:
            self.class_embedding = nn.Parameter(torch.randn(w) * w**-0.5)
        self.positional_embedding = nn.Parameter(torch.randn(cfg.seq_len, w) * w**-0.5)
        self.ln_pre = nn.LayerNorm(w)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_PEBlock(w, cfg.heads, cfg.mlp_dim) for _ in range(cfg.layers)]
        )
        self.ln_post = nn.LayerNorm(w)
        self.attn_pool = _PEAttnPool(w, cfg.attn_pooler_heads)
        self.proj = nn.Parameter(torch.randn(w, cfg.embed_dim) * w**-0.5)
        self.register_buffer(
            "cis",
            compute_axial_cis(cfg.head_dim, cfg.grid, cfg.rope_theta, cfg.use_cls_token),
            persistent=False,
        )

    @torch.no_grad()
    def forward(self, images: torch.Tensor) -> torch.Tensor:  # [B, 3, R, R]
        x = self.conv1(images)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        if self.cfg.use_cls_token:
            cls = self.class_embedding.expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], dim=1)
        x = self.ln_pre(x + self.positional_embedding)
        for blk in self.transformer.resblocks:
            x = blk(x, self.cis)
        x = self.ln_post(x)
        pooled = self.attn_pool(x)
        emb = pooled @ self.proj
        return emb / emb.norm(dim=-1, keepdim=True)


def _parity_case(cfg: VitConfig, seed: int):
    torch.manual_seed(seed)
    tower = TorchPEVision(cfg).eval()
    params = convert_torch_state_dict(tower.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    imgs = rng.normal(0, 1, (3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(
        vit_encode_image(
            jax.tree.map(np.asarray, params), imgs, cfg,
            compute_dtype=np.float32, fused_attention=False,
        )
    )
    theirs = tower(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    cos = np.sum(ours * theirs, axis=-1)
    assert np.all(cos > 1 - 1e-6), cos
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pe_parity_no_cls_token():
    # G14-style: no class token, attention pooling, RoPE
    _parity_case(resolve_config("PE-Test/tiny"), seed=0)


def test_pe_parity_with_cls_token():
    # B16/L14-style: class token present (identity rotation lane), attn pooling
    cfg = VitConfig(
        width=48, layers=2, heads=4, patch_size=8, image_size=24, embed_dim=20,
        act="gelu", use_rope2d=True, pool="attn", attn_pooler_heads=4,
        use_cls_token=True,
    )
    _parity_case(cfg, seed=1)


def test_pe_registry_configs():
    """PE-Core names must resolve to the PE architecture, not plain CLIP
    (round-1 gap: VERDICT.md item 2)."""
    l14 = resolve_config("PE-Core-L14-336")
    assert l14.pool == "attn" and l14.use_rope2d and l14.use_cls_token
    assert l14.embed_dim == 1024 and l14.image_size == 336

    g14 = resolve_config("PE-Core-G14-448")
    assert g14.pool == "attn" and g14.use_rope2d and not g14.use_cls_token
    assert g14.mlp_dim == 8960 and g14.embed_dim == 1280 and g14.layers == 50
    assert g14.seq_len == (448 // 14) ** 2  # no cls token

    b16 = resolve_config("PE-Core-B16-224")
    assert b16.pool == "attn" and b16.embed_dim == 1024


def test_pe_encoder_end_to_end(rng):
    """PE-Test/tiny runs through the full CLIPImageEncoder crop path."""
    from __graft_entry__ import _example_batch
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder

    enc = CLIPImageEncoder("PE-Test/tiny", compute_dtype=np.float32)
    canvases, crop_params = _example_batch(2, 128, enc.img_resolution, seed=7)
    emb = np.asarray(enc.embed_crops(canvases, crop_params))
    assert emb.shape == (2, 4, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_pe_rope_shifts_are_position_sensitive():
    """RoPE must make the tower position-sensitive beyond abs posemb: zeroing
    pos_emb, permuting patches still changes the embedding."""
    cfg = resolve_config("PE-Test/tiny")
    params = jax.tree.map(np.asarray, __import__(
        "clip_assisted_data_labeling_tpu.models.vit", fromlist=["init_vit_params"]
    ).init_vit_params(cfg, jax.random.key(0)))
    params["pos_emb"] = np.zeros_like(params["pos_emb"])

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    flipped = img[:, ::-1].copy()
    e1 = np.asarray(vit_encode_image(params, img, cfg, compute_dtype=np.float32,
                                     fused_attention=False))
    e2 = np.asarray(vit_encode_image(params, flipped, cfg, compute_dtype=np.float32,
                                     fused_attention=False))
    assert not np.allclose(e1, e2, atol=1e-3)


def test_pe_through_embed_pipeline(tmp_path, rng):
    """A PE-family model runs the whole embed stage: sidecars + columnar store
    carry the PE embedding dims (the round-1 gap was a silently-wrong tower
    under a correct-looking name; this pins the wiring end-to-end)."""
    from PIL import Image

    from clip_assisted_data_labeling_tpu.config import EmbedConfig
    from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

    root = tmp_path / "ds"
    root.mkdir()
    for i in range(4):
        arr = rng.integers(0, 256, (70, 90, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"u{i}.jpg", quality=95)

    cfg = EmbedConfig(
        models_to_use=("PE-Test/tiny",), batch_size=2, num_workers=1,
        canvas_size=256, compute_dtype="float32", shuffle_filenames=False,
    )
    stores = embed_dataset(str(root), cfg)
    store = stores["PE-Test/tiny"]
    assert store.meta["dim"] == 16 and store.meta["n"] == 4
    emb = np.asarray(store.embeddings[:, 0], np.float32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=5e-3)

    d = read_sidecar(str(root / "u0.pt"))["PE-Test/tiny"]
    assert np.asarray(d["centre_crop"]).shape == (1, 16)


def test_kernel_rope_matches_xla_rope_path():
    """The packed kernel's in-VMEM half-split RoPE must match _apply_rope +
    attention_xla (the CPU/capture path) exactly."""
    import jax.numpy as jnp
    import numpy as np

    from clip_assisted_data_labeling_tpu.models.vit import _apply_rope
    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_xla,
        fused_attention_packed,
    )

    rng = np.random.default_rng(3)
    B, S, h, d = 2, 10, 3, 8
    w = h * d
    qkv = rng.normal(0, 1, (B, S, 3 * w)).astype(np.float32)
    cos = rng.normal(0, 1, (S, d // 2)).astype(np.float32)
    sin = rng.normal(0, 1, (S, d // 2)).astype(np.float32)

    got = np.asarray(fused_attention_packed(
        jnp.asarray(qkv), heads=h, scale=0.3, s_real=S,
        rope=(jnp.asarray(cos), jnp.asarray(sin)), interpret=True))

    rs = lambda t: t.reshape(B, S, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = np.split(qkv, 3, axis=-1)
    qr = _apply_rope(jnp.asarray(rs(q)), jnp.asarray(cos), jnp.asarray(sin))
    kr = _apply_rope(jnp.asarray(rs(k)), jnp.asarray(cos), jnp.asarray(sin))
    ref = np.asarray(attention_xla(qr, kr, jnp.asarray(rs(v)), 0.3))
    ref = ref.transpose(0, 2, 1, 3).reshape(B, S, w)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_int8_static_lnk_rope_path_interpret(monkeypatch):
    """CTPU_PALLAS_INTERPRET=1 drives the PE int8_static fast path
    (_block_int8_static_lnk + in-kernel rope) on CPU; it must track the XLA
    static path."""
    import numpy as np

    import jax.numpy as jnp

    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        init_vit_params,
        vit_act_amax,
        vit_encode_image,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params

    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    cfg = VitConfig(width=128, layers=2, heads=2, patch_size=8, image_size=40,
                    act="gelu", use_rope2d=True, pool="attn",
                    attn_pooler_heads=2, embed_dim=16)
    params = init_vit_params(cfg, jax.random.key(2))
    qp = quantize_vit_params(params)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 40, 40, 3)).astype(np.float32))
    amax = vit_act_amax(qp, x, cfg, compute_dtype=jnp.float32)
    sp = attach_act_amax(qp, {"act_amax": np.asarray(amax["act_amax"])})
    fused = np.asarray(vit_encode_image(sp, x, cfg, compute_dtype=jnp.float32,
                                        fused_attention=True))
    ref = np.asarray(vit_encode_image(sp, x, cfg, compute_dtype=jnp.float32,
                                      fused_attention=False))
    cos = np.sum(fused * ref, axis=-1)
    assert np.all(cos > 0.999), cos.min()


def test_legacy_pe_checkpoint_upgraded_on_load(tmp_path):
    """An npz saved in the pre-sentinel interleaved convention must be
    permuted on load (ensure_rope_half), giving the same embeddings as the
    marked half-split pytree."""
    import numpy as np

    import jax.numpy as jnp

    from clip_assisted_data_labeling_tpu.models.clip_weights import (
        ensure_rope_half,
        load_params_npz,
        save_params_npz,
    )
    from clip_assisted_data_labeling_tpu.models.vit import (
        init_vit_params,
        vit_encode_image,
    )

    cfg = resolve_config("PE-Test/tiny")
    params = init_vit_params(cfg, jax.random.key(3))
    assert "rope_half" in params

    # forge a LEGACY checkpoint: invert the permutation and drop the sentinel
    d, w, h = cfg.head_dim, cfg.width, cfg.heads
    perm_head = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    perm = np.concatenate([i * d + perm_head for i in range(h)])
    qkv_perm = np.concatenate([perm, w + perm, 2 * w + np.arange(w)])
    inv = np.argsort(qkv_perm)
    legacy = {k: v for k, v in params.items() if k != "rope_half"}
    legacy["blocks"] = dict(params["blocks"])
    legacy["blocks"]["qkv_kernel"] = np.asarray(params["blocks"]["qkv_kernel"])[:, :, inv]
    legacy["blocks"]["qkv_bias"] = np.asarray(params["blocks"]["qkv_bias"])[:, inv]
    path = str(tmp_path / "legacy.npz")
    save_params_npz(path, legacy)

    upgraded = ensure_rope_half(load_params_npz(path), cfg)
    assert "rope_half" in upgraded
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    a = np.asarray(vit_encode_image(upgraded, x, cfg, compute_dtype=jnp.float32))
    b = np.asarray(vit_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-5)
