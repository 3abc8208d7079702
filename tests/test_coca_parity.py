"""CoCa vision towers: architecture, converter, and torch parity.

The reference reaches CoCa towers (``coca_ViT-B-32/laion2b_s13b_b90k``,
``coca_ViT-L-14/laion2b_s13b_b90k``) through the same open_clip dispatch as
every other "Arch/pretrained" name (reference utils/embedder.py:58-63).
open_clip is not installable here (zero egress), so parity is checked against
a from-spec torch mirror built in this file: a standard pre-LN CLIP trunk
(torch nn.MultiheadAttention blocks, open_clip key naming) plus open_clip's
AttentionalPooler in its legacy single-pooler mode — the pooler itself IS a
real torch nn.MultiheadAttention with kdim=vdim=width (separate q/k/v
projection weights), so the cross-dim attention math is torch's, not ours.
The mirror emits open_clip checkpoint key names, so the same test covers
clip_weights.convert_coca_visual.
"""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    init_vit_params,
    resolve_config,
    vit_encode_image,
)


class _TrunkBlock(nn.Module):
    """Standard pre-LN CLIP block with open_clip key naming."""

    def __init__(self, width: int, heads: int, mlp: int):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, mlp))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp, width))

    def forward(self, x):
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _AttnPooler(nn.Module):
    """open_clip AttentionalPooler, from spec: learned queries in d_model,
    keys/values projected from context_dim by a REAL torch MultiheadAttention
    (kdim=vdim=context_dim → separate q/k/v projection weights)."""

    def __init__(self, d_model: int, context_dim: int, n_head: int,
                 n_queries: int):
        super().__init__()
        self.query = nn.Parameter(torch.randn(n_queries, d_model) * 0.02)
        self.attn = nn.MultiheadAttention(
            d_model, n_head, kdim=context_dim, vdim=context_dim)
        self.ln_q = nn.LayerNorm(d_model)
        self.ln_k = nn.LayerNorm(context_dim)

    def forward(self, x):  # [B, S, context_dim] → [B, n_queries, d_model]
        x = self.ln_k(x).permute(1, 0, 2)
        n = x.shape[1]
        q = self.ln_q(self.query)
        out = self.attn(
            q.unsqueeze(1).expand(-1, n, -1), x, x, need_weights=False)[0]
        return out.permute(1, 0, 2)


class TorchCocaVisual(nn.Module):
    """From-spec mirror of open_clip's CoCa vision tower (legacy
    attentional_pool path: pool BEFORE ln_post, ln_post/proj on the pooled
    dim, contrastive embedding = query 0)."""

    def __init__(self, cfg: VitConfig):
        super().__init__()
        self.cfg = cfg
        w, e = cfg.width, cfg.embed_dim
        self.conv1 = nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(w) * w**-0.5)
        self.positional_embedding = nn.Parameter(
            torch.randn(cfg.seq_len, w) * w**-0.5)
        self.ln_pre = nn.LayerNorm(w)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_TrunkBlock(w, cfg.heads, cfg.mlp_dim) for _ in range(cfg.layers)]
        )
        self.attn_pool = _AttnPooler(
            e, w, cfg.attn_pooler_heads, cfg.n_pool_queries)
        self.ln_post = nn.LayerNorm(e)
        self.proj = nn.Parameter(torch.randn(e, e) * e**-0.5)

    @torch.no_grad()
    def forward(self, images: torch.Tensor) -> torch.Tensor:  # [B, 3, R, R]
        x = self.conv1(images)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.attn_pool(x)
        x = self.ln_post(x)
        pooled = x[:, 0] @ self.proj
        return pooled / pooled.norm(dim=-1, keepdim=True)


def _parity_case(cfg: VitConfig, seed: int):
    torch.manual_seed(seed)
    tower = TorchCocaVisual(cfg).eval()
    params = convert_torch_state_dict(tower.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    imgs = rng.normal(0, 1, (3, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32)
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


def test_coca_tiny_matches_torch():
    _parity_case(resolve_config("CoCa-Test/tiny"), seed=0)


def test_coca_odd_geometry_matches_torch():
    # pooled dim != a multiple of the trunk head layout; 2 pooler heads
    cfg = VitConfig(
        width=48, layers=2, heads=4, patch_size=8, image_size=24, embed_dim=20,
        act="gelu", pool="coca", attn_pooler_heads=2, n_pool_queries=5,
    )
    _parity_case(cfg, seed=1)


def test_coca_registry():
    b32 = resolve_config("coca_ViT-B-32/laion2b_s13b_b90k")
    assert (b32.width, b32.layers, b32.patch_size, b32.embed_dim) == (
        768, 12, 32, 512)
    assert b32.pool == "coca" and b32.n_pool_queries == 256
    l14 = resolve_config("coca_ViT-L-14/laion2b_s13b_b90k")
    assert (l14.width, l14.layers, l14.patch_size, l14.embed_dim) == (
        1024, 24, 14, 768)
    assert l14.act == "gelu" and l14.attn_pooler_heads == 8


def test_coca_random_init_fused_forward():
    """The production (jitted, fused-attention, bf16) path runs and emits
    L2-normalized embeddings of the right shape — covers the padded-token
    drop in the coca readout branch."""
    cfg = resolve_config("CoCa-Test/tiny")
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    imgs = np.random.default_rng(2).normal(
        0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    emb = np.asarray(vit_encode_image(params, imgs, cfg,
                                      compute_dtype=jnp.bfloat16))
    assert emb.shape == (4, cfg.embed_dim)
    assert np.all(np.isfinite(emb))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-3)


def test_coca_quantized_trunk_within_budget():
    """W8A8 trunk + float pooler (quantize_vit_params passes pool_* leaves
    through) stays within the repo's int8 embedding parity budget."""
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params

    cfg = resolve_config("CoCa-Test/tiny")
    params = init_vit_params(cfg, jax.random.PRNGKey(3))
    imgs = np.random.default_rng(4).normal(
        0, 1, (4, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ref = np.asarray(vit_encode_image(params, imgs, cfg,
                                      compute_dtype=np.float32,
                                      fused_attention=False))
    qp = quantize_vit_params(params)
    q = np.asarray(vit_encode_image(qp, imgs, cfg,
                                    compute_dtype=jnp.bfloat16,
                                    fused_attention=False))
    cos = np.sum(ref * q, axis=-1)
    assert np.all(cos > 1 - 1e-2), cos
