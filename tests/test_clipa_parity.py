"""CLIPA tower parity: our JAX avg-pool ViT + weight conversion vs a
from-spec torch mirror of open_clip's CLIPA VisionTransformer.

The reference reaches CLIPA towers through open_clip's generic dispatch
(utils/embedder.py:58-63, e.g. 'ViT-L-14-CLIPA/datacomp1b'). Neither
open_clip nor timm is installed here (zero egress), so the mirror below
re-implements the CLIPA vision tower from its config spec
(model_configs/ViT-*-CLIPA*.json): a standard pre-LN CLIP trunk with
  * NO pre-transformer layernorm (no_ln_pre),
  * avg pooling — the mean of the PATCH tokens, cls excluded
    (open_clip VisionTransformer._global_pool, pool_type 'avg'),
  * ln_post applied AFTER pooling (final_ln_after_pool),
emitting open_clip's 'visual.*' state-dict key layout so
convert_open_clip_visual's optional-ln_pre path is exercised end to end."""
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

CFG = VitConfig(width=64, layers=2, heads=4, patch_size=8, image_size=32,
                embed_dim=16, act="gelu", use_ln_pre=False, pool="avg")


class Mlp(nn.Module):
    def __init__(self, w, hidden):
        super().__init__()
        self.c_fc = nn.Linear(w, hidden)
        self.gelu = nn.GELU()
        self.c_proj = nn.Linear(hidden, w)

    def forward(self, x):
        return self.c_proj(self.gelu(self.c_fc(x)))


class ResBlock(nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w)
        self.attn = nn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(w)
        self.mlp = Mlp(w, 4 * w)

    def forward(self, x):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class Transformer(nn.Module):
    def __init__(self, w, heads, layers):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [ResBlock(w, heads) for _ in range(layers)]
        )

    def forward(self, x):
        for b in self.resblocks:
            x = b(x)
        return x


class ClipaVision(nn.Module):
    """open_clip VisionTransformer with no_ln_pre + pool_type='avg' +
    final_ln_after_pool, in open_clip's own state-dict key layout."""

    def __init__(self, cfg: VitConfig):
        super().__init__()
        w, p = cfg.width, cfg.patch_size
        self.conv1 = nn.Conv2d(3, w, kernel_size=p, stride=p, bias=False)
        scale = w ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(w))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.seq_len, w)
        )
        self.transformer = Transformer(w, cfg.heads, cfg.layers)
        self.ln_post = nn.LayerNorm(w)
        self.proj = nn.Parameter(scale * torch.randn(w, cfg.embed_dim))

    def forward(self, x):
        x = self.conv1(x)  # [B, w, g, g]
        x = x.flatten(2).transpose(1, 2)  # [B, g*g, w]
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.transformer(x)  # no ln_pre
        pooled = x[:, 1:].mean(dim=1)  # avg over patch tokens, cls excluded
        return self.ln_post(pooled) @ self.proj  # final_ln_after_pool


def test_clipa_matches_torch_mirror(rng):
    torch.manual_seed(0)
    model = ClipaVision(CFG).eval()
    params = convert_torch_state_dict(model.state_dict(), CFG)
    assert "ln_pre_scale" not in params  # the no_ln_pre conversion path

    x = rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    out = np.asarray(
        vit_encode_image(params, jnp.asarray(x), CFG,
                         compute_dtype=jnp.float32)
    )
    cos = np.sum(out * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_clipa_names_resolve():
    """All six published CLIPA arch names (open_clip model_configs) resolve
    with the right geometry, activation, and readout."""
    for name, w, L, e in [
        ("ViT-L-14-CLIPA/datacomp1b", 1024, 24, 768),
        ("ViT-L-14-CLIPA-336/datacomp1b", 1024, 24, 768),
        ("ViT-H-14-CLIPA/datacomp1b", 1280, 32, 1024),
        ("ViT-H-14-CLIPA-336/laion2b", 1280, 32, 1024),
        ("ViT-bigG-14-CLIPA/datacomp1b", 1664, 48, 1280),
        ("ViT-bigG-14-CLIPA-336/datacomp1b", 1664, 48, 1280),
    ]:
        cfg = resolve_config(name)
        assert cfg.width == w and cfg.layers == L and cfg.embed_dim == e
        assert cfg.pool == "avg" and not cfg.use_ln_pre
        assert cfg.act == "gelu" and cfg.use_cls_token
        assert cfg.image_size == (336 if name.split("/")[0].endswith("336")
                                  else 224)
    assert resolve_config("ViT-bigG-14-CLIPA/x").mlp_dim == 8192


def test_clipa_bf16_and_padded_tokens(rng):
    """bf16 production path (whatever attention route it picks, including
    padded token rows) stays within the 1e-3 cosine budget of f32 — the avg
    readout must not average attention-padding rows."""
    torch.manual_seed(1)
    model = ClipaVision(CFG).eval()
    params = convert_torch_state_dict(model.state_dict(), CFG)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    f32 = np.asarray(
        vit_encode_image(params, x, CFG, compute_dtype=jnp.float32)
    )
    bf16 = np.asarray(
        vit_encode_image(params, x, CFG, compute_dtype=jnp.bfloat16)
    )
    cos = np.sum(f32 * bf16, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"bf16 cosine error {1 - cos}"
