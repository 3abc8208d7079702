"""CLIP ViT image tower, TPU-native.

Replaces the reference's open_clip dependency (utils/embedder.py:58-100 loads
``open_clip.create_model_and_transforms`` and calls ``model.encode_image``) with a
functional JAX implementation designed for XLA:

  * patch embedding as reshape+matmul (a Conv2d with stride=kernel is exactly a
    patchify-matmul; XLA maps it straight onto the MXU),
  * one ``lax.scan`` over stacked transformer-block parameters — compile time is
    O(1) in depth and the stacked leading axis gives a natural home for pipeline/
    tensor sharding annotations,
  * bf16 compute / f32 params by default with layernorm and softmax kept in f32,
  * no Python control flow inside jit, static shapes throughout.

Parameter pytree layout (see ``init_vit_params``): a flat dict of arrays plus a
``blocks`` sub-dict whose leaves are stacked along axis 0 with length = depth.

Weight conversion from torch checkpoints (HF ``CLIPVisionModelWithProjection``
and open_clip ``visual.*`` state dicts) lives in models/clip_weights.py; parity
against the torch implementation is validated in tests/test_vit_parity.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.config import (
    CLIP_MEAN,
    CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
)


@dataclasses.dataclass(frozen=True)
class VitConfig:
    width: int = 1024
    layers: int = 24
    heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    embed_dim: int = 768  # output CLIP embedding dim
    mlp_ratio: int = 4
    mlp_hidden: int | None = None  # explicit MLP width (overrides mlp_ratio)
    act: str = "quick_gelu"  # OpenAI; open-data "gelu"; SigLIP "gelu_tanh"
    ln_eps: float = 1e-5
    # --- PE (Perception Encoder) family options (reference PE_Encoder,
    # utils/embedder.py:103-150 loads these via Meta's perception_models repo) ---
    use_cls_token: bool = True
    use_rope2d: bool = False  # 2-D axial rotary embeddings on q/k in every block
    rope_theta: float = 10000.0
    pool: str = "cls"  # 'cls' (CLIP) | 'attn' (PE probe) | 'map' (SigLIP MAP
    # head) | 'coca' (open_clip AttentionalPooler, contrastive query readout)
    attn_pooler_heads: int = 8
    n_pool_queries: int = 1  # CoCa pooler query rows (readout = query 0 only)
    # --- SigLIP family options (open_clip '*-SigLIP*' archs; the reference
    # reaches them through the same "Arch/pretrained" dispatch, _1:69-75) ---
    use_ln_pre: bool = True  # SigLIP towers have no pre-transformer layernorm
    use_proj: bool = True  # SigLIP's embedding IS the pooled width (no proj)
    patch_bias: bool = False  # SigLIP's patch conv has a bias term
    # preprocess normalization (open_clip per-checkpoint constants; SigLIP
    # normalizes with 0.5/0.5 where CLIP/PE use the OpenAI constants)
    norm_mean: tuple = CLIP_MEAN
    norm_std: tuple = CLIP_STD
    # --- EVA family options (open_clip 'EVA01/EVA02-*' archs; the reference
    # reaches them through the same "Arch/pretrained" dispatch, _1:69-75) ---
    mlp_type: str = "mlp"  # 'swiglu' (EVA02): silu(w1·x)⊙(w2·x) → ffn_ln → w3;
    # w1/w2 are PACKED into one [w, 2·mlp_hidden] fc1 matmul (MXU-friendly)
    attn_inner_ln: bool = False  # EVA02 sub-LN on the concatenated head
    # outputs, before the attention out-projection
    block_norm: str = "pre"  # 'post' (EVA02-E enormous, timm
    # EvaBlockPostNorm): norm1/norm2 apply to the SUBLAYER OUTPUT before the
    # residual add — x + ln1(attn(x)); x + ln2(mlp(x)) — instead of pre-LN
    # SigLIP2 naflex: variable-aspect tower (models/naflex.py). image_size is
    # set to grid·patch (the full square grid, seq_len == the checkpoint's
    # max_num_patches) so the 4-square-crop pipeline path runs the standard
    # fused vit_encode_image with the pos table used verbatim; only
    # genuinely variable-aspect inputs take the masked naflex_encode path.
    naflex: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + (1 if self.use_cls_token else 0)

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def mlp_dim(self) -> int:
        return self.mlp_hidden if self.mlp_hidden else self.mlp_ratio * self.width


# Model-name registry mirroring the reference's "Arch/pretrained" and "PE-" naming
# (reference _1_embed_with_CLIP.py:69-75 dispatches on these strings).
_OPENAI = dict(act="quick_gelu")
_OPEN = dict(act="gelu")
_ARCHS = {
    "ViT-B-32": dict(width=768, layers=12, heads=12, patch_size=32, image_size=224, embed_dim=512),
    "ViT-B-16": dict(width=768, layers=12, heads=12, patch_size=16, image_size=224, embed_dim=512),
    "ViT-L-14": dict(width=1024, layers=24, heads=16, patch_size=14, image_size=224, embed_dim=768),
    "ViT-L-14-336": dict(width=1024, layers=24, heads=16, patch_size=14, image_size=336, embed_dim=768),
    "ViT-H-14": dict(width=1280, layers=32, heads=16, patch_size=14, image_size=224, embed_dim=1024),
    # open_clip's g-14 (laion2b): mlp_ratio 4.3637 → int(4.3637·1408) = 6144
    "ViT-g-14": dict(width=1408, layers=40, heads=16, patch_size=14,
                     image_size=224, embed_dim=1024, mlp_hidden=6144),
    # open_clip's bigG (laion2b): mlp is 4.9231x width = 8192, not the usual 4x
    "ViT-bigG-14": dict(width=1664, layers=48, heads=16, patch_size=14,
                        image_size=224, embed_dim=1280, mlp_hidden=8192),
}
# Meta Perception Encoder cores (reference PE_Encoder, utils/embedder.py:103-150
# loads them via Meta's external perception_models repo). The real PE vision
# tower differs from CLIP's: 2-D axial RoPE on q/k in every block, GELU MLPs,
# and a probe attention-pooling head instead of the class-token readout
# (G14 additionally drops the class token and widens the MLP to 8960).
_PE = dict(act="gelu", use_rope2d=True, pool="attn", attn_pooler_heads=8)
_PE_ARCHS = {
    "PE-Core-B16-224": dict(width=768, layers=12, heads=12, patch_size=16,
                            image_size=224, embed_dim=1024, **_PE),
    "PE-Core-L14-336": dict(width=1024, layers=24, heads=16, patch_size=14,
                            image_size=336, embed_dim=1024, **_PE),
    "PE-Core-G14-448": dict(width=1536, layers=50, heads=16, patch_size=14,
                            image_size=448, embed_dim=1280, mlp_hidden=8960,
                            use_cls_token=False, **_PE),
}
# SigLIP vision towers (open_clip '*-SigLIP*' archs / HF SiglipVisionModel).
# Architecture deltas vs CLIP: no class token, no pre-transformer layernorm,
# patch conv WITH bias, tanh-approximate GELU, a MAP head (probe MHA + LN +
# residual MLP) instead of the class-token readout, no output projection
# (embedding dim == width), and 0.5/0.5 preprocess normalization. The
# reference reaches these through the same open_clip "Arch/pretrained"
# dispatch (_1_embed_with_CLIP.py:69-75, utils/embedder.py:61-63).
_SIGLIP = dict(act="gelu_tanh", use_cls_token=False, use_ln_pre=False,
               use_proj=False, patch_bias=True, pool="map", ln_eps=1e-6,
               norm_mean=SIGLIP_MEAN, norm_std=SIGLIP_STD)
_SIGLIP_ARCHS = {
    "ViT-B-16-SigLIP": dict(width=768, layers=12, heads=12, patch_size=16,
                            image_size=224, embed_dim=768,
                            attn_pooler_heads=12, **_SIGLIP),
    "ViT-B-16-SigLIP-384": dict(width=768, layers=12, heads=12, patch_size=16,
                                image_size=384, embed_dim=768,
                                attn_pooler_heads=12, **_SIGLIP),
    "ViT-L-16-SigLIP-256": dict(width=1024, layers=24, heads=16, patch_size=16,
                                image_size=256, embed_dim=1024,
                                attn_pooler_heads=16, **_SIGLIP),
    "ViT-L-16-SigLIP-384": dict(width=1024, layers=24, heads=16, patch_size=16,
                                image_size=384, embed_dim=1024,
                                attn_pooler_heads=16, **_SIGLIP),
    # the shape-optimized SoViT-400M tower: mlp 4304 (not 4x), head_dim 72
    "ViT-SO400M-14-SigLIP-384": dict(width=1152, layers=27, heads=16,
                                     patch_size=14, image_size=384,
                                     embed_dim=1152, mlp_hidden=4304,
                                     attn_pooler_heads=16, **_SIGLIP),
}
# EVA family (open_clip 'EVA01-g-14' / 'EVA02-{B,L}-…' archs, BAAI EVA-CLIP —
# reached through the same open_clip dispatch, utils/embedder.py:58-63).
# EVA02 trunk deltas vs CLIP: 2-D RoPE on q/k (on TOP of the learned pos
# embedding), SwiGLU MLP with an inner sub-LN, sub-LN on the attention
# outputs, separate q/k/v projections with NO k bias (converter zero-fills),
# no pre-transformer LN, biased patch conv, LN eps 1e-6. EVA01-g shares the
# checkpoint dialect but plain-MLP blocks without rope/sub-LN. RoPE theta and
# the swiglu hidden rounding are config fields to re-pin the day real
# checkpoints land (zero egress — same policy as the PE constants).
_EVA02 = dict(act="gelu", use_ln_pre=False, patch_bias=True,
              mlp_type="swiglu", attn_inner_ln=True, use_rope2d=True,
              ln_eps=1e-6)
_EVA_ARCHS = {
    "EVA01-g-14": dict(width=1408, layers=40, heads=16, patch_size=14,
                       image_size=224, embed_dim=1024, mlp_hidden=6144,
                       act="gelu", use_ln_pre=False, patch_bias=True,
                       ln_eps=1e-6),
    "EVA02-B-16": dict(width=768, layers=12, heads=12, patch_size=16,
                       image_size=224, embed_dim=512, mlp_hidden=2048,
                       **_EVA02),
    "EVA02-L-14": dict(width=1024, layers=24, heads=16, patch_size=14,
                       image_size=224, embed_dim=768, mlp_hidden=2730,
                       **_EVA02),
    "EVA02-L-14-336": dict(width=1024, layers=24, heads=16, patch_size=14,
                           image_size=336, embed_dim=768, mlp_hidden=2730,
                           **_EVA02),
}
# open_clip's 'plus' tier only widens the TEXT tower; vision trunk identical
_EVA_ARCHS["EVA01-g-14-plus"] = _EVA_ARCHS["EVA01-g-14"]
# EVA02-E 'enormous' (open_clip EVA02-E-14[-plus] → timm
# eva02_enormous_patch14_clip_224): architecturally EVA01-style — plain GELU
# MLP, fused qkv, NO rope, NO sub-LNs — but with POST-norm blocks
# (timm EvaBlockPostNorm: x + norm(sublayer(x)); the stability trick the
# 4.4B-param trunk trained with). head_width 112 → 16 heads; mlp
# 15360 (ratio 15360/1792). Joint embed dim 1024 for both tiers ('plus'
# widens the text tower only — same policy note as EVA01-g-14-plus);
# re-pins when real checkpoints land (zero egress).
_EVA_ARCHS["EVA02-E-14"] = dict(width=1792, layers=64, heads=16,
                                patch_size=14, image_size=224,
                                embed_dim=1024, mlp_hidden=15360, act="gelu",
                                use_ln_pre=False, patch_bias=True,
                                ln_eps=1e-6, block_norm="post")
_EVA_ARCHS["EVA02-E-14-plus"] = _EVA_ARCHS["EVA02-E-14"]

MODEL_REGISTRY: dict[str, VitConfig] = {
    # tiny configs for tests / multi-chip dry runs (not real pretrained models)
    "ViT-Test/tiny": VitConfig(
        width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16
    ),
    "ViT-Test2/tiny": VitConfig(
        width=48, layers=2, heads=4, patch_size=8, image_size=24, embed_dim=24
    ),
}
for _arch, _kw in _ARCHS.items():
    MODEL_REGISTRY[f"{_arch}/openai"] = VitConfig(**_kw, **_OPENAI)
    for tag in ("laion2b_s32b_b82k", "laion2b_s34b_b79k", "laion400m_e32", "datacomp_xl_s13b_b90k"):
        MODEL_REGISTRY[f"{_arch}/{tag}"] = VitConfig(**_kw, **_OPEN)
for _arch, _kw in _PE_ARCHS.items():
    MODEL_REGISTRY[_arch] = VitConfig(**_kw)
for _arch, _kw in _SIGLIP_ARCHS.items():
    MODEL_REGISTRY[f"{_arch}/webli"] = VitConfig(**_kw)

# tiny SigLIP config for tests (MAP head, no cls/ln_pre/proj, patch bias)
MODEL_REGISTRY["SigLIP-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=64,
    attn_pooler_heads=4, mlp_hidden=224, **_SIGLIP,
)

# tiny naflex config for tests (4×4 positional grid, Linear patch embed,
# variable-aspect masked path in models/naflex.py)
MODEL_REGISTRY["SigLIP2-Naflex-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=64,
    attn_pooler_heads=4, mlp_hidden=224, naflex=True, **_SIGLIP,
)

# tiny NON-patch-divisible SigLIP config (36 = 4·8 + 4) — the SO400M-14 @384
# geometry class (384 = 27·14 + 6), where a stride-p valid-padding conv drops
# the trailing remainder pixels (HF SiglipVisionEmbeddings Conv2d
# padding="valid"); regression coverage for the patchify/resample slice paths
MODEL_REGISTRY["SigLIP-Test-Ragged/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=36, embed_dim=64,
    attn_pooler_heads=4, mlp_hidden=224, **_SIGLIP,
)

# tiny quick_gelu config matching tests/test_vit_parity.SMALL's HF dims —
# lets the real-weight runbook (scripts/validate_real_weights.py) exercise its
# full torch-parity path in CI on a locally-trained HF checkpoint
MODEL_REGISTRY["ViT-Test-HF/tiny"] = VitConfig(
    width=64, layers=3, heads=4, patch_size=8, image_size=32, embed_dim=16,
    act="quick_gelu",
)

# tiny PE config for tests (RoPE + attention pooling, no cls token)
MODEL_REGISTRY["PE-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    act="gelu", use_rope2d=True, pool="attn", attn_pooler_heads=2,
    use_cls_token=False,
)

# tiny EVA02 config for tests (swiglu + sub-LNs + rope WITH a cls token)
MODEL_REGISTRY["EVA-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    mlp_hidden=112, **_EVA02,
)

# width-128 EVA02 test config: wide enough for the fused int8_static lnk
# path's rowquant kernels (width % 128 == 0 gate in models/vit._block)
MODEL_REGISTRY["EVA-Test-Wide/tiny"] = VitConfig(
    width=128, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    mlp_hidden=224, **_EVA02,
)

# tiny post-norm config (the EVA02-E block structure: plain MLP, no rope,
# x + ln(sublayer(x)) residuals)
MODEL_REGISTRY["EVA-Test-Post/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    mlp_hidden=112, act="gelu", use_ln_pre=False, patch_bias=True,
    ln_eps=1e-6, block_norm="post",
)


# open_clip CoCa vision towers (the reference reaches them through the same
# "Arch/pretrained" dispatch as every other open_clip name, reference
# utils/embedder.py:58-63 — e.g. 'coca_ViT-B-32/laion2b_s13b_b90k'). The
# vision trunk is a standard pre-LN CLIP ViT; the readout is open_clip's
# AttentionalPooler in its legacy single-pooler mode (the mode the released
# CoCa checkpoints use): n_pool_queries learned queries in embed_dim
# cross-attend over the trunk tokens (torch nn.MultiheadAttention with
# kdim=vdim=width — SEPARATE q/k/v projections because embed_dim != width),
# then ln_post over the POOLED dim and a [embed_dim, embed_dim] projection.
# The contrastive image embedding — the one the reference's encode_image
# returns — is query 0's output; the remaining queries only feed CoCa's text
# decoder, which this image-embedding framework never runs, so the forward
# computes query 0 alone (softmax rows are per-query-independent, so this is
# exact, not an approximation).
_COCA = dict(act="gelu", pool="coca", attn_pooler_heads=8, n_pool_queries=256)
_COCA_ARCHS = {
    "coca_ViT-B-32": dict(width=768, layers=12, heads=12, patch_size=32,
                          image_size=224, embed_dim=512, **_COCA),
    "coca_ViT-L-14": dict(width=1024, layers=24, heads=16, patch_size=14,
                          image_size=224, embed_dim=768, **_COCA),
}
# the RoBERTa-text CoCa shares the B-32 vision trunk + pooler verbatim
_COCA_ARCHS["coca_roberta-ViT-B-32"] = _COCA_ARCHS["coca_ViT-B-32"]
# open_clip's from-scratch CoCa config (model_configs/coca_base.json: B-width
# trunk at patch 18 / 288px, pooler heads 8, joint dim 512). Published without
# pretrained tags — geometry re-pins if weights ever appear (PE policy).
_COCA_ARCHS["coca_base"] = dict(width=768, layers=12, heads=12, patch_size=18,
                                image_size=288, embed_dim=512, act="gelu",
                                pool="coca", attn_pooler_heads=8,
                                n_pool_queries=256)

# tiny CoCa config for tests (odd query count catches row-0 selection bugs)
MODEL_REGISTRY["CoCa-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    mlp_hidden=128, act="gelu", pool="coca", attn_pooler_heads=4,
    n_pool_queries=7,
)


# CLIPA vision towers (open_clip 'ViT-{L,H,bigG}-14-CLIPA[-336]' — the
# reference reaches them through the same "Arch/pretrained" dispatch,
# utils/embedder.py:58-63, e.g. 'ViT-L-14-CLIPA/datacomp1b'). Architecture
# deltas vs the plain CLIP ViT (open_clip model_configs/*-CLIPA*.json):
# no pre-transformer layernorm (no_ln_pre), and the readout is the MEAN of
# the patch tokens (pool_type 'avg', cls token present but excluded) with
# ln_post applied AFTER pooling (final_ln_after_pool) — one [B, w] layernorm
# instead of a per-token pass, then the usual width→embed_dim projection.
_CLIPA = dict(act="gelu", use_ln_pre=False, pool="avg")
_CLIPA_ARCHS = {
    "ViT-L-14-CLIPA": dict(width=1024, layers=24, heads=16, patch_size=14,
                           image_size=224, embed_dim=768, **_CLIPA),
    "ViT-L-14-CLIPA-336": dict(width=1024, layers=24, heads=16, patch_size=14,
                               image_size=336, embed_dim=768, **_CLIPA),
    "ViT-H-14-CLIPA": dict(width=1280, layers=32, heads=16, patch_size=14,
                           image_size=224, embed_dim=1024, **_CLIPA),
    "ViT-H-14-CLIPA-336": dict(width=1280, layers=32, heads=16, patch_size=14,
                               image_size=336, embed_dim=1024, **_CLIPA),
    "ViT-bigG-14-CLIPA": dict(width=1664, layers=48, heads=16, patch_size=14,
                              image_size=224, embed_dim=1280, mlp_hidden=8192,
                              **_CLIPA),
    "ViT-bigG-14-CLIPA-336": dict(width=1664, layers=48, heads=16,
                                  patch_size=14, image_size=336,
                                  embed_dim=1280, mlp_hidden=8192, **_CLIPA),
}

# tiny CLIPA config for tests (avg pool + no ln_pre, cls token present)
MODEL_REGISTRY["CLIPA-Test/tiny"] = VitConfig(
    width=64, layers=2, heads=4, patch_size=8, image_size=32, embed_dim=16,
    **_CLIPA,
)


# open_clip's NLLB-CLIP combos pair a standard vision trunk with Meta's
# NLLB multilingual text encoder (model_configs/nllb-clip-*.json); the
# vision tower — the only side this framework runs — is a stock trunk.
_NLLB_VISION = {
    "nllb-clip-base": "ViT-B-32",
    "nllb-clip-large": "ViT-H-14",
    "nllb-clip-base-siglip": "ViT-B-16-SigLIP-384",
    "nllb-clip-large-siglip": "ViT-SO400M-14-SigLIP-384",
}


# trunk dims shared by every SigLIP/SigLIP2 tower of a size family (the
# SigLIP2 releases reuse the SigLIP vision architecture; only training and
# the text side changed). naflex variable-aspect variants resolve here too
# (patch-mask + pos-interpolation plumbing in models/naflex.py).
_SIGLIP_FAMS = {
    "B": dict(width=768, layers=12, heads=12, mlp_hidden=3072,
              attn_pooler_heads=12),
    "L": dict(width=1024, layers=24, heads=16, mlp_hidden=4096,
              attn_pooler_heads=16),
    "SO400M": dict(width=1152, layers=27, heads=16, mlp_hidden=4304,
                   attn_pooler_heads=16),
    # SigLIP2's giant-opt tier (open_clip 'ViT-gopt-16-SigLIP2-{256,384}';
    # big_vision's g-opt trunk: width 1536, depth 40)
    "gopt": dict(width=1536, layers=40, heads=16, mlp_hidden=6144,
                 attn_pooler_heads=16),
}


def _parse_siglip_name(arch: str) -> VitConfig | None:
    """'ViT-{fam}-{patch}-SigLIP[2][-{res}|-naflex]' → config (default res 224).

    Covers the open_clip SigLIP/SigLIP2 fixed-res names (e.g.
    'ViT-B-16-SigLIP2-384', 'ViT-SO400M-14-SigLIP2-378',
    'ViT-SO400M-16-SigLIP2-256', 'ViT-gopt-16-SigLIP2-384', the '-i18n'
    multilingual variants) and any future resolution variant without a
    per-name table — geometry is in the name, trunk dims in _SIGLIP_FAMS —
    plus the naflex variable-aspect variants (HF
    google/siglip2-{base,large,so400m}-patch16-naflex; 256-position grid)."""
    import re

    m = re.fullmatch(
        r"ViT-(B|L|SO400M|gopt)-(\d+)-SigLIP2?(?:-i18n)?(?:-(\d+|naflex))?",
        arch,
    )
    if m is None:
        return None
    fam = _SIGLIP_FAMS[m.group(1)]
    patch = int(m.group(2))
    if m.group(3) == "naflex":
        # image_size = 16·patch so the square-crop pipeline path fills the
        # full 16×16 positional grid (see VitConfig.naflex)
        return VitConfig(patch_size=patch, image_size=16 * patch, naflex=True,
                         embed_dim=fam["width"], **fam, **_SIGLIP)
    res = int(m.group(3)) if m.group(3) else 224
    # non-patch-divisible resolutions (e.g. SO400M-14 @384: 384 = 27*14 + 6)
    # are valid — the patchify path implements the stride-p valid-padding conv
    # semantics (trailing remainder pixels unread), see _patch_embed
    return VitConfig(patch_size=patch, image_size=res,
                     embed_dim=fam["width"], **fam, **_SIGLIP)


# trunk dims shared by every plain-ViT tower of a size family (open_clip
# model_configs: heads = width / head_width with head_width 64 except H/g/bigG;
# g's mlp_ratio is 4.3637 → 6144, bigG's 4.9231 → 8192). 'B-plus' is
# open_clip's wide-B tier ('ViT-B-16-plus[-240]': width 896, 14 heads of 64).
# '-alt' is open_clip's narrow-joint-space S/M tier (same trunk, smaller
# embed_dim); 'e' is open_clip's ViT-e-14 (head_width 112 → 16 heads,
# mlp_ratio 8.5715 → 15360) — config published without pretrained tags.
_VIT_FAMS = {
    "S": dict(width=384, layers=12, heads=6, embed_dim=384),
    "S-alt": dict(width=384, layers=12, heads=6, embed_dim=256),
    "M": dict(width=512, layers=12, heads=8, embed_dim=512),
    "M-alt": dict(width=512, layers=12, heads=8, embed_dim=384),
    "B": dict(width=768, layers=12, heads=12, embed_dim=512),
    "B-plus": dict(width=896, layers=12, heads=14, embed_dim=640),
    "L": dict(width=1024, layers=24, heads=16, embed_dim=768),
    "H": dict(width=1280, layers=32, heads=16, embed_dim=1024),
    "g": dict(width=1408, layers=40, heads=16, embed_dim=1024,
              mlp_hidden=6144),
    "bigG": dict(width=1664, layers=48, heads=16, embed_dim=1280,
                 mlp_hidden=8192),
    "e": dict(width=1792, layers=56, heads=16, embed_dim=1280,
              mlp_hidden=15360),
}


def _parse_vit_name(arch: str) -> VitConfig | None:
    """'ViT-{fam}[-plus|-alt]-{patch}[-{res}]' → config (default res 224).

    Generic geometry dispatch for the plain-ViT open_clip name variants the
    per-name table doesn't list — 'ViT-B-32-256', 'ViT-B-16-plus-240',
    'ViT-L-14-280', 'ViT-H-14-378', 'ViT-S-16-alt', 'ViT-e-14' — so any name
    the reference's open_clip pass-through (utils/embedder.py:60-63) accepts
    resolves here too. Geometry comes from the name; trunk dims from
    _VIT_FAMS. Note open_clip's '-alt' names put the suffix after the patch
    ('ViT-S-32-alt') and never carry a resolution tail."""
    import re

    m = re.fullmatch(
        r"ViT-(S|M|B|L|H|g|bigG|e)-(\d+)(-plus|-alt)?(?:-(\d+))?", arch
    )
    if m is None:
        return None
    famkey = m.group(1) + (m.group(3) or "")
    if famkey not in _VIT_FAMS:
        return None
    patch = int(m.group(2))
    res = int(m.group(4)) if m.group(4) else 224
    return VitConfig(patch_size=patch, image_size=res, **_VIT_FAMS[famkey])


def resolve_config(model_name: str):
    """Resolve 'Arch/pretrained' or 'PE-…' names (reference naming convention,
    _1_embed_with_CLIP.py:69-75). Returns a VitConfig, or an RNConfig for the
    open_clip modified-ResNet towers (RN50/RN101/RN50x4/x16/x64 — the
    reference reaches them through the same open_clip dispatch,
    utils/embedder.py:58-63).

    '-quickgelu'-suffixed arch names (open_clip's aliases pinning the OpenAI
    activation regardless of pretrained tag — 'ViT-B-32-quickgelu/laion400m_e32',
    'ViT-L-14-quickgelu/dfn2b', 'ViT-H-14-quickgelu/dfn5b', 'RN50-quickgelu/
    openai', …) resolve to the base tower with act='quick_gelu'; for the
    modified-ResNet towers the suffix only affects the text side in open_clip,
    so the vision config is unchanged."""
    if model_name in MODEL_REGISTRY:
        return MODEL_REGISTRY[model_name]
    if model_name.startswith("hf-hub:"):
        # open_clip also accepts 'hf-hub:org/repo' strings and downloads the
        # checkpoint (the reference inherits this through its pass-through,
        # utils/embedder.py:60-63). This framework never downloads
        # (zero-egress policy): point the user at the equivalent local flow.
        raise ValueError(
            f"{model_name}: hf-hub references download weights, which this "
            "framework never does. Use the architecture name (e.g. "
            "'ViT-L-14/openai') plus --model_path <dir-with-local-checkpoint>"
            " — the converter accepts HF and open_clip layouts."
        )
    arch = model_name.split("/", 1)[0]
    arch = _NLLB_VISION.get(arch, arch)  # nllb-clip-* → its stock trunk
    force_quick_gelu = False
    if arch.endswith("-quickgelu"):
        arch = arch[: -len("-quickgelu")]
        force_quick_gelu = True
    # open_clip's multilingual combos pair a standard vision trunk with an
    # alternate TEXT tower ('xlm-roberta-base-ViT-B-32', 'mt5-xl-ViT-H-14',
    # 'xlm-roberta-large-ViT-H-14'); the vision tower this framework runs is
    # the plain ViT after the text prefix. CoCa names keep their own dispatch
    # (their readout is the attentional pooler, not the cls token).
    if "-ViT-" in arch and not arch.startswith("coca"):
        arch = arch[arch.index("ViT-"):]

    def _finish(cfg):
        if force_quick_gelu and isinstance(cfg, VitConfig):
            return dataclasses.replace(cfg, act="quick_gelu")
        return cfg

    if arch in _SIGLIP_ARCHS:  # any pretrained tag (webli, webli2, …)
        return _finish(VitConfig(**_SIGLIP_ARCHS[arch]))
    sig = _parse_siglip_name(arch)
    if sig is not None:
        return _finish(sig)
    from clip_assisted_data_labeling_tpu.models.convnext import (
        _CNX_ARCHS,
        resolve_cnx_config,
    )
    from clip_assisted_data_labeling_tpu.models.resnet import (
        _RN_ARCHS,
        resolve_rn_config,
    )

    rn = resolve_rn_config(arch)
    if rn is not None:
        return rn
    cnx = resolve_cnx_config(arch)
    if cnx is not None:
        return cnx
    if arch in _EVA_ARCHS:  # any pretrained tag (merged2b, laion400m, …)
        return _finish(VitConfig(**_EVA_ARCHS[arch]))
    if arch in _COCA_ARCHS:  # any pretrained tag (laion2b_s13b_b90k, mscoco…)
        return _finish(VitConfig(**_COCA_ARCHS[arch]))
    if arch in _CLIPA_ARCHS:  # any pretrained tag (datacomp1b, laion2b…)
        return _finish(VitConfig(**_CLIPA_ARCHS[arch]))
    if arch in _ARCHS or _parse_vit_name(arch) is not None:
        act = (
            "quick_gelu"
            if force_quick_gelu or model_name.endswith("/openai")
            else "gelu"
        )
        base = (
            VitConfig(**_ARCHS[arch])
            if arch in _ARCHS
            else _parse_vit_name(arch)
        )
        return dataclasses.replace(base, act=act)
    if arch.startswith(("MobileCLIP", "ViTamin")):
        # The last open_clip vision-tower families without a from-scratch
        # implementation here: both wrap timm hybrid conv towers (FastViT
        # 'MCi' RepMixer trunks / ViTamin MBConv+ViT trunks) whose exact
        # block-level geometry is defined by timm source, which is not
        # installable in this environment (zero egress). Pinning those
        # architectures from memory risks a silently WRONG tower — worse
        # than this explicit boundary. Implement against timm the day it is
        # on disk (ROADMAP 'Name-surface tail').
        raise ValueError(
            f"{model_name}: recognized open_clip family "
            f"'{arch.split('-')[0]}' is not implemented (timm-wrapped "
            f"hybrid conv tower; see ROADMAP.md). Every other published "
            f"open_clip vision tower resolves."
        )
    raise ValueError(
        f"Unknown model format: {model_name}. Expected 'PE-…' or 'Arch/pretrained' "
        f"(any '-quickgelu'-suffixed alias or 'ViT-{{S,M,B[-plus|-alt],L,H,g,"
        f"bigG,e}}-{{patch}}[-{{res}}]' geometry name also resolves) with Arch in "
        f"{sorted(_ARCHS) + sorted(_SIGLIP_ARCHS) + sorted(_PE_ARCHS) + sorted(_EVA_ARCHS) + sorted(_COCA_ARCHS) + sorted(_CLIPA_ARCHS) + sorted(_NLLB_VISION) + sorted(_RN_ARCHS) + sorted(_CNX_ARCHS)}."
    )


def int8_wire_enabled(cfg) -> bool:
    """Resolve the int8 attention-wire knob for one tower (BENCH_NOTES
    round-8 A/Bs). ``CTPU_INT8_WIRE=1`` forces on, ``=0`` forces off; the
    default ``auto`` enables the wire exactly where it measured a win: towers
    whose non-wire int8_static route falls to the flash kernel (both the
    whole-block and grouped VMEM gates reject) while the tiled q8s kernel
    fits — SO400M-384: 65.0 vs 50.4 imgs/s (+29%). Where the bf16 packed
    kernel serves the shape, the wire measured neutral (L-224, 263 vs 266)
    to -14% (L-336, 104 vs 121.5) and stays off. RoPE towers have no q8s
    formulation (models/vit._block also gates on rope-free)."""
    from clip_assisted_data_labeling_tpu.ops import knobs

    if knobs.INT8_WIRE == "on":
        return True
    if knobs.INT8_WIRE == "off" or not isinstance(cfg, VitConfig):
        return False
    if cfg.use_rope2d:
        return False
    from clip_assisted_data_labeling_tpu.ops.attention import (
        grouped_attention_fits,
        packed_attention_fits,
        packed_q8s_fits,
    )

    s, w, h = cfg.seq_len, cfg.width, cfg.heads
    if packed_attention_fits(s, w, 2) or grouped_attention_fits(s, w, h, 2):
        return False
    return packed_q8s_fits(s, w, h)


def init_vit_params(cfg: VitConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree (open_clip-style scaled normal init)."""
    ks = jax.random.split(key, 13)
    w, L, e = cfg.width, cfg.layers, cfg.embed_dim
    mlp = cfg.mlp_dim
    scale = w ** -0.5

    def nrm(k, shape, std):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    def ones(shape):
        return jnp.ones(shape, dtype)

    params = {
        "patch_kernel": nrm(ks[0], (cfg.patch_size * cfg.patch_size * 3, w), scale),
        "pos_emb": nrm(ks[2], (cfg.seq_len, w), scale),
        "blocks": {
            "ln1_scale": ones((L, w)),
            "ln1_bias": zeros((L, w)),
            "qkv_kernel": nrm(ks[3], (L, w, 3 * w), scale),
            "qkv_bias": zeros((L, 3 * w)),
            "out_kernel": nrm(ks[4], (L, w, w), scale),
            "out_bias": zeros((L, w)),
            "ln2_scale": ones((L, w)),
            "ln2_bias": zeros((L, w)),
            # swiglu packs w1‖w2 into ONE [w, 2·mlp] matmul (models/vit._block)
            "fc1_kernel": nrm(
                ks[5], (L, w, 2 * mlp if cfg.mlp_type == "swiglu" else mlp),
                (2 * w) ** -0.5),
            "fc1_bias": zeros(
                (L, 2 * mlp if cfg.mlp_type == "swiglu" else mlp)),
            "fc2_kernel": nrm(ks[6], (L, mlp, w), scale),
            "fc2_bias": zeros((L, w)),
        },
        "ln_post_scale": ones((w,)),
        "ln_post_bias": zeros((w,)),
    }
    if cfg.attn_inner_ln:
        params["blocks"]["attn_ln_scale"] = ones((L, w))
        params["blocks"]["attn_ln_bias"] = zeros((L, w))
    if cfg.mlp_type == "swiglu":
        params["blocks"]["ffn_ln_scale"] = ones((L, mlp))
        params["blocks"]["ffn_ln_bias"] = zeros((L, mlp))
    if cfg.use_ln_pre:
        params["ln_pre_scale"] = ones((w,))
        params["ln_pre_bias"] = zeros((w,))
    if cfg.use_proj:
        # CoCa's proj acts on the POOLED dim (embed_dim → embed_dim; the
        # pooler already projected width → embed_dim)
        params["proj"] = nrm(ks[7], ((e if cfg.pool == "coca" else w), e), scale)
    if cfg.patch_bias:
        params["patch_bias"] = zeros((w,))
    if cfg.use_cls_token:
        params["class_emb"] = nrm(ks[1], (w,), scale)
    if cfg.use_rope2d:
        # random init has no pairing convention; mark half-split so save/load
        # round-trips skip the legacy-checkpoint upgrade (clip_weights)
        params["rope_half"] = jnp.ones((), jnp.int8)
    if cfg.pool in ("attn", "map"):
        # probe MHA shared by the PE head (…+ layernorm) and the SigLIP MAP
        # head (layernorm + residual MLP, extra leaves below)
        params.update({
            "pool_probe": nrm(ks[8], (w,), 0.02),
            "pool_in_kernel": nrm(ks[9], (w, 3 * w), scale),
            "pool_in_bias": zeros((3 * w,)),
            "pool_out_kernel": nrm(ks[10], (w, w), scale),
            "pool_out_bias": zeros((w,)),
            "pool_ln_scale": ones((w,)),
            "pool_ln_bias": zeros((w,)),
        })
    if cfg.pool == "map":
        params.update({
            "pool_fc1_kernel": nrm(ks[11], (w, mlp), (2 * w) ** -0.5),
            "pool_fc1_bias": zeros((mlp,)),
            "pool_fc2_kernel": nrm(ks[7], (mlp, w), scale),
            "pool_fc2_bias": zeros((w,)),
        })
    if cfg.pool == "coca":
        # open_clip AttentionalPooler (legacy CoCa readout): queries live in
        # embed_dim, keys/values project width → embed_dim (cross-dim MHA);
        # ln_post acts on the POOLED dim, so re-shape it here (the base dict
        # above sized it for the trunk width).
        params.update({
            "pool_query": nrm(ks[8], (cfg.n_pool_queries, e), 0.02),
            "pool_q_kernel": nrm(ks[9], (e, e), e ** -0.5),
            "pool_k_kernel": nrm(ks[10], (w, e), scale),
            "pool_v_kernel": nrm(ks[11], (w, e), scale),
            "pool_in_bias": zeros((3 * e,)),
            # ks[12], NOT ks[7]: proj is also (e, e) here and already consumed
            # ks[7] — sharing the key would make the two matrices perfectly
            # correlated scaled copies in random-init forwards (advisor r4)
            "pool_out_kernel": nrm(ks[12], (e, e), e ** -0.5),
            "pool_out_bias": zeros((e,)),
            "pool_lnq_scale": ones((e,)),
            "pool_lnq_bias": zeros((e,)),
            "pool_lnk_scale": ones((w,)),
            "pool_lnk_bias": zeros((w,)),
            "ln_post_scale": ones((e,)),
            "ln_post_bias": zeros((e,)),
        })
    return params


def _layernorm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _act(x, kind: str, quantized: bool = False):
    if kind == "quick_gelu":  # OpenAI CLIP's x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    if kind == "gelu_tanh":  # SigLIP's gelu_pytorch_tanh — tanh form is exact
        return jax.nn.gelu(x, approximate=True)
    if quantized:
        # tanh-approximate gelu in int8 paths: exact erf ran the PE fc1 fusion
        # at 104 TOP/s vs 352 for quick_gelu (VPU-bound on [33k, 4096]); the
        # approximation's <=1e-3 absolute error is far below the int8
        # quantization step the output immediately suffers (~amax/127)
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


@functools.lru_cache(maxsize=8)
def _rope2d_tables(grid: int, head_dim: int, theta: float, cls_token: bool):
    """2-D axial RoPE cos/sin tables, shape [S, head_dim/2] each.

    Follows the axial scheme PE adopts (RoPE-ViT's ``compute_axial_cis``): the
    first head_dim/4 complex lanes rotate by the patch's x (column) position,
    the next head_dim/4 by its y (row) position; a leading cls token (if any)
    gets the identity rotation. Complex lane i pairs features (q[i], q[i+d/2])
    — the HALF-SPLIT convention every consumer here uses (_apply_rope and the
    kernel's _rot_half); PE checkpoints' interleaved (q[2i], q[2i+1]) pairing
    is erased at conversion by permuting the q/k projection columns
    (clip_weights.convert_pe_visual). Returned as numpy so jit embeds them as
    constants.
    """
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[:quarter] / head_dim))
    idx = np.arange(grid * grid)
    t_x, t_y = (idx % grid).astype(np.float64), (idx // grid).astype(np.float64)
    ang = np.concatenate([np.outer(t_x, freqs), np.outer(t_y, freqs)], axis=-1)
    if cls_token:
        ang = np.concatenate([np.zeros((1, ang.shape[1])), ang], axis=0)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope(x, cos, sin):
    """Rotate feature pairs (i, i+d/2) — HALF-SPLIT RoPE convention.

    x: [B, h, S, d]; cos/sin: [S, d/2]. PE checkpoints pair interleaved
    features; conversion permutes each head's q/k projection columns to this
    layout (clip_weights.convert_pe_visual — scores are permutation-
    invariant), because half slices stay contiguous in lane tiles while
    interleaved ``[..., ::2]`` slicing materializes strided copies."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _probe_mha(x, p, heads: int):
    """Probe multi-head attention shared by the PE ('attn') and SigLIP ('map')
    pooling heads: a learned query attends over all tokens through one
    nn.MultiheadAttention-equivalent (in_proj + softmax + out_proj).
    x: [B, S, w] → [B, w]."""
    B, S, w = x.shape
    d = w // heads
    dt = x.dtype
    wq, wk, wv = jnp.split(p["pool_in_kernel"].astype(dt), 3, axis=1)
    bq, bk, bv = jnp.split(p["pool_in_bias"].astype(dt), 3)
    q = (p["pool_probe"].astype(dt) @ wq + bq).reshape(heads, 1, d)
    k = (x @ wk + bk).reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    v = (x @ wv + bv).reshape(B, S, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("hqd,bhsd->bhqs", q, k) * (d ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
    pooled = jnp.einsum("bhqs,bhsd->bhqd", probs, v).transpose(0, 2, 1, 3)
    pooled = pooled.reshape(B, w) @ p["pool_out_kernel"].astype(dt)
    return pooled + p["pool_out_bias"].astype(dt)


def _attention_pool(x, p, heads: int, eps: float):
    """PE probe attention pooling: probe MHA, then layernorm
    (reference PE_Encoder family, utils/embedder.py:103-150)."""
    return _layernorm(_probe_mha(x, p, heads),
                      p["pool_ln_scale"], p["pool_ln_bias"], eps)


def _coca_pool(x, p, heads: int, eps: float):
    """CoCa contrastive readout: open_clip's AttentionalPooler (legacy
    single-pooler mode), query 0 only. x: [B, S, w] → [B, e].

    The pooler is a torch nn.MultiheadAttention with embed_dim = e and
    kdim = vdim = w (separate q/k/v projection weights), queries ln_q'd and
    keys/values ln_k'd first. Softmax rows are per-query-independent, so
    computing only query 0 (the contrastive token) is exact — the other
    n_pool_queries-1 rows feed CoCa's text decoder, which this framework's
    image-embedding path never runs."""
    B, S, w = x.shape
    dt = x.dtype
    e = p["pool_q_kernel"].shape[0]
    d = e // heads
    bq, bk, bv = jnp.split(p["pool_in_bias"].astype(dt), 3)
    q0 = _layernorm(p["pool_query"][:1].astype(dt),
                    p["pool_lnq_scale"], p["pool_lnq_bias"], eps)[0]
    kx = _layernorm(x, p["pool_lnk_scale"], p["pool_lnk_bias"], eps)
    q = (q0 @ p["pool_q_kernel"].astype(dt) + bq).reshape(heads, 1, d)
    k = (kx @ p["pool_k_kernel"].astype(dt) + bk).reshape(B, S, heads, d)
    v = (kx @ p["pool_v_kernel"].astype(dt) + bv).reshape(B, S, heads, d)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum("hqd,bhsd->bhqs", q, k) * (d ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
    pooled = jnp.einsum("bhqs,bhsd->bhqd", probs, v).transpose(0, 2, 1, 3)
    pooled = pooled.reshape(B, e) @ p["pool_out_kernel"].astype(dt)
    return pooled + p["pool_out_bias"].astype(dt)


def _map_pool(x, p, heads: int, eps: float, act: str):
    """SigLIP MAP head (HF SiglipMultiheadAttentionPoolingHead): probe MHA,
    then a residual MLP over the layernormed probe —
    ``h + mlp(ln(h))`` where h is the attention output."""
    h = _probe_mha(x, p, heads)
    dt = h.dtype
    y = _layernorm(h, p["pool_ln_scale"], p["pool_ln_bias"], eps)
    y = _act(y @ p["pool_fc1_kernel"].astype(dt) + p["pool_fc1_bias"].astype(dt),
             act)
    y = y @ p["pool_fc2_kernel"].astype(dt) + p["pool_fc2_bias"].astype(dt)
    return h + y


def _linear(x, p, name: str, quantized: bool, residual=None, act_amax=None):
    """Block matmul: bf16, or W8A8 (ops/quant.py).

    ``act_amax`` (a calibrated scalar, see :func:`vit_act_amax`) switches the
    activation quantization from dynamic per-row to STATIC — the quantize then
    fuses into the producer's epilogue instead of costing its own HBM pass.
    ``residual`` rides the dequant/bias epilogue (one fused HBM pass)."""
    bias = p[name.replace("_kernel", "_bias")]
    if quantized:
        if act_amax is not None:
            from clip_assisted_data_labeling_tpu.ops.quant import quant_static
            from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

            lead = x.shape[:-1]
            n = p[name].shape[-1]
            xq = quant_static(x, act_amax).reshape(-1, x.shape[-1])
            res = None if residual is None else residual.reshape(-1, n)
            y = q_matmul_pre(xq, act_amax * (1.0 / 127.0), p[name],
                             p[name + "_scale"], bias, residual=res,
                             out_dtype=x.dtype)
            return y.reshape(lead + (n,))
        from clip_assisted_data_labeling_tpu.ops.quant import q_matmul

        return q_matmul(x, p[name], p[name + "_scale"], bias, out_dtype=x.dtype,
                        residual=residual)
    y = x @ p[name].astype(x.dtype) + bias.astype(x.dtype)
    return y if residual is None else residual + y


def _block_int8_fused(x, p, cfg: VitConfig):
    """Hybrid W8A8 transformer block (TPU fast path).

    The matmuls run in XLA — on this toolchain XLA's int8 dot hits ~2× the
    bf16 MXU rate while Mosaic's tpu.matmul runs int8 at bf16 speed (measured;
    see ops/quant_kernel.py) — and Pallas handles everything around them so no
    elementwise HBM pass survives:

      * rowquant: layernorm + per-token quantize, ONE pass (XLA spends 2-3),
      * the packed attention kernel consumes the bf16 qkv in place and emits
        its output pre-quantized (int8 + scales) from VMEM,
      * gelu + re-quantize of the MLP hidden is one rowquant pass,
      * dequant + bias + residual ride the XLA matmul epilogue fusion.

    Per block, HBM wires are: x (bf16, ln reads + residuals), int8 ln-outs,
    the bf16 qkv (attention input), int8 attention-out, bf16 MLP hidden once
    each way around the fused gelu-quant. Everything else stays on-chip.
    """
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed,
    )
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import (
        q_matmul_pre,
        rowquant,
    )

    B, S, w = x.shape
    x2 = x.reshape(B * S, w)
    xq, xs = rowquant(x2, ln_scale=p["ln1_scale"], ln_bias=p["ln1_bias"],
                      ln_eps=cfg.ln_eps)
    qkv = q_matmul_pre(xq, xs, p["qkv_kernel"], p["qkv_kernel_scale"],
                       p["qkv_bias"])
    attn_q, attn_s = fused_attention_packed(
        qkv.reshape(B, S, 3 * w), heads=cfg.heads, scale=cfg.head_dim ** -0.5,
        quant_out=True, s_real=cfg.seq_len,
    )
    x2 = q_matmul_pre(
        attn_q.reshape(B * S, w), attn_s.reshape(B * S, 1),
        p["out_kernel"], p["out_kernel_scale"], p["out_bias"], residual=x2,
    )
    hq, hs = rowquant(x2, ln_scale=p["ln2_scale"], ln_bias=p["ln2_bias"],
                      ln_eps=cfg.ln_eps)
    h = q_matmul_pre(hq, hs, p["fc1_kernel"], p["fc1_kernel_scale"],
                     p["fc1_bias"])
    gq, gs = rowquant(h, act=cfg.act)
    x2 = q_matmul_pre(gq, gs, p["fc2_kernel"], p["fc2_kernel_scale"],
                      p["fc2_bias"], residual=x2)
    return x2.reshape(B, S, w)


def _block_int8_static_wire(x, p, cfg: VitConfig):
    """Static-scale W8A8 block with an int8 attention wire (the int8_static
    fast path on TPU).

    Every activation quantize uses a calibrated FIXED scale, so it is purely
    elementwise and fuses into its producer's epilogue: the qkv projection
    writes int8 directly (per-CHANNEL scales — the block's largest inter-op
    wire, halved), the attention kernel dequantizes per head in VMEM and emits
    int8 under the attn-out scale, and fc1+gelu+quantize+fc2 collapse into one
    XLA fusion whose MLP hidden never touches HBM."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed_q8s,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quant_static
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

    B, S, w = x.shape
    a = p["act_amax"]  # [4] f32 scalars
    qa = p["qkv_amax"]  # [3w] f32 per-channel
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    yq = quant_static(y, a[0]).reshape(B * S, w)
    qkv_f = q_matmul_pre(yq, a[0] * (1.0 / 127.0), p["qkv_kernel"],
                         p["qkv_kernel_scale"], p["qkv_bias"],
                         out_dtype=jnp.float32)
    qkv_q = quant_static(qkv_f, qa).reshape(B, S, 3 * w)
    # scale folding for the kernel (see _packed_q8s_kernel): q section also
    # carries the attention scale, v section the 127/attn_out_amax requant
    inv127 = 1.0 / 127.0
    cs = jnp.concatenate([
        qa[:w] * (inv127 * cfg.head_dim ** -0.5),
        qa[w : 2 * w] * inv127,
        qa[2 * w :] / a[1],
    ])
    attn_q = fused_attention_packed_q8s(
        qkv_q, cs, heads=cfg.heads, scale=cfg.head_dim ** -0.5,
        s_real=cfg.seq_len,
    )
    x = x + q_matmul_pre(
        attn_q.reshape(B * S, w), a[1] * inv127, p["out_kernel"],
        p["out_kernel_scale"], p["out_bias"], out_dtype=x.dtype,
    ).reshape(B, S, w)

    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    y = _act(_linear(y, p, "fc1_kernel", True, act_amax=a[2]), cfg.act,
             quantized=True)
    return _linear(y, p, "fc2_kernel", True, act_amax=a[3], residual=x)


def _block_int8_static_lnk(x, p, cfg: VitConfig, rope=None):
    """int8_static block with the ln+quantize steps as single-pass Pallas
    kernels (ops/quant_kernel.rowquant_static) instead of XLA's multi-pass ln
    chain (the default static path; CTPU_LN_KERNEL=0 disables). ``rope``
    rides inside the attention kernel (PE family)."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        packed_attention_auto,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quant_static
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import (
        q_matmul_pre,
        rowquant_static,
    )

    B, S, w = x.shape
    a = p["act_amax"]
    inv127 = 1.0 / 127.0
    x2 = x.reshape(B * S, w)
    xq = rowquant_static(x2, p["ln1_scale"], p["ln1_bias"], a[0],
                         ln_eps=cfg.ln_eps)
    qkv = q_matmul_pre(xq, a[0] * inv127, p["qkv_kernel"],
                       p["qkv_kernel_scale"], p["qkv_bias"])
    attn = packed_attention_auto(
        qkv.reshape(B, S, 3 * w), heads=cfg.heads,
        scale=cfg.head_dim ** -0.5, s_real=cfg.seq_len, rope=rope,
    )
    if cfg.attn_inner_ln:
        # EVA02 sub-LN before the out projection: a[1] is calibrated on the
        # POST-LN values (vit_act_amax), so ln+quantize run as one fused pass
        attn_q = rowquant_static(attn.reshape(B * S, w), p["attn_ln_scale"],
                                 p["attn_ln_bias"], a[1], ln_eps=cfg.ln_eps)
    else:
        attn_q = quant_static(attn, a[1]).reshape(B * S, w)
    x2 = x2 + q_matmul_pre(
        attn_q, a[1] * inv127,
        p["out_kernel"], p["out_kernel_scale"], p["out_bias"],
        out_dtype=x.dtype,
    )
    hq = rowquant_static(x2, p["ln2_scale"], p["ln2_bias"], a[2],
                         ln_eps=cfg.ln_eps)
    h = q_matmul_pre(hq, a[2] * inv127, p["fc1_kernel"],
                     p["fc1_kernel_scale"], p["fc1_bias"])
    if cfg.mlp_type == "swiglu":
        # EVA02: packed w1‖w2 came out of ONE int8 matmul; silu-gate, then
        # the ffn sub-LN + static quantize. The XLA ln chain is used here —
        # the fused rowquant kernel needs width % 128 == 0 and EVA02's
        # swiglu hiddens are ragged (L: 2730)
        h1, h2 = jnp.split(h, 2, axis=-1)
        g = _layernorm(jax.nn.silu(h1) * h2, p["ffn_ln_scale"],
                       p["ffn_ln_bias"], cfg.ln_eps)
    else:
        g = _act(h, cfg.act, quantized=True)
    x2 = q_matmul_pre(quant_static(g, a[3]), a[3] * inv127, p["fc2_kernel"],
                      p["fc2_kernel_scale"], p["fc2_bias"], residual=x2,
                      out_dtype=x.dtype)
    return x2.reshape(B, S, w)


def _int8_block_mode() -> str:
    """int8 block implementation (CTPU_INT8_BLOCK), measured on the round-2
    chip at batch 32 ViT-L (BENCH_NOTES.md):

      'xla-plain'  XLA int8 matmuls (2-D-flattened operands) + Pallas bf16
                   attention — fastest (229 imgs/s) — the default;
      'xla'        + attention quant_out epilogue (int8 attention-out wire);
                   measured slightly slower (209) — the extra VMEM scratch
                   accumulation costs more than the saved quantize pass;
      'hybrid'     + Pallas rowquant ln/gelu+quantize passes and int8 qkv wire;
                   slower still (~190) — XLA's elementwise fusions beat
                   dedicated VPU kernels here, and Mosaic's tpu.matmul runs
                   int8 at only the bf16 MXU rate so fully-fused Pallas GEMMs
                   lose to XLA's native int8 lowering.

    Import-time snapshot (ops/knobs.py) — set the env var before importing.
    """
    from clip_assisted_data_labeling_tpu.ops import knobs

    return knobs.INT8_BLOCK


def _block_int8_xla(x, p, cfg: VitConfig):
    """W8A8 block with XLA int8 matmuls (the MXU-fast path on this toolchain)
    and the Pallas attention kernel emitting its output pre-quantized from
    VMEM, so the out-projection's activation quantize pass disappears. The
    remaining quantizes (ln outs, gelu out) stay in XLA where its fusion
    machinery measured faster than dedicated Pallas VPU kernels."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import q_matmul
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

    B, S, w = x.shape
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    qkv = q_matmul(y, p["qkv_kernel"], p["qkv_kernel_scale"], p["qkv_bias"],
                   out_dtype=x.dtype)
    attn_q, attn_s = fused_attention_packed(
        qkv, heads=cfg.heads, scale=cfg.head_dim ** -0.5, quant_out=True,
        s_real=cfg.seq_len,
    )
    x = q_matmul_pre(
        attn_q.reshape(B * S, w), attn_s.reshape(B * S, 1),
        p["out_kernel"], p["out_kernel_scale"], p["out_bias"],
        residual=x.reshape(B * S, w),
    ).reshape(B, S, w)
    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    y = _act(q_matmul(y, p["fc1_kernel"], p["fc1_kernel_scale"], p["fc1_bias"],
                      out_dtype=x.dtype), cfg.act, quantized=True)
    return x + q_matmul(y, p["fc2_kernel"], p["fc2_kernel_scale"],
                        p["fc2_bias"], out_dtype=x.dtype)


def _block(x, p, cfg: VitConfig, fused_attention: bool, quantized: bool,
           rope=None):
    """One pre-LN transformer block. x: [B, S, w]; rope: (cos, sin) or None.

    When ``p`` carries calibrated ``act_amax`` scales ([4] per layer, attached
    by :func:`attach_act_amax`), activation quantization is static (fused into
    producer epilogues); otherwise dynamic per-row."""
    a = p.get("act_amax") if quantized else None
    # EVA02 blocks (swiglu MLP / inner attention LN): int8_static is served
    # by _block_int8_static_lnk's EVA branches; the q8s wire and the DYNAMIC
    # int8 paths have no EVA formulation (encoders.py downgrades dynamic-int8
    # EVA encoders to bf16)
    eva_block = cfg.mlp_type == "swiglu" or cfg.attn_inner_ln
    post = cfg.block_norm == "post"  # EVA02-E: norm on the sublayer output
    if quantized and fused_attention and not post:
        if (a is not None and "qkv_amax" in p and rope is None
                and not eva_block):
            # the q8s wire kernel q-row-tiles long sequences (ViT-L-336's 592
            # padded tokens fit since round 4); the gate is still the VMEM
            # budget — int8 blocks + per-head bf16 k/v dequant temporaries +
            # one tile's f32 score set — not a fixed sequence cutoff
            from clip_assisted_data_labeling_tpu.ops.attention import (
                packed_q8s_fits,
            )

            if packed_q8s_fits(x.shape[1], cfg.width, cfg.heads):
                return _block_int8_static_wire(x, p, cfg)
        if a is not None:
            from clip_assisted_data_labeling_tpu.ops import knobs

            # default static path: Pallas single-pass ln+quantize (bit-identical
            # to the XLA chain, +23 imgs/s — BENCH_NOTES round 3). Env kill
            # switch CTPU_LN_KERNEL=0 (import-time snapshot, ops/knobs.py);
            # widths not divisible by 128 fall back.
            if knobs.LN_KERNEL and cfg.width % 128 == 0:
                return _block_int8_static_lnk(x, p, cfg, rope)
        if a is None and rope is None and not eva_block:
            mode = _int8_block_mode()
            # same width gate as the static lnk dispatch above: the fused
            # block's rowquant needs K % 128 == 0; narrow towers fall through
            if mode == "hybrid" and cfg.width % 128 == 0:
                return _block_int8_fused(x, p, cfg)
            if mode == "xla":
                return _block_int8_xla(x, p, cfg)
    B, S, w = x.shape
    h, d = cfg.heads, cfg.head_dim

    y = x if post else _layernorm(x, p["ln1_scale"], p["ln1_bias"],
                                  cfg.ln_eps)
    qkv = _linear(y, p, "qkv_kernel", quantized,
                  act_amax=None if a is None else a[0])
    if fused_attention:
        # Packed-qkv Pallas kernel: consumes the projection's [B, S, 3w] output
        # as-is and emits [B, S, w] — zero layout copies around the kernel, and
        # no [B, h, S, S] score tensor ever touches HBM (the attention here is
        # bandwidth-bound, not FLOP-bound). RoPE (PE family) rotates q/k per
        # head INSIDE the kernel, in VMEM; big towers take the head-grouped
        # variant automatically.
        from clip_assisted_data_labeling_tpu.ops.attention import packed_attention_auto

        attn = packed_attention_auto(qkv, heads=h, scale=d ** -0.5,
                                     s_real=cfg.seq_len, rope=rope)
    else:
        from clip_assisted_data_labeling_tpu.ops.attention import attention_xla

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        if rope is not None:  # PE family: 2-D axial RoPE on q/k, every layer
            q = _apply_rope(q, *rope)
            k = _apply_rope(k, *rope)
        attn = attention_xla(q, k, v, scale=d ** -0.5)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, w)
    if cfg.attn_inner_ln:  # EVA02 sub-LN on the concatenated head outputs
        attn = _layernorm(attn, p["attn_ln_scale"], p["attn_ln_bias"],
                          cfg.ln_eps)
    # NOTE: residual placement is measured, not guessed (round-3 profile):
    # the fc2 residual fuses into the static MLP mega-fusion's epilogue
    # (+4 imgs/s), but BOTH the dynamic-path epilogue residuals (-40: XLA
    # materializes a standalone f32 carry convert) and the static attn-out
    # one (-13) lose to XLA's own placement. Only fc2-static rides inside.
    attn_out = _linear(attn, p, "out_kernel", quantized,
                       act_amax=None if a is None else a[1])
    if post:  # EVA02-E: ln1 normalizes the attention sublayer OUTPUT
        attn_out = _layernorm(attn_out, p["ln1_scale"], p["ln1_bias"],
                              cfg.ln_eps)
    x = x + attn_out

    y = x if post else _layernorm(x, p["ln2_scale"], p["ln2_bias"],
                                  cfg.ln_eps)
    if post:
        mlp_out = _act(_linear(y, p, "fc1_kernel", quantized,
                               act_amax=None if a is None else a[2]),
                       cfg.act, quantized=quantized)
        mlp_out = _linear(mlp_out, p, "fc2_kernel", quantized,
                          act_amax=None if a is None else a[3])
        return x + _layernorm(mlp_out, p["ln2_scale"], p["ln2_bias"],
                              cfg.ln_eps)
    if cfg.mlp_type == "swiglu":
        # EVA02 SwiGLU: w1 and w2 ride ONE packed matmul (converter stacks
        # [w1‖w2]); silu(w1·x) ⊙ (w2·x) → ffn sub-LN → w3.
        h = _linear(y, p, "fc1_kernel", quantized)
        h1, h2 = jnp.split(h, 2, axis=-1)
        y = jax.nn.silu(h1) * h2
        y = _layernorm(y, p["ffn_ln_scale"], p["ffn_ln_bias"], cfg.ln_eps)
        return x + _linear(y, p, "fc2_kernel", quantized)
    y = _act(_linear(y, p, "fc1_kernel", quantized,
                     act_amax=None if a is None else a[2]), cfg.act,
             quantized=quantized)
    if a is not None:
        # static path: the residual rides the fc1+gelu+quant+fc2 mega-fusion's
        # dequant epilogue (the dynamic path measured better with XLA's own
        # residual placement — see the NOTE above)
        return _linear(y, p, "fc2_kernel", quantized, act_amax=a[3], residual=x)
    x = x + _linear(y, p, "fc2_kernel", quantized)
    return x


def _patch_embed(params, images, cfg: VitConfig, compute_dtype,
                 quantized: bool) -> jnp.ndarray:
    """images (any accepted layout) → patch-embedded [B, N, width].

    Accepted layouts: [B, R, R, 3] images (patchified here), [B, N, p·p·3]
    pre-patchified rows, or [B, gh, gw, p, p, 3] unflattened patch grid
    (ops/crops.py patch_flatten=False) — the last contracts the patch dims
    directly in the embed einsum so NO host-visible reshape/copy of the big
    crop tensor ever happens (the flatten-then-matmul path cost 2.4 ms/step
    of layout copies on the round-3 profile).

    The patch embedding always runs as a bf16 matmul: it is <2% of the
    encoder's FLOPs, and quantizing its activations cost more in f32 layout
    copies than the int8 matmul saved; int8-quantized checkpoints dequantize
    the tiny [p*p*3, w] kernel on the fly."""
    if quantized:
        w_patch = (params["patch_kernel"].astype(jnp.float32)
                   * params["patch_kernel_scale"].astype(jnp.float32)
                   ).astype(compute_dtype)
    else:
        w_patch = params["patch_kernel"].astype(compute_dtype)
    b_patch = (params["patch_bias"].astype(compute_dtype)
               if "patch_bias" in params else None)  # SigLIP conv has a bias

    def plus_bias(x):
        return x if b_patch is None else x + b_patch

    if images.ndim == 3:
        # pre-patchified [B, N, p*p*3] (ops/crops.py patch_size= output)
        return plus_bias(images.astype(compute_dtype) @ w_patch)
    if images.ndim == 6:
        b, gh, gw, pv, pu, c = images.shape
        kern = w_patch.reshape(pv, pu, c, -1)  # row-major == patchify order
        x = jnp.einsum("byxqpc,qpcw->byxw", images.astype(compute_dtype), kern)
        return plus_bias(x.reshape(b, gh * gw, -1))
    # [B, R, R, 3]: split the spatial dims (a free reshape) and contract the
    # patch dims in place — materializing patchify's transpose before a 2-D
    # matmul measured 1.5-2.4 ms/step in copies
    p = cfg.patch_size
    b, H, W, c = images.shape
    gh, gw = H // p, W // p
    if H != gh * p or W != gw * p:
        # non-patch-divisible resolution (SigLIP SO400M-14 @384): a stride-p
        # valid-padding conv never reads the trailing H%p / W%p pixels
        images = images[:, : gh * p, : gw * p]
    x = images.astype(compute_dtype).reshape(b, gh, p, gw, p, c)
    kern = w_patch.reshape(p, p, c, -1)
    x = jnp.einsum("bhqgpc,qpcw->bhgw", x, kern)
    return plus_bias(x.reshape(b, gh * gw, -1))


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, N, p*p*3]; flatten order (row, col, channel) matches the
    torch Conv2d weight conversion in clip_weights.py."""
    B, H, W, C = images.shape
    gh, gw = H // patch_size, W // patch_size
    if H != gh * patch_size or W != gw * patch_size:
        # valid-padding stride conv semantics: trailing remainder pixels unread
        images = images[:, : gh * patch_size, : gw * patch_size]
    x = images.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch_size * patch_size * C)


def default_fused_attention() -> bool:
    """Use the Pallas fused-attention kernel on TPU; XLA path elsewhere."""
    return jax.default_backend() == "tpu" or jax.default_backend() == "axon"


def _stem(params: dict, images: jnp.ndarray, cfg: VitConfig, compute_dtype,
          quantized: bool):
    """Shared pre-layer stem — patch embed (+cls token), positional embedding,
    ln_pre, RoPE tables. ONE implementation serves inference
    (vit_encode_image), calibration (vit_act_amax), and the tensor-parallel
    forward (parallel/tp_static.py) so the calibration statistics can never
    silently come from a different network than inference runs."""
    x = _patch_embed(params, images, cfg, compute_dtype, quantized)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(
            params["class_emb"].astype(compute_dtype), (x.shape[0], 1, cfg.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"].astype(compute_dtype)
    if cfg.use_ln_pre:
        x = _layernorm(x, params["ln_pre_scale"], params["ln_pre_bias"], cfg.ln_eps)
    rope = None
    if cfg.use_rope2d:
        cos, sin = _rope2d_tables(
            cfg.grid, cfg.head_dim, cfg.rope_theta, cfg.use_cls_token
        )
        rope = (jnp.asarray(cos), jnp.asarray(sin))
    return x, rope


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "normalize", "fused_attention", "unroll"),
)
def vit_encode_image(
    params: dict,
    images: jnp.ndarray,  # [B, R, R, 3] preprocessed (CLIP-normalized) NHWC
    cfg: VitConfig,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
    fused_attention: bool | None = None,
    unroll: bool = False,  # python-loop the layers (trades compile time)
) -> jnp.ndarray:
    """Full image-tower forward → [B, embed_dim] (L2-normalized like the
    reference's encode_image, utils/embedder.py:98-99; PE pooling per the
    reference's PE_Encoder family, utils/embedder.py:103-150)."""
    if fused_attention is None:
        fused_attention = default_fused_attention()
    quantized = "patch_kernel_scale" in params  # W8A8 fast mode (ops/quant.py)
    x, rope = _stem(params, images, cfg, compute_dtype, quantized)

    # towers whose packed block overflows scoped VMEM (PE-G14-448: S=1024,
    # w=1536; f32 runs of 336-scale towers) take the head-grouped kernel —
    # ops/attention.packed_attention_auto decides per call site.
    # Token padding happens ONCE here, to the kernels' TILE-FRIENDLY length
    # (ops/attention._pad_for_tiling: ViT-L-336 pads 577→592 so the q-row
    # tiling divides exactly) — padding inside the attention wrapper instead
    # costs a whole-tensor copy EVERY layer (pad.27 ate 12% of the 336 step
    # on the round-4 profile, exactly the round-2 per-layer-pad lesson again).
    if fused_attention:
        from clip_assisted_data_labeling_tpu.ops.attention import (
            _pad_for_tiling,
        )

        s_pad = _pad_for_tiling(cfg.seq_len)
        if s_pad != cfg.seq_len:
            x = jnp.pad(x, ((0, 0), (0, s_pad - cfg.seq_len), (0, 0)))
            if rope is not None:  # identity rotation on padded rows
                pad_n = s_pad - cfg.seq_len
                rope = (
                    jnp.pad(rope[0], ((0, pad_n), (0, 0)), constant_values=1.0),
                    jnp.pad(rope[1], ((0, pad_n), (0, 0))),
                )

    if unroll:
        for i in range(cfg.layers):
            layer = jax.tree.map(lambda a: a[i], params["blocks"])
            x = _block(x, layer, cfg, fused_attention, quantized, rope)
    else:
        def body(carry, block_params):
            return _block(carry, block_params, cfg, fused_attention, quantized, rope), None

        x, _ = jax.lax.scan(body, x, params["blocks"])

    if cfg.pool in ("attn", "map"):
        # PE/SigLIP readout: ln_post over ALL tokens, probe pooling head.
        # Drop the attention-padding rows first — the probe attends over every
        # row it is given, so padded-token garbage would pollute the pool
        # (cls readout below is immune: it reads row 0 only).
        if x.shape[1] != cfg.seq_len:
            x = x[:, : cfg.seq_len]
        x = _layernorm(x, params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps)
        if cfg.pool == "map":
            pooled = _map_pool(x, params, cfg.attn_pooler_heads, cfg.ln_eps,
                               cfg.act)
        else:
            pooled = _attention_pool(x, params, cfg.attn_pooler_heads, cfg.ln_eps)
    elif cfg.pool == "coca":
        # CoCa readout (open_clip legacy attentional_pool): the pooler runs on
        # the RAW trunk output — ln_k inside the pooler is the only pre-pool
        # norm — then ln_post over the POOLED embed_dim. Padded attention rows
        # must drop first (the pooler query attends over every row given).
        if x.shape[1] != cfg.seq_len:
            x = x[:, : cfg.seq_len]
        pooled = _coca_pool(x, params, cfg.attn_pooler_heads, cfg.ln_eps)
        pooled = _layernorm(pooled, params["ln_post_scale"],
                            params["ln_post_bias"], cfg.ln_eps)
    elif cfg.pool == "avg":
        # CLIPA readout (open_clip pool_type 'avg' + final_ln_after_pool):
        # mean over the PATCH tokens — the cls row, though computed, is
        # excluded — then ln_post on the pooled [B, w] vector. Padded
        # attention rows must drop before the mean.
        if x.shape[1] != cfg.seq_len:
            x = x[:, : cfg.seq_len]
        pooled = jnp.mean(x[:, 1 if cfg.use_cls_token else 0:], axis=1)
        pooled = _layernorm(pooled, params["ln_post_scale"],
                            params["ln_post_bias"], cfg.ln_eps)
    else:
        pooled = _layernorm(
            x[:, 0], params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps
        )
    if cfg.use_proj:
        emb = (pooled @ params["proj"].astype(compute_dtype)).astype(jnp.float32)
    else:  # SigLIP: the pooled vector IS the embedding (embed_dim == width)
        emb = pooled.astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def vit_act_amax(
    params: dict,
    images: jnp.ndarray,  # [B, R, R, 3] or pre-patchified [B, N, p*p*3]
    cfg: VitConfig,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Calibration forward for static W8A8. Returns per-layer activation
    amaxes: {"act_amax": [layers, 4], "qkv_amax": [layers, 3·width]}.

    act_amax columns are the four per-tensor quantized-activation sites of a
    transformer block (qkv input, attention output, fc1 input, gelu output);
    qkv_amax is the PER-CHANNEL amax of the qkv projection output (the int8
    attention wire). Runs the XLA attention path on UNPADDED tokens so
    padded-token garbage can't inflate the scales. One batch of real data is
    enough — LN'd and gelu'd activation ranges are stable across batches;
    attach_act_amax adds a safety margin.
    """
    quantized = "patch_kernel_scale" in params
    x, rope = _stem(params, images, cfg, compute_dtype, quantized)
    B, S, w = x.shape
    h, d = cfg.heads, cfg.head_dim
    post = cfg.block_norm == "post"  # EVA02-E: calibration sites mirror the
    # post-norm _block — a[0]/a[2] quantize the RAW residual stream (no
    # pre-LN exists), the sublayer-output LNs sit before the residual adds

    def body(carry, p):
        from clip_assisted_data_labeling_tpu.ops.attention import attention_xla

        x = carry
        y = x if post else _layernorm(x, p["ln1_scale"], p["ln1_bias"],
                                      cfg.ln_eps)
        s_qkv = jnp.max(jnp.abs(y.astype(jnp.float32)))
        qkv = _linear(y, p, "qkv_kernel", quantized)
        s_qkv_ch = jnp.max(jnp.abs(qkv.astype(jnp.float32)), axis=(0, 1))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        if rope is not None:
            q = _apply_rope(q, *rope)
            k = _apply_rope(k, *rope)
        attn = attention_xla(q, k, v, scale=d ** -0.5)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, w)
        if cfg.attn_inner_ln:  # EVA02: a[1] quantizes the POST-sub-LN values
            attn = _layernorm(attn, p["attn_ln_scale"], p["attn_ln_bias"],
                              cfg.ln_eps)
        s_attn = jnp.max(jnp.abs(attn.astype(jnp.float32)))
        attn_out = _linear(attn, p, "out_kernel", quantized)
        if post:
            attn_out = _layernorm(attn_out, p["ln1_scale"], p["ln1_bias"],
                                  cfg.ln_eps)
        x = x + attn_out
        y = x if post else _layernorm(x, p["ln2_scale"], p["ln2_bias"],
                                      cfg.ln_eps)
        s_fc1 = jnp.max(jnp.abs(y.astype(jnp.float32)))
        if cfg.mlp_type == "swiglu":  # EVA02: a[3] quantizes post-ffn-LN
            h1, h2 = jnp.split(_linear(y, p, "fc1_kernel", quantized), 2,
                               axis=-1)
            g = _layernorm(jax.nn.silu(h1) * h2, p["ffn_ln_scale"],
                           p["ffn_ln_bias"], cfg.ln_eps)
        else:
            g = _act(_linear(y, p, "fc1_kernel", quantized), cfg.act,
                     quantized=quantized)
        s_act = jnp.max(jnp.abs(g.astype(jnp.float32)))
        mlp_out = _linear(g, p, "fc2_kernel", quantized)
        if post:
            mlp_out = _layernorm(mlp_out, p["ln2_scale"], p["ln2_bias"],
                                 cfg.ln_eps)
        x = x + mlp_out
        return x, {
            "act_amax": jnp.stack([s_qkv, s_attn, s_fc1, s_act]),
            "qkv_amax": s_qkv_ch,
        }

    blocks = {k: v for k, v in params["blocks"].items()
              if k not in ("act_amax", "qkv_amax")}
    _, stats = jax.lax.scan(body, x, blocks)
    return jax.tree.map(lambda t: t.astype(jnp.float32), stats)


def attach_act_amax(params: dict, amax, margin: float = 1.1) -> dict:
    """Return params with calibrated static-activation scales attached.

    ``amax``: the dict from :func:`vit_act_amax` (a bare [layers, 4] array is
    also accepted — per-tensor sites only, bf16 attention wire). The margin
    covers batch-to-batch range drift (values beyond it clip — symmetric int8
    saturation, graceful). Blocks with ``act_amax`` take the static-quant
    path in :func:`_block`."""
    out = dict(params)
    blocks = dict(params["blocks"])
    if isinstance(amax, dict):
        for key, v in amax.items():
            blocks[key] = jnp.asarray(v, jnp.float32) * margin
    else:
        blocks["act_amax"] = jnp.asarray(amax, jnp.float32) * margin
    out["blocks"] = blocks
    return out


def count_params(params: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
