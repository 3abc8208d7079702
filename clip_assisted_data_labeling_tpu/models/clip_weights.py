"""Torch-checkpoint → JAX parameter conversion for the CLIP ViT image tower.

Supports the two checkpoint dialects a user of the reference toolkit will have on
disk (the reference loads both via open_clip / HF hub in utils/embedder.py:58-100):

  * Hugging Face ``CLIPVisionModelWithProjection`` state dicts
    (keys ``vision_model.…`` + ``visual_projection.weight``), and
  * open_clip / OpenAI ``visual.…`` state dicts (keys ``visual.conv1.weight``,
    ``visual.transformer.resblocks.N.…``, ``visual.proj``).

Also provides a native ``.npz`` format for saving/loading the JAX pytree so that
converted weights round-trip without torch.
"""
from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.vit import VitConfig


def _t(x) -> np.ndarray:
    """torch tensor (or array) → float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_to_patch_kernel(weight) -> np.ndarray:
    """Conv2d weight [width, 3, p, p] → [p*p*3, width] for patchify order
    (row, col, channel) — see models.vit.patchify."""
    w = _t(weight)
    return w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])


def _hf_blocks(sd: dict, pre: str, L: int) -> dict:
    """Stack the per-layer tensors of an HF 'encoder.layers.N.' transformer
    (shared naming between HF CLIPVisionModel and SiglipVisionModel)."""
    def get(k):
        return _t(sd[pre + k])

    blocks: dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "qkv_kernel", "qkv_bias", "out_kernel",
        "out_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
        "fc2_kernel", "fc2_bias")}
    for i in range(L):
        b = f"encoder.layers.{i}."
        blocks["ln1_scale"].append(get(b + "layer_norm1.weight"))
        blocks["ln1_bias"].append(get(b + "layer_norm1.bias"))
        qw = np.concatenate(
            [get(b + f"self_attn.{n}_proj.weight").T for n in ("q", "k", "v")], axis=1
        )
        qb = np.concatenate(
            [get(b + f"self_attn.{n}_proj.bias") for n in ("q", "k", "v")], axis=0
        )
        blocks["qkv_kernel"].append(qw)
        blocks["qkv_bias"].append(qb)
        blocks["out_kernel"].append(get(b + "self_attn.out_proj.weight").T)
        blocks["out_bias"].append(get(b + "self_attn.out_proj.bias"))
        blocks["ln2_scale"].append(get(b + "layer_norm2.weight"))
        blocks["ln2_bias"].append(get(b + "layer_norm2.bias"))
        blocks["fc1_kernel"].append(get(b + "mlp.fc1.weight").T)
        blocks["fc1_bias"].append(get(b + "mlp.fc1.bias"))
        blocks["fc2_kernel"].append(get(b + "mlp.fc2.weight").T)
        blocks["fc2_bias"].append(get(b + "mlp.fc2.bias"))
    return {k: np.stack(v) for k, v in blocks.items()}


def convert_hf_clip_vision(state_dict: dict, cfg: VitConfig) -> dict:
    """HF CLIPVisionModelWithProjection state dict → our pytree."""
    sd = {k: v for k, v in state_dict.items()}
    pre = "vision_model."

    def get(k):
        return _t(sd[pre + k])

    return {
        "patch_kernel": _conv_to_patch_kernel(sd[pre + "embeddings.patch_embedding.weight"]),
        "class_emb": get("embeddings.class_embedding"),
        "pos_emb": get("embeddings.position_embedding.weight"),
        "ln_pre_scale": get("pre_layrnorm.weight"),  # sic — HF's historical typo
        "ln_pre_bias": get("pre_layrnorm.bias"),
        "blocks": _hf_blocks(sd, pre, cfg.layers),
        "ln_post_scale": get("post_layernorm.weight"),
        "ln_post_bias": get("post_layernorm.bias"),
        "proj": _t(sd["visual_projection.weight"]).T,
    }


def convert_siglip_visual(state_dict: dict, cfg: VitConfig) -> dict:
    """HF SiglipVisionModel state dict → our pytree.

    Same per-block naming as HF CLIP ('encoder.layers.N.…') but: the patch
    conv has a bias, no class embedding, no pre-layernorm, no visual
    projection, and the readout is a MAP head
    (``vision_model.head.{probe,attention,layernorm,mlp}``) — see
    models.vit._map_pool. The reference reaches SigLIP checkpoints through
    open_clip's create_model_and_transforms (utils/embedder.py:61-63)."""
    sd = dict(state_dict)
    pre = "vision_model." if any(
        k.startswith("vision_model.") for k in sd) else ""

    def get(k):
        return _t(sd[pre + k])

    patch_w = _t(sd[pre + "embeddings.patch_embedding.weight"])
    return {
        # naflex checkpoints patch-embed with a Linear over pre-patchified
        # (p, p, c)-flattened rows (HF Siglip2VisionEmbeddings) — same flatten
        # order as our patchify, so the 2-D weight just transposes; fixed-res
        # checkpoints use a Conv2d
        "patch_kernel": (patch_w.T if patch_w.ndim == 2
                         else _conv_to_patch_kernel(sd[pre + "embeddings.patch_embedding.weight"])),
        "patch_bias": get("embeddings.patch_embedding.bias"),
        "pos_emb": get("embeddings.position_embedding.weight"),
        "blocks": _hf_blocks(sd, pre, cfg.layers),
        "ln_post_scale": get("post_layernorm.weight"),
        "ln_post_bias": get("post_layernorm.bias"),
        "pool_probe": get("head.probe").reshape(-1),
        # nn.MultiheadAttention: in_proj [3w, w] row-ordered q|k|v → [w, 3w]
        "pool_in_kernel": get("head.attention.in_proj_weight").T,
        "pool_in_bias": get("head.attention.in_proj_bias"),
        "pool_out_kernel": get("head.attention.out_proj.weight").T,
        "pool_out_bias": get("head.attention.out_proj.bias"),
        "pool_ln_scale": get("head.layernorm.weight"),
        "pool_ln_bias": get("head.layernorm.bias"),
        "pool_fc1_kernel": get("head.mlp.fc1.weight").T,
        "pool_fc1_bias": get("head.mlp.fc1.bias"),
        "pool_fc2_kernel": get("head.mlp.fc2.weight").T,
        "pool_fc2_bias": get("head.mlp.fc2.bias"),
    }


def convert_open_clip_visual(state_dict: dict, cfg: VitConfig) -> dict:
    """open_clip / OpenAI 'visual.*' state dict → our pytree."""
    sd = {k[len("visual."):]: v for k, v in state_dict.items() if k.startswith("visual.")}
    if not sd:  # maybe already stripped
        sd = dict(state_dict)

    L = cfg.layers
    blocks: dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "qkv_kernel", "qkv_bias", "out_kernel",
        "out_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
        "fc2_kernel", "fc2_bias")}
    for i in range(L):
        b = f"transformer.resblocks.{i}."
        blocks["ln1_scale"].append(_t(sd[b + "ln_1.weight"]))
        blocks["ln1_bias"].append(_t(sd[b + "ln_1.bias"]))
        blocks["qkv_kernel"].append(_t(sd[b + "attn.in_proj_weight"]).T)
        blocks["qkv_bias"].append(_t(sd[b + "attn.in_proj_bias"]))
        blocks["out_kernel"].append(_t(sd[b + "attn.out_proj.weight"]).T)
        blocks["out_bias"].append(_t(sd[b + "attn.out_proj.bias"]))
        blocks["ln2_scale"].append(_t(sd[b + "ln_2.weight"]))
        blocks["ln2_bias"].append(_t(sd[b + "ln_2.bias"]))
        blocks["fc1_kernel"].append(_t(sd[b + "mlp.c_fc.weight"]).T)
        blocks["fc1_bias"].append(_t(sd[b + "mlp.c_fc.bias"]))
        blocks["fc2_kernel"].append(_t(sd[b + "mlp.c_proj.weight"]).T)
        blocks["fc2_bias"].append(_t(sd[b + "mlp.c_proj.bias"]))

    out = {
        "patch_kernel": _conv_to_patch_kernel(sd["conv1.weight"]),
        "pos_emb": _t(sd["positional_embedding"]),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "ln_post_scale": _t(sd["ln_post.weight"]),
        "ln_post_bias": _t(sd["ln_post.bias"]),
        "proj": _t(sd["proj"]),
    }
    if "ln_pre.weight" in sd:  # absent for no_ln_pre towers (CLIPA)
        out["ln_pre_scale"] = _t(sd["ln_pre.weight"])
        out["ln_pre_bias"] = _t(sd["ln_pre.bias"])
    if "class_embedding" in sd:  # absent for cls-token-free towers (PE G14)
        out["class_emb"] = _t(sd["class_embedding"])
    return out


def convert_pe_visual(state_dict: dict, cfg: VitConfig) -> dict:
    """Meta Perception Encoder 'visual.*' state dict → our pytree.

    The reference loads PE towers via ``pe.CLIP.from_config`` from Meta's
    external perception_models repo (utils/embedder.py:103-150). PE keeps
    CLIP's transformer naming (``transformer.resblocks.N.…``) but adds a probe
    attention-pooling head (``attn_pool.probe`` + one nn.MultiheadAttention +
    layernorm) and — for G14 — drops the class token. RoPE is positional code,
    not weights, so conversion is naming only; the rotation tables are rebuilt
    from the config (models/vit._rope2d_tables).
    """
    base = convert_open_clip_visual(state_dict, cfg)
    sd = {k[len("visual."):]: v for k, v in state_dict.items() if k.startswith("visual.")}
    if not sd:
        sd = dict(state_dict)

    # RoPE feature-pair layout: PE rotates INTERLEAVED pairs (q[2i], q[2i+1])
    # as complex lanes; our kernels rotate contiguous HALVES (q[i], q[i+d/2]),
    # which VMEM/XLA handle without strided-lane copies (the interleaved form
    # cost 4.5 ms/layer in layout copies on the PE profile). Attention scores
    # are invariant under any permutation applied to BOTH q and k of the same
    # head, so re-ordering the projection's output columns here makes the two
    # conventions exactly equivalent (models/vit._apply_rope pairs halves).
    base = rope_interleaved_to_half(base, cfg)

    if not cfg.use_cls_token:
        base.pop("class_emb", None)
    if cfg.pool == "attn":
        base.update({
            "pool_probe": _t(sd["attn_pool.probe"]).reshape(-1),
            "pool_in_kernel": _t(sd["attn_pool.attn.in_proj_weight"]).T,
            "pool_in_bias": _t(sd["attn_pool.attn.in_proj_bias"]),
            "pool_out_kernel": _t(sd["attn_pool.attn.out_proj.weight"]).T,
            "pool_out_bias": _t(sd["attn_pool.attn.out_proj.bias"]),
            "pool_ln_scale": _t(sd["attn_pool.layernorm.weight"]),
            "pool_ln_bias": _t(sd["attn_pool.layernorm.bias"]),
        })
    return base


def convert_coca_visual(state_dict: dict, cfg: VitConfig) -> dict:
    """open_clip CoCa 'visual.*' state dict → our pytree.

    The reference reaches CoCa towers (coca_ViT-B-32 / coca_ViT-L-14) through
    the same open_clip dispatch as every other name (utils/embedder.py:58-63).
    The trunk converts as a standard open_clip ViT; the legacy
    AttentionalPooler is a torch nn.MultiheadAttention with kdim = vdim =
    width and embed_dim < width, which stores SEPARATE q/k/v projection
    weights (``q_proj_weight``/``k_proj_weight``/``v_proj_weight``) instead of
    the packed ``in_proj_weight``. ln_post and proj already act on the pooled
    dim in the checkpoint, so the base conversion carries them unchanged.
    """
    base = convert_open_clip_visual(state_dict, cfg)
    sd = {k[len("visual."):]: v for k, v in state_dict.items()
          if k.startswith("visual.")}
    if not sd:
        sd = dict(state_dict)
    base.update({
        "pool_query": _t(sd["attn_pool.query"]),
        "pool_q_kernel": _t(sd["attn_pool.attn.q_proj_weight"]).T,
        "pool_k_kernel": _t(sd["attn_pool.attn.k_proj_weight"]).T,
        "pool_v_kernel": _t(sd["attn_pool.attn.v_proj_weight"]).T,
        "pool_in_bias": _t(sd["attn_pool.attn.in_proj_bias"]),
        "pool_out_kernel": _t(sd["attn_pool.attn.out_proj.weight"]).T,
        "pool_out_bias": _t(sd["attn_pool.attn.out_proj.bias"]),
        "pool_lnq_scale": _t(sd["attn_pool.ln_q.weight"]),
        "pool_lnq_bias": _t(sd["attn_pool.ln_q.bias"]),
        "pool_lnk_scale": _t(sd["attn_pool.ln_k.weight"]),
        "pool_lnk_bias": _t(sd["attn_pool.ln_k.bias"]),
    })
    return base


def convert_eva_visual(state_dict: dict, cfg: VitConfig) -> dict:
    """BAAI EVA / open_clip 'visual.*' EVA state dict → our pytree.

    The reference reaches EVA towers through open_clip's generic dispatch
    (utils/embedder.py:58-63, e.g. 'EVA02-L-14/merged2b_s4b_b131k'). The EVA
    trunk uses timm-style naming (``blocks.N.…``) with EVA-specific pieces:
    separate q/k/v projections where ONLY q and v carry biases (k's is
    zero-filled here — attention is bias-shift-invariant in k only up to the
    softmax, and EVA simply defines it bias-free), an ``inner_attn_ln``
    sub-LN before the attention out-projection, and a SwiGLU MLP
    (``mlp.w1/w2/w3`` or fused ``w12``) with an ``ffn_ln`` sub-LN. w1 and w2
    stack into ONE packed fc1 matmul (models/vit._block's swiglu branch).
    Fused-qkv checkpoints (``attn.qkv.weight`` + ``q_bias``/``v_bias``
    parameters) convert too. EVA02's rope rotates interleaved feature pairs;
    like PE, the q/k projection columns are permuted to our half-split
    convention (:func:`rope_interleaved_to_half`)."""
    sd = {k[len("visual."):]: v for k, v in state_dict.items()
          if k.startswith("visual.")}
    if not sd:
        sd = dict(state_dict)

    w = cfg.width
    swiglu = cfg.mlp_type == "swiglu"
    blocks: dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "qkv_kernel", "qkv_bias", "out_kernel",
        "out_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
        "fc2_kernel", "fc2_bias")}
    if cfg.attn_inner_ln:
        blocks["attn_ln_scale"], blocks["attn_ln_bias"] = [], []
    if swiglu:
        blocks["ffn_ln_scale"], blocks["ffn_ln_bias"] = [], []
    for i in range(cfg.layers):
        b = f"blocks.{i}."
        blocks["ln1_scale"].append(_t(sd[b + "norm1.weight"]))
        blocks["ln1_bias"].append(_t(sd[b + "norm1.bias"]))
        if b + "attn.qkv.weight" in sd:  # fused qkv + bare q/v bias params
            qkv_w = _t(sd[b + "attn.qkv.weight"]).T  # [w, 3w]
            qb = _t(sd[b + "attn.q_bias"]) if b + "attn.q_bias" in sd else (
                np.zeros((w,), np.float32))
            vb = _t(sd[b + "attn.v_bias"]) if b + "attn.v_bias" in sd else (
                np.zeros((w,), np.float32))
        else:  # separate projections; k has NO bias
            qkv_w = np.concatenate(
                [_t(sd[b + f"attn.{n}_proj.weight"]).T for n in ("q", "k", "v")],
                axis=1)
            qb = (_t(sd[b + "attn.q_proj.bias"])
                  if b + "attn.q_proj.bias" in sd
                  else _t(sd[b + "attn.q_bias"]))
            vb = (_t(sd[b + "attn.v_proj.bias"])
                  if b + "attn.v_proj.bias" in sd
                  else _t(sd[b + "attn.v_bias"]))
        blocks["qkv_kernel"].append(qkv_w)
        blocks["qkv_bias"].append(
            np.concatenate([qb, np.zeros((w,), np.float32), vb]))
        if cfg.attn_inner_ln:
            blocks["attn_ln_scale"].append(_t(sd[b + "attn.inner_attn_ln.weight"]))
            blocks["attn_ln_bias"].append(_t(sd[b + "attn.inner_attn_ln.bias"]))
        blocks["out_kernel"].append(_t(sd[b + "attn.proj.weight"]).T)
        blocks["out_bias"].append(_t(sd[b + "attn.proj.bias"]))
        blocks["ln2_scale"].append(_t(sd[b + "norm2.weight"]))
        blocks["ln2_bias"].append(_t(sd[b + "norm2.bias"]))
        if swiglu:
            if b + "mlp.w12.weight" in sd:  # fused w1‖w2 (row-stacked torch)
                fc1_w = _t(sd[b + "mlp.w12.weight"]).T
                fc1_b = _t(sd[b + "mlp.w12.bias"])
            else:
                fc1_w = np.concatenate(
                    [_t(sd[b + "mlp.w1.weight"]).T,
                     _t(sd[b + "mlp.w2.weight"]).T], axis=1)
                fc1_b = np.concatenate(
                    [_t(sd[b + "mlp.w1.bias"]), _t(sd[b + "mlp.w2.bias"])])
            blocks["fc1_kernel"].append(fc1_w)
            blocks["fc1_bias"].append(fc1_b)
            blocks["ffn_ln_scale"].append(_t(sd[b + "mlp.ffn_ln.weight"]))
            blocks["ffn_ln_bias"].append(_t(sd[b + "mlp.ffn_ln.bias"]))
            blocks["fc2_kernel"].append(_t(sd[b + "mlp.w3.weight"]).T)
            blocks["fc2_bias"].append(_t(sd[b + "mlp.w3.bias"]))
        else:  # EVA01: plain timm Mlp
            blocks["fc1_kernel"].append(_t(sd[b + "mlp.fc1.weight"]).T)
            blocks["fc1_bias"].append(_t(sd[b + "mlp.fc1.bias"]))
            blocks["fc2_kernel"].append(_t(sd[b + "mlp.fc2.weight"]).T)
            blocks["fc2_bias"].append(_t(sd[b + "mlp.fc2.bias"]))

    out = {
        "patch_kernel": _conv_to_patch_kernel(sd["patch_embed.proj.weight"]),
        "patch_bias": _t(sd["patch_embed.proj.bias"]),
        "class_emb": _t(sd["cls_token"]).reshape(-1),
        "pos_emb": _t(sd["pos_embed"]).reshape(-1, w),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "ln_post_scale": _t(sd["norm.weight"]),
        "ln_post_bias": _t(sd["norm.bias"]),
    }
    if "head.weight" in sd:  # Linear head to the CLIP embedding dim
        out["proj"] = _t(sd["head.weight"]).T
        if "head.bias" in sd:
            # our readout has no proj bias; EVA's head is bias-free in the
            # CLIP checkpoints — reject a biased one rather than mis-load
            if np.abs(_t(sd["head.bias"])).max() > 0:
                raise ValueError("EVA head.bias is non-zero — unsupported")
    elif "proj" in sd:
        out["proj"] = _t(sd["proj"])
    if cfg.use_rope2d:
        out = rope_interleaved_to_half(out, cfg)
    return out


def rope_interleaved_to_half(params: dict, cfg: VitConfig) -> dict:
    """Permute each head's q/k projection columns from interleaved RoPE
    pairing to the half-split convention and mark the pytree with a
    ``rope_half`` sentinel leaf.

    The sentinel round-trips through npz/orbax/quantization like any other
    leaf, so checkpoints SAVED before the convention switch (no sentinel) are
    detected at load and permuted here — without it they would silently
    rotate the wrong feature pairs (models/vit._apply_rope pairs halves).
    """
    d = cfg.head_dim
    w = cfg.width
    perm_head = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    perm = np.concatenate([h * d + perm_head for h in range(cfg.heads)])
    qkv_perm = np.concatenate([perm, w + perm, 2 * w + np.arange(w)])
    out = dict(params)
    blocks = dict(out["blocks"])
    blocks["qkv_kernel"] = np.asarray(blocks["qkv_kernel"])[:, :, qkv_perm]
    blocks["qkv_bias"] = np.asarray(blocks["qkv_bias"])[:, qkv_perm]
    # A quantized pytree (saved from an int8-mode encoder) carries per-output-
    # channel leaves keyed off the qkv projection's columns; they MUST follow
    # the same permutation or dequant scales land on the wrong columns,
    # silently corrupting embeddings on exactly this legacy-upgrade path.
    for key in ("qkv_kernel_scale", "qkv_amax"):
        if key in blocks:
            blocks[key] = np.asarray(blocks[key])[:, qkv_perm]
    out["blocks"] = blocks
    out["rope_half"] = np.ones((), np.int8)
    return out


def ensure_rope_half(params: dict, cfg: VitConfig) -> dict:
    """Upgrade a loaded checkpoint to the half-split RoPE convention if it
    predates the sentinel (no-op for non-RoPE configs and marked pytrees)."""
    if not cfg.use_rope2d or "rope_half" in params:
        return params
    return rope_interleaved_to_half(params, cfg)


def _fold_bn(sd: dict, key: str, eps: float) -> tuple[np.ndarray, np.ndarray]:
    """BatchNorm running stats → the exact inference-time per-channel affine:
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale."""
    gamma, beta = _t(sd[key + ".weight"]), _t(sd[key + ".bias"])
    mean, var = _t(sd[key + ".running_mean"]), _t(sd[key + ".running_var"])
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def _conv_hwio(weight) -> np.ndarray:
    """Conv2d weight [out, in, kh, kw] → HWIO [kh, kw, in, out]."""
    return _t(weight).transpose(2, 3, 1, 0)


def convert_rn_visual(state_dict: dict, cfg) -> dict:
    """open_clip modified-ResNet 'visual.*' state dict → our pytree
    (models/resnet.py layout: flat keys, HWIO conv kernels, folded BN).

    The reference loads these via open_clip (utils/embedder.py:58-63, e.g.
    'RN50/openai'). Shortcut branches live under ``layerS.B.downsample``: index
    0 is the 1x1 conv (the avgpool has no weights), index 1 its BatchNorm."""
    from clip_assisted_data_labeling_tpu.models.resnet import _block_widths

    sd = {k[len("visual."):]: v for k, v in state_dict.items()
          if k.startswith("visual.")}
    if not sd:
        sd = dict(state_dict)
    eps = cfg.bn_eps

    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = _conv_hwio(sd[f"conv{i}.weight"])
        out[f"bn{i}_scale"], out[f"bn{i}_bias"] = _fold_bn(sd, f"bn{i}", eps)
    for s, b, cin, mid, stride in _block_widths(cfg):
        pre, tpre = f"s{s}b{b}_", f"layer{s + 1}.{b}."
        for i in (1, 2, 3):
            out[pre + f"conv{i}"] = _conv_hwio(sd[tpre + f"conv{i}.weight"])
            out[pre + f"bn{i}_scale"], out[pre + f"bn{i}_bias"] = _fold_bn(
                sd, tpre + f"bn{i}", eps)
        if stride > 1 or cin != mid * cfg.expansion:
            out[pre + "down_conv"] = _conv_hwio(sd[tpre + "downsample.0.weight"])
            out[pre + "down_scale"], out[pre + "down_bias"] = _fold_bn(
                sd, tpre + "downsample.1", eps)
    out["pool_pos_emb"] = _t(sd["attnpool.positional_embedding"])
    for name in ("q", "k", "v", "c"):
        out[f"pool_{name}_kernel"] = _t(sd[f"attnpool.{name}_proj.weight"]).T
        out[f"pool_{name}_bias"] = _t(sd[f"attnpool.{name}_proj.bias"])
    return out


def convert_cnx_visual(state_dict: dict, cfg) -> dict:
    """open_clip/timm ConvNeXt ('visual.trunk.*' + 'visual.head.*') or HF
    ``ConvNextModel`` ('embeddings.* / encoder.stages.*') state dicts → our
    pytree (models/convnext.py layout: HWIO conv kernels, per-stage blocks
    STACKED along a leading depth axis for the scanned forward).

    The reference reaches ConvNeXt towers through open_clip's generic dispatch
    (utils/embedder.py:58-63, e.g. 'convnext_base_w/laion2b_s13b_b82k'). A
    trunk-only checkpoint (HF ConvNextModel has no CLIP projection) converts
    when ``cfg.embed_dim == cfg.final_width`` with an identity projection —
    the parity-test configuration."""
    sd = {}
    for k, v in state_dict.items():
        for pre in ("visual.", "convnext.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    hf = any(k.startswith("embeddings.") for k in sd)

    def conv(k):  # torch OIHW → HWIO
        return _t(sd[k]).transpose(2, 3, 1, 0)

    if hf:
        stem_conv, stem_ln = ("embeddings.patch_embeddings",
                              "embeddings.layernorm")
        down = "encoder.stages.{s}.downsampling_layer"
        blk = "encoder.stages.{s}.layers.{b}."
        names = dict(dw="dwconv", ln="layernorm", fc1="pwconv1",
                     fc2="pwconv2", gamma="layer_scale_parameter")
        head_ln = "layernorm"
    else:
        stem_conv, stem_ln = "trunk.stem.0", "trunk.stem.1"
        down = "trunk.stages.{s}.downsample"
        blk = "trunk.stages.{s}.blocks.{b}."
        names = dict(dw="conv_dw", ln="norm", fc1="mlp.fc1", fc2="mlp.fc2",
                     gamma="gamma")
        head_ln = "trunk.head.norm"

    p = {
        "stem_kernel": conv(stem_conv + ".weight"),
        "stem_bias": _t(sd[stem_conv + ".bias"]),
        "stem_ln_scale": _t(sd[stem_ln + ".weight"]),
        "stem_ln_bias": _t(sd[stem_ln + ".bias"]),
        "head_ln_scale": _t(sd[head_ln + ".weight"]),
        "head_ln_bias": _t(sd[head_ln + ".bias"]),
    }
    for s, (depth, c) in enumerate(zip(cfg.depths, cfg.dims)):
        if s > 0:
            d = down.format(s=s)
            p[f"s{s}_down_ln_scale"] = _t(sd[d + ".0.weight"])
            p[f"s{s}_down_ln_bias"] = _t(sd[d + ".0.bias"])
            p[f"s{s}_down_kernel"] = conv(d + ".1.weight")
            p[f"s{s}_down_bias"] = _t(sd[d + ".1.bias"])
        stacks: dict[str, list] = {k: [] for k in (
            "dw_kernel", "dw_bias", "ln_scale", "ln_bias", "fc1_kernel",
            "fc1_bias", "fc2_kernel", "fc2_bias", "gamma")}
        for b in range(depth):
            pre = blk.format(s=s, b=b)
            stacks["dw_kernel"].append(conv(pre + names["dw"] + ".weight"))
            stacks["dw_bias"].append(_t(sd[pre + names["dw"] + ".bias"]))
            stacks["ln_scale"].append(_t(sd[pre + names["ln"] + ".weight"]))
            stacks["ln_bias"].append(_t(sd[pre + names["ln"] + ".bias"]))
            stacks["fc1_kernel"].append(_t(sd[pre + names["fc1"] + ".weight"]).T)
            stacks["fc1_bias"].append(_t(sd[pre + names["fc1"] + ".bias"]))
            stacks["fc2_kernel"].append(_t(sd[pre + names["fc2"] + ".weight"]).T)
            stacks["fc2_bias"].append(_t(sd[pre + names["fc2"] + ".bias"]))
            g = pre + names["gamma"]
            stacks["gamma"].append(
                _t(sd[g]) if g in sd else np.ones((c,), np.float32))
        for k, v in stacks.items():
            p[f"s{s}_{k}"] = np.stack(v)
    if "head.proj.weight" in sd:  # open_clip TimmModel proj='linear'
        p["proj_kernel"] = _t(sd["head.proj.weight"]).T
        p["proj_bias"] = (_t(sd["head.proj.bias"])
                          if "head.proj.bias" in sd
                          else np.zeros((cfg.embed_dim,), np.float32))
    elif "head.mlp.fc1.weight" in sd:  # proj='mlp' (the _d models)
        p["proj_fc1_kernel"] = _t(sd["head.mlp.fc1.weight"]).T
        p["proj_fc1_bias"] = _t(sd["head.mlp.fc1.bias"])
        p["proj_fc2_kernel"] = _t(sd["head.mlp.fc2.weight"]).T
        p["proj_fc2_bias"] = (_t(sd["head.mlp.fc2.bias"])
                              if "head.mlp.fc2.bias" in sd
                              else np.zeros((cfg.embed_dim,), np.float32))
    elif cfg.embed_dim == cfg.final_width:
        p["proj_kernel"] = np.eye(cfg.final_width, dtype=np.float32)
        p["proj_bias"] = np.zeros((cfg.embed_dim,), np.float32)
    else:
        raise ValueError(
            "ConvNeXt checkpoint has no projection head (looked for "
            "head.proj / head.mlp) and cfg.embed_dim != trunk width — "
            "trunk-only checkpoints need embed_dim == final_width"
        )
    return {k: jnp.asarray(v) for k, v in p.items()}


def convert_torch_state_dict(state_dict: dict, cfg: VitConfig) -> dict:
    keys = list(state_dict.keys())
    if (any(".dwconv." in k or ".conv_dw." in k or ".pwconv1." in k
            for k in keys) or hasattr(cfg, "dims")):
        # ConvNeXt towers (CNXConfig) — checked first: depthwise-conv keys
        # appear in no other family
        return convert_cnx_visual(state_dict, cfg)
    if any("attnpool." in k for k in keys) or hasattr(cfg, "bn_eps"):
        # modified-ResNet towers (RNConfig) — their keys carry
        # neither 'resblocks' nor 'vision_model.'
        return convert_rn_visual(state_dict, cfg)
    if any(k.endswith("head.probe") for k in keys) or cfg.pool == "map":
        # SigLIP's HF layout also starts with vision_model. — check first
        return convert_siglip_visual(state_dict, cfg)
    if any(k.startswith("vision_model.") for k in keys):
        return convert_hf_clip_vision(state_dict, cfg)
    if any(k.endswith("blocks.0.norm1.weight") for k in keys):
        # EVA trunks use timm-style 'blocks.N.' naming (never 'resblocks')
        return convert_eva_visual(state_dict, cfg)
    if (any("attn_pool.ln_q." in k for k in keys)
            or getattr(cfg, "pool", None) == "coca"):
        # CoCa's AttentionalPooler (ln_q/ln_k keys exist in no other family)
        # — must check before PE, whose pooler also lives under 'attn_pool.'
        return convert_coca_visual(state_dict, cfg)
    if any("attn_pool." in k for k in keys) or cfg.pool == "attn":
        return convert_pe_visual(state_dict, cfg)
    if any("resblocks" in k for k in keys):
        return convert_open_clip_visual(state_dict, cfg)
    raise ValueError(
        "Unrecognized checkpoint layout; expected HF CLIP, SigLIP, open_clip, "
        "or PE keys"
    )


def save_params_orbax(path: str, params: dict) -> None:
    """Orbax checkpoint of the parameter pytree — the scale-out format: each
    host saves only its addressable shards, so TP-sharded towers too big for
    one host's memory (ViT-bigG/PE-G at f32) checkpoint without gathering.
    ``.npz`` (below) remains the default at ViT-L scale."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_params_npz(path: str, params: dict) -> None:
    flat = {}
    for k, v in params.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                flat[f"{k}/{k2}"] = np.asarray(v2)
        else:
            flat[k] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    params: dict = {}
    for k in data.files:
        if "/" in k:
            k1, k2 = k.split("/", 1)
            params.setdefault(k1, {})[k2] = jnp.asarray(data[k])
        else:
            params[k] = jnp.asarray(data[k])
    return params
