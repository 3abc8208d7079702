"""Tensor parallelism for the int8_static path — explicit collectives.

The GSPMD TP path (parallel/tp.py) cannot partition the static-scale Pallas
blocks (opaque custom calls), so tensor-parallel runs used to silently fall
back to dynamic activation quantization (ROADMAP "TP mesh + int8_static").
This module writes the Megatron column→row dataflow out BY HAND under
``shard_map``, so every device runs the ordinary single-device static block —
Pallas kernels included — on its own weight shard:

  * qkv/fc1 column-parallel: each device computes its head/hidden slice with
    no communication. The packed-qkv layout [q|k|v] must survive sharding, so
    :func:`reorder_qkv_tp` pre-permutes the qkv output columns from the global
    [q(w)|k(w)|v(w)] packing to a per-device [q_j|k_j|v_j] block layout —
    a contiguous equal split then hands every device a well-formed packed qkv
    of its own heads (scores are head-local, so this is exact).
  * out/fc2 row-parallel: devices hold input-feature shards and compute
    partial INT32 accumulators; one ``psum`` per pair runs over the ``model``
    axis BEFORE dequantization. Integer summation is associative, so the
    tensor-parallel forward is BIT-IDENTICAL to the single-device int8_static
    forward (an f32 psum of dequantized partials would differ in ulps).
  * layernorms / patch embed / pooling / projection are replicated compute
    (standard Megatron practice — they are <2% of FLOPs).

Per block the wire cost is two [B·S, w] int32 psums over ICI, identical in
shape to the bf16 TP path's activation collectives (GSPMD inserts the same
two) at 2× the bytes; the matmul/attention FLOPs split m ways.

Reference context: the reference has no parallelism at all (SURVEY §2b);
this is new TPU-first surface, validated bit-exact against the single-device
path in tests/test_tp_static.py and __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    _act,
    _attention_pool,
    _layernorm,
    _stem,
)
from clip_assisted_data_labeling_tpu.parallel.mesh import compat_shard_map
from clip_assisted_data_labeling_tpu.parallel.tp import tp_block_spec


def reorder_qkv_tp(params: dict, cfg: VitConfig, n_model: int) -> dict:
    """Permute qkv output columns so a contiguous ``n_model``-way split of the
    last axis gives every device a packed [q_j|k_j|v_j] of its heads.

    Applies to every per-output-channel qkv leaf present (kernel, bias,
    quantization scale, wire amax). Exact: attention scores only ever contract
    q/k of the SAME head, and the out-projection's row shard is permuted to
    match, so the composition is the identity transformation.
    """
    if cfg.heads % n_model:
        raise ValueError(f"{cfg.heads} heads do not split over model={n_model}")
    w, d = cfg.width, cfg.head_dim
    hpd = cfg.heads // n_model  # heads per device
    cols = []
    rows = []
    for j in range(n_model):
        head_cols = np.arange(j * hpd * d, (j + 1) * hpd * d)
        cols += [head_cols, w + head_cols, 2 * w + head_cols]
        rows.append(head_cols)
    perm = np.concatenate(cols)  # [3w] qkv output-column permutation
    row_perm = np.concatenate(rows)  # [w] == identity (kept for clarity)
    out = dict(params)
    blocks = dict(out["blocks"])
    for key in ("qkv_kernel",):
        blocks[key] = np.asarray(blocks[key])[:, :, perm]
    for key in ("qkv_bias", "qkv_kernel_scale", "qkv_amax"):
        if key in blocks:
            blocks[key] = np.asarray(blocks[key])[:, perm]
    # out_kernel consumes the attention output, whose column layout is the
    # concatenation of per-device head outputs — already the global head
    # order, so its rows need no permutation (row_perm is the identity).
    del row_perm

    if cfg.mlp_type == "swiglu":
        # EVA02 packs w1‖w2 into ONE fc1 matmul (models/vit._block); the
        # silu(h1)⊙h2 gate needs each device to hold the SAME hidden slice of
        # both halves, so pair the columns per device: [w1_j | w2_j].
        mlp = np.asarray(blocks["fc1_kernel"]).shape[-1] // 2
        if mlp % n_model:
            raise ValueError(
                f"swiglu hidden {mlp} does not split over model={n_model}"
            )
        ml = mlp // n_model
        fperm = np.concatenate([
            np.concatenate([np.arange(j * ml, (j + 1) * ml),
                            mlp + np.arange(j * ml, (j + 1) * ml)])
            for j in range(n_model)
        ])
        blocks["fc1_kernel"] = np.asarray(blocks["fc1_kernel"])[:, :, fperm]
        for key in ("fc1_bias", "fc1_kernel_scale"):
            if key in blocks:
                blocks[key] = np.asarray(blocks[key])[:, fperm]
        # fc2 rows and ffn_ln params consume the GATED hidden (natural order:
        # device j's gate output is hidden channels [j·ml, (j+1)·ml)) — fc2's
        # contiguous row split already matches; ffn_ln params stay replicated
        # for the gather-LN (see _block_tp_static).
    out["blocks"] = blocks
    return out


def tp_static_specs(params: dict) -> dict:
    """PartitionSpec pytree for the shard_map in_specs (same layout rules as
    parallel/tp.TP_BLOCK_SPECS; non-block leaves replicated)."""
    return {
        name: (
            {k: tp_block_spec(k) for k in leaf}
            if name == "blocks" else P()
        )
        for name, leaf in params.items()
    }


def place_tp_static(params: dict, mesh: Mesh, cfg: VitConfig) -> dict:
    """Reorder the qkv packing for the mesh's model size and place every leaf
    with its TP sharding."""
    n_model = mesh.shape["model"]
    params = reorder_qkv_tp(params, cfg, n_model)
    specs = tp_static_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def _block_tp_static(x, p, cfg: VitConfig, heads_local: int, rope,
                     fused_attention: bool, axis: str = "model"):
    """One pre-LN block on LOCAL shards — mirrors models/vit._block's static
    branch op-for-op (same quantize/dequant/bias/residual order gives the
    bit-exact guarantee), with int32 psums at the two row-parallel matmuls."""
    from clip_assisted_data_labeling_tpu.ops.quant import quant_static
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_matmul_pre

    B, S, w = x.shape
    d = cfg.head_dim
    a = p["act_amax"]
    inv127 = 1.0 / 127.0

    # int8 attention wire, TP formulation: the per-channel qkv_amax was
    # permuted with the qkv columns (reorder_qkv_tp), so each device folds its
    # OWN [3·wl] scale slice exactly as the single-device wire block does
    # (models/vit._block_int8_static_wire) — per-head attention is shard-local
    # and the attn-out scale a[1] is a replicated scalar, so the int8 output
    # feeds the int32-psum row-parallel out-projection bit-identically.
    wl = p["qkv_kernel"].shape[-1] // 3
    wire = ("qkv_amax" in p and rope is None and fused_attention
            and not cfg.attn_inner_ln and cfg.mlp_type != "swiglu")
    if wire:
        from clip_assisted_data_labeling_tpu.ops.attention import (
            packed_q8s_fits,
        )

        wire = packed_q8s_fits(S, wl, heads_local)

    # Mirror models/vit._block's dispatch: the wire block uses the XLA
    # ln→quantize chain; otherwise fused+width%128 towers take the Pallas
    # single-pass rowquant_static kernels (_block_int8_static_lnk); narrow or
    # non-fused towers take the generic XLA chain. Each route has its own ulp
    # signature in bf16 (the XLA chain inserts a bf16 cast between LN and
    # quantize that the kernel doesn't), so bit-identity REQUIRES taking the
    # same route as the single-device forward.
    from clip_assisted_data_labeling_tpu.ops import knobs

    lnk = ((not wire) and fused_attention and knobs.LN_KERNEL
           and w % 128 == 0)
    if lnk:
        from clip_assisted_data_labeling_tpu.ops.quant_kernel import (
            rowquant_static,
        )

        yq = rowquant_static(x.reshape(B * S, w), p["ln1_scale"],
                             p["ln1_bias"], a[0], ln_eps=cfg.ln_eps)
    else:
        y = _layernorm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
        yq = quant_static(y, a[0]).reshape(B * S, w)
    # the lnk block leaves q_matmul_pre's bf16 default on its column-parallel
    # outputs; the generic path materializes them in x.dtype
    cp_dtype = jnp.bfloat16 if lnk else x.dtype

    if wire:
        from clip_assisted_data_labeling_tpu.ops.attention import (
            fused_attention_packed_q8s,
        )

        qkv_f = q_matmul_pre(yq, a[0] * inv127, p["qkv_kernel"],
                             p["qkv_kernel_scale"], p["qkv_bias"],
                             out_dtype=jnp.float32)
        qa = p["qkv_amax"]  # local [3·wl] per-channel slice
        qkv_q = quant_static(qkv_f, qa).reshape(B, S, 3 * wl)
        cs = jnp.concatenate([
            qa[:wl] * (inv127 * d ** -0.5),
            qa[wl : 2 * wl] * inv127,
            qa[2 * wl :] / a[1],
        ])
        attn_q8 = fused_attention_packed_q8s(
            qkv_q, cs, heads=heads_local, scale=d ** -0.5,
            s_real=cfg.seq_len,
        )
        aq = attn_q8.reshape(B * S, wl)
    else:
        qkv = q_matmul_pre(yq, a[0] * inv127, p["qkv_kernel"],
                           p["qkv_kernel_scale"], p["qkv_bias"],
                           out_dtype=cp_dtype).reshape(B, S, -1)
        if fused_attention:
            from clip_assisted_data_labeling_tpu.ops.attention import (
                packed_attention_auto,
            )

            attn = packed_attention_auto(qkv, heads=heads_local,
                                         scale=d ** -0.5,
                                         s_real=cfg.seq_len, rope=rope)
        else:
            from clip_assisted_data_labeling_tpu.models.vit import _apply_rope
            from clip_assisted_data_labeling_tpu.ops.attention import (
                attention_xla,
            )

            q, k, v = jnp.split(qkv, 3, axis=-1)
            rs = lambda t: t.reshape(B, S, heads_local, d).transpose(0, 2, 1, 3)  # noqa: E731
            q, k, v = rs(q), rs(k), rs(v)
            if rope is not None:
                q = _apply_rope(q, *rope)
                k = _apply_rope(k, *rope)
            attn = attention_xla(q, k, v, scale=d ** -0.5)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, wl)
        if cfg.attn_inner_ln:
            # EVA02 sub-LN spans the FULL width of the head-sharded attention
            # output. all_gather reconstructs the exact single-device layout
            # (each shard's heads are a contiguous natural-order slice), the
            # replicated full-width LN is then the SAME op on the SAME values
            # as the single-device block, and each device slices its own
            # quantized columns back out for the row-parallel out-projection —
            # bit-identity preserved (psum-stat LN would differ in ulps).
            attn_full = jax.lax.all_gather(attn, axis, axis=-1, tiled=True)
            if lnk:
                from clip_assisted_data_labeling_tpu.ops.quant_kernel import (
                    rowquant_static,
                )

                aq_full = rowquant_static(attn_full.reshape(B * S, w),
                                          p["attn_ln_scale"],
                                          p["attn_ln_bias"], a[1],
                                          ln_eps=cfg.ln_eps)
            else:
                attn_full = _layernorm(attn_full, p["attn_ln_scale"],
                                       p["attn_ln_bias"], cfg.ln_eps)
                aq_full = quant_static(attn_full, a[1]).reshape(B * S, w)
            j = jax.lax.axis_index(axis)
            aq = jax.lax.dynamic_slice_in_dim(aq_full, j * wl, wl, axis=1)
        else:
            aq = quant_static(attn, a[1]).reshape(B * S, wl)

    # row-parallel out-projection: psum the INT32 accumulator (exact), then
    # the single dequant+bias epilogue exactly as the single-device path
    acc = jax.lax.psum(
        jax.lax.dot_general(aq, p["out_kernel"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        axis,
    )
    yo = (acc.astype(jnp.float32) * (a[1] * inv127)
          * p["out_kernel_scale"].astype(jnp.float32)
          + p["out_bias"].astype(jnp.float32)).astype(x.dtype)
    x = x + yo.reshape(B, S, w)

    if lnk:
        from clip_assisted_data_labeling_tpu.ops.quant_kernel import (
            rowquant_static,
        )

        yq = rowquant_static(x.reshape(B * S, w), p["ln2_scale"],
                             p["ln2_bias"], a[2], ln_eps=cfg.ln_eps)
    else:
        y = _layernorm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
        yq = quant_static(y, a[2]).reshape(B * S, w)
    if cfg.mlp_type == "swiglu":
        # EVA02 SwiGLU: reorder_qkv_tp paired the packed fc1 columns as
        # [w1_j | w2_j], so the silu gate is shard-local; the ffn sub-LN then
        # spans the full hidden width — same gather-LN-slice move as the
        # attention sub-LN above.
        h = q_matmul_pre(yq, a[2] * inv127, p["fc1_kernel"],
                         p["fc1_kernel_scale"], p["fc1_bias"],
                         out_dtype=cp_dtype)
        h1, h2 = jnp.split(h, 2, axis=-1)
        g_local = jax.nn.silu(h1) * h2
        ml = g_local.shape[-1]
        g_full = jax.lax.all_gather(g_local, axis, axis=-1, tiled=True)
        g_full = _layernorm(g_full, p["ffn_ln_scale"], p["ffn_ln_bias"],
                            cfg.ln_eps)
        gq_full = quant_static(g_full, a[3])
        j = jax.lax.axis_index(axis)
        gq = jax.lax.dynamic_slice_in_dim(gq_full, j * ml, ml, axis=1)
    else:
        h = q_matmul_pre(yq, a[2] * inv127, p["fc1_kernel"],
                         p["fc1_kernel_scale"], p["fc1_bias"],
                         out_dtype=cp_dtype)
        g = _act(h, cfg.act, quantized=True)
        gq = quant_static(g, a[3])
    acc2 = jax.lax.psum(
        jax.lax.dot_general(gq, p["fc2_kernel"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        axis,
    )
    y2 = (acc2.astype(jnp.float32) * (a[3] * inv127)
          * p["fc2_kernel_scale"].astype(jnp.float32)
          + p["fc2_bias"].astype(jnp.float32)
          + x.reshape(B * S, w).astype(jnp.float32)).astype(x.dtype)
    return y2.reshape(B, S, w)


@functools.lru_cache(maxsize=4)
def _tp_static_fn(mesh: Mesh, cfg: VitConfig, compute_dtype, normalize: bool,
                  fused_attention: bool, spec_key: tuple):
    n_model = mesh.shape["model"]
    heads_local = cfg.heads // n_model
    param_specs = {
        name: ({k: tp_block_spec(k) for k in keys} if name == "blocks" else P())
        for name, keys in spec_key
    }

    def body(params, images):
        quantized = "patch_kernel_scale" in params
        x, rope = _stem(params, images, cfg, compute_dtype, quantized)
        if fused_attention:
            # one tile-friendly pad before the scan (see models/vit.py NOTE)
            from clip_assisted_data_labeling_tpu.ops.attention import (
                _pad_for_tiling,
            )

            s_pad = _pad_for_tiling(cfg.seq_len)
            if s_pad != cfg.seq_len:
                x = jnp.pad(x, ((0, 0), (0, s_pad - cfg.seq_len), (0, 0)))
                if rope is not None:
                    pad_n = s_pad - cfg.seq_len
                    rope = (
                        jnp.pad(rope[0], ((0, pad_n), (0, 0)),
                                constant_values=1.0),
                        jnp.pad(rope[1], ((0, pad_n), (0, 0))),
                    )

        def scan_body(carry, bp):
            return _block_tp_static(carry, bp, cfg, heads_local, rope,
                                    fused_attention), None

        x, _ = jax.lax.scan(scan_body, x, params["blocks"])

        if cfg.pool in ("attn", "map"):
            if x.shape[1] != cfg.seq_len:
                x = x[:, : cfg.seq_len]
            x = _layernorm(x, params["ln_post_scale"], params["ln_post_bias"],
                           cfg.ln_eps)
            if cfg.pool == "map":
                from clip_assisted_data_labeling_tpu.models.vit import _map_pool

                pooled = _map_pool(x, params, cfg.attn_pooler_heads,
                                   cfg.ln_eps, cfg.act)
            else:
                pooled = _attention_pool(x, params, cfg.attn_pooler_heads,
                                         cfg.ln_eps)
        elif cfg.pool == "coca":
            # CoCa readout: pooler on the RAW trunk output, ln_post over the
            # POOLED dim (models/vit.vit_encode_image coca branch); the pool_*
            # leaves are replicated so this matches single-device exactly
            from clip_assisted_data_labeling_tpu.models.vit import _coca_pool

            if x.shape[1] != cfg.seq_len:
                x = x[:, : cfg.seq_len]
            pooled = _coca_pool(x, params, cfg.attn_pooler_heads, cfg.ln_eps)
            pooled = _layernorm(pooled, params["ln_post_scale"],
                                params["ln_post_bias"], cfg.ln_eps)
        elif cfg.pool == "avg":
            # CLIPA readout (models/vit.vit_encode_image avg branch): mean
            # over PATCH tokens (cls excluded, padded rows dropped), ln_post
            # AFTER pooling. x is replicated across the model axis here, so
            # the mean matches single-device exactly.
            if x.shape[1] != cfg.seq_len:
                x = x[:, : cfg.seq_len]
            pooled = jnp.mean(x[:, 1 if cfg.use_cls_token else 0:], axis=1)
            pooled = _layernorm(pooled, params["ln_post_scale"],
                                params["ln_post_bias"], cfg.ln_eps)
        else:
            pooled = _layernorm(x[:, 0], params["ln_post_scale"],
                                params["ln_post_bias"], cfg.ln_eps)
        if cfg.use_proj:
            emb = (pooled @ params["proj"].astype(compute_dtype)
                   ).astype(jnp.float32)
        else:
            emb = pooled.astype(jnp.float32)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    return jax.jit(compat_shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, P("data")),
        out_specs=P("data"),
        check_rep=False,
    ))


def vit_encode_tp_static(params, images, cfg: VitConfig, mesh: Mesh,
                         compute_dtype=jnp.bfloat16, normalize: bool = True,
                         fused_attention: bool | None = None):
    """Tensor-parallel int8_static image-tower forward over a 2-D
    ``('data', 'model')`` mesh → [B, embed_dim].

    ``params`` must be a quantized pytree WITH attached act_amax scales,
    already placed by :func:`place_tp_static` (qkv columns reordered; leaves
    sharded per parallel/tp.TP_BLOCK_SPECS). Batch shards on ``data``.
    Bit-identical to the single-device int8_static forward (int32 psums).
    """
    if fused_attention is None:
        from clip_assisted_data_labeling_tpu.models.vit import (
            default_fused_attention,
        )

        fused_attention = default_fused_attention()
    if "act_amax" not in params["blocks"]:
        raise ValueError("vit_encode_tp_static needs calibrated act_amax "
                         "scales (models/vit.attach_act_amax)")
    # EVA02 (swiglu/sub-LN) blocks are handled by _block_tp_static's EVA
    # branches: fc1 columns are PAIRED per device ([w1_j | w2_j], see
    # reorder_qkv_tp) so the silu gate is shard-local, and both full-width
    # sub-LNs run gather→replicated-LN→slice to preserve bit-identity with
    # the single-device lnk block. reorder_qkv_tp raises when heads or the
    # swiglu hidden don't divide over the model axis.
    spec_key = tuple(
        (name, tuple(sorted(leaf)) if isinstance(leaf, dict) else None)
        for name, leaf in sorted(params.items())
    )
    fn = _tp_static_fn(mesh, cfg, compute_dtype, normalize, fused_attention,
                       spec_key)
    return fn(params, images)
