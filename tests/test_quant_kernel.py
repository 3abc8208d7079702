"""Fused W8A8 Pallas linear vs the XLA quantized path (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.ops.quant import q_matmul, quantize_weight
from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_linear_fused


def test_fused_matches_xla_path(rng):
    x = rng.normal(0, 1, (40, 64)).astype(np.float32)
    k = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)
    wq, scale = quantize_weight(k)

    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 jnp.asarray(b), out_dtype=jnp.float32)
    )
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       jnp.asarray(b), block_m=16, interpret=True,
                       out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_no_bias_and_padding(rng):
    # M not a multiple of block_m exercises the pad/slice path
    x = rng.normal(0, 1, (13, 32)).astype(np.float32)
    k = rng.normal(0, 0.05, (32, 16)).astype(np.float32)
    wq, scale = quantize_weight(k)
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       None, block_m=8, interpret=True, out_dtype=jnp.float32)
    )
    assert got.shape == (13, 16)
    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_non_divisible_dims(rng):
    """Regression (review finding): K/N not multiples of the block sizes must
    pad correctly, not silently truncate/NaN (e.g. ViT-B shapes K=768, N=2304)."""
    x = rng.normal(0, 1, (20, 48)).astype(np.float32)
    k = rng.normal(0, 0.05, (48, 72)).astype(np.float32)
    wq, scale = quantize_weight(k)
    got = np.asarray(
        q_linear_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       None, block_m=8, interpret=True, out_dtype=jnp.float32)
    )
    assert got.shape == (20, 72)
    assert np.isfinite(got).all()
    ref = np.asarray(
        q_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                 out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_q_block_linear_variants(rng):
    """Fully-fused block linear: ln prologue, act epilogue, quant_out, int8-in,
    residual — each vs a float reference (interpret mode)."""
    import jax

    from clip_assisted_data_labeling_tpu.ops.quant_kernel import q_block_linear

    M, K, N = 20, 128, 256
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
    b = rng.normal(0, 0.1, (N,)).astype(np.float32)
    lns = rng.normal(1, 0.1, (K,)).astype(np.float32)
    lnb = rng.normal(0, 0.1, (K,)).astype(np.float32)
    res = rng.normal(0, 1, (M, N)).astype(np.float32)
    wq, ws = quantize_weight(w)

    def ref(x, ln=False, act=None, residual=None):
        # LN + quantize in f32 like the kernel; the matmul and dequant below
        # stay f64 (that is the path under test). Returns amax too: the int8
        # ROUNDING DECISIONS cannot be replicated exactly — XLA fuses the
        # ln/scale chain differently per compilation context (a jitted
        # standalone quantize already flips decisions vs the same ops eager),
        # so values sitting near a .5 boundary legitimately round either way.
        # Comparisons use a flip-aware tolerance instead (see _flip_tol).
        xx = x.astype(np.float32)
        if ln:
            mu = xx.mean(1, keepdims=True, dtype=np.float32)
            var = ((xx - mu) ** 2).mean(1, keepdims=True, dtype=np.float32)
            xx = (xx - mu) * (np.float32(1.0) / np.sqrt(var + np.float32(1e-5)))
            xx = xx * lns + lnb
        amax = np.maximum(np.abs(xx).max(1, keepdims=True), np.float32(1e-8))
        xq = np.clip(np.round(xx * (np.float32(127.0) / amax)), -127, 127)
        xq = xq.astype(np.float64)
        amax = amax.astype(np.float64)
        y = (xq @ wq.astype(np.float64)) * (amax / 127) * ws + b
        if act == "quick_gelu":
            y = y / (1 + np.exp(-1.702 * y))
        if residual is not None:
            y = y + residual
        return y, amax

    def _flip_tol(amax, w_scale, n_flips=2, base=2e-3):
        # one flipped int8 decision at (i, k) moves y[i, j] by at most
        # (amax_i/127)*|wq[k, j]|*ws_j ≤ amax_i*ws_j; allow n_flips per row
        return base + n_flips * amax * np.asarray(w_scale)[None, :].reshape(1, -1)

    def assert_close_mod_flips(got, ref_y, amax, w_scale, lipschitz=1.0):
        err = np.abs(got - ref_y)
        tol = _flip_tol(amax, w_scale) * lipschitz
        assert np.all(err <= tol), (
            f"max excess {float((err - tol).max()):.2e} over the "
            "2-decision-flip tolerance — a real numeric divergence"
        )

    got = np.asarray(q_block_linear(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(b),
        ln_scale=jnp.asarray(lns), ln_bias=jnp.asarray(lnb),
        block_m=8, interpret=True, out_dtype=jnp.float32))
    ref_y, amax = ref(x, ln=True)
    assert_close_mod_flips(got, ref_y, amax, ws)

    got = np.asarray(q_block_linear(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(b),
        residual=jnp.asarray(res), block_m=8, interpret=True,
        out_dtype=jnp.float32))
    ref_y, amax = ref(x, residual=res)
    assert_close_mod_flips(got, ref_y, amax, ws)

    hq, hs = q_block_linear(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(b),
        act="quick_gelu", quant_out=True, block_m=8, interpret=True)
    ref_act, amax = ref(x, act="quick_gelu")
    deq = np.asarray(hq, np.float64) * np.asarray(hs)
    step = np.abs(ref_act).max(1, keepdims=True) / 127
    # out-quantization step + input-side decision flips (quick_gelu has
    # Lipschitz constant ≈1.1, covered by the flip tolerance's 1.2 factor)
    assert np.all(np.abs(deq - ref_act) <= step + _flip_tol(amax, ws) * 1.2)

    w2 = rng.normal(0, 0.05, (N, K)).astype(np.float32)
    w2q, w2s = quantize_weight(w2)
    y2 = np.asarray(q_block_linear(
        hq, jnp.asarray(w2q), jnp.asarray(w2s), None, x_scale=hs,
        block_m=8, interpret=True, out_dtype=jnp.float32))
    ref2 = (np.asarray(hq, np.float64) * np.asarray(hs)) @ w2q.astype(np.float64) * w2s
    np.testing.assert_allclose(y2, ref2, atol=2e-3, rtol=1e-3)


def test_rowquant_single_pass(rng):
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import rowquant

    M, K = 18, 128
    x = rng.normal(0, 2, (M, K)).astype(np.float32)
    lns = rng.normal(1, 0.1, (K,)).astype(np.float32)
    lnb = rng.normal(0, 0.1, (K,)).astype(np.float32)

    # ln + quantize
    xq, xs = rowquant(jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
                      block_m=8, interpret=True)
    xx = x.astype(np.float64)
    mu = xx.mean(1, keepdims=True)
    ln = (xx - mu) / np.sqrt(xx.var(1, keepdims=True) + 1e-5) * lns + lnb
    deq = np.asarray(xq, np.float64) * np.asarray(xs)
    assert np.all(np.abs(deq - ln) <= np.abs(ln).max(1, keepdims=True) / 127 + 1e-6)

    # gelu + quantize
    xq, xs = rowquant(jnp.asarray(x), act="quick_gelu", block_m=8, interpret=True)
    g = xx / (1 + np.exp(-1.702 * xx))
    deq = np.asarray(xq, np.float64) * np.asarray(xs)
    assert np.all(np.abs(deq - g) <= np.abs(g).max(1, keepdims=True) / 127 + 1e-6)


def test_attention_quant_out_matches_bf16(rng):
    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_packed_q8_xla,
        fused_attention_packed,
        fused_attention_packed_q8,
    )

    B, S, w, heads = 2, 10, 64, 4
    qkv = rng.normal(0, 1, (B, S, 3 * w)).astype(np.float32)
    plain = np.asarray(
        fused_attention_packed(jnp.asarray(qkv), heads=heads, scale=0.25,
                               interpret=True)
    )
    oq, osc = fused_attention_packed(jnp.asarray(qkv), heads=heads, scale=0.25,
                                     interpret=True, quant_out=True)
    deq = np.asarray(oq, np.float32) * np.asarray(osc)
    assert np.abs(deq - plain).max() < np.abs(plain).max() / 100

    # int8-wire input kernel agrees with its XLA reference
    amax = np.maximum(np.abs(qkv).max(-1, keepdims=True), 1e-8)
    qkv_q = np.clip(np.round(qkv / (amax / 127)), -127, 127).astype(np.int8)
    sc = (amax / 127).astype(np.float32)
    a = np.asarray(fused_attention_packed_q8(
        jnp.asarray(qkv_q), jnp.asarray(sc), heads=heads, scale=0.25,
        interpret=True, out_dtype=jnp.float32))
    b = np.asarray(attention_packed_q8_xla(jnp.asarray(qkv_q), jnp.asarray(sc),
                                           heads, 0.25))
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-2)  # bf16 ULP, fold associativity


def test_packed_attention_prepadded_zero_rows_contract(rng):
    """Caller-side padding contract (ops/attention.py _packed_kernel): when qkv
    arrives pre-padded with ZERO token rows and s_real < S, the kernel's exact
    -inf score mask must reproduce the unpadded softmax over the real tokens.
    (The kernel deliberately REJECTS the O(S) denominator-correction variant —
    it cancels catastrophically in f32; see _packed_kernel's docstring.)"""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed,
    )

    b, s, h, d = 2, 9, 3, 8
    w = h * d
    qkv = rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32)
    ref = np.asarray(
        fused_attention_packed(jnp.asarray(qkv), heads=h, scale=0.3,
                               interpret=True)
    )
    padded = np.zeros((b, 16, 3 * w), np.float32)
    padded[:, :s] = qkv
    got = np.asarray(
        fused_attention_packed(jnp.asarray(padded), heads=h, scale=0.3,
                               s_real=s, interpret=True)
    )
    np.testing.assert_allclose(got[:, :s], ref, atol=1e-5)

    # quant_out variant under the same contract
    oq, osc = fused_attention_packed(jnp.asarray(padded), heads=h, scale=0.3,
                                     s_real=s, quant_out=True, interpret=True)
    deq = np.asarray(oq, np.float32)[:, :s] * np.asarray(osc)[:, :s]
    assert np.abs(deq - ref).max() < np.abs(ref).max() / 90


def test_q8s_static_wire_attention_matches_reference(rng):
    """int8_static attention wire: per-channel-quantized int8 qkv in, int8 out
    under a static attn-out scale — must match dequantize->softmax->requantize
    computed in plain XLA."""
    import jax

    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_xla,
        fused_attention_packed_q8s,
    )

    b, s, h, d = 2, 9, 3, 8
    w = h * d
    qkv = rng.normal(0, 1.5, (b, s, 3 * w)).astype(np.float32)
    ch_amax = np.maximum(np.abs(qkv).reshape(-1, 3 * w).max(0), 1e-6)
    qkv_q = np.clip(np.round(qkv * (127.0 / ch_amax)), -127, 127).astype(np.int8)
    # attention outputs are convex combinations of v rows, so max|v| bounds them
    out_amax = float(np.abs(qkv[..., 2 * w :]).max())
    scale = d ** -0.5
    cs = np.concatenate([
        ch_amax[:w] / 127.0 * scale,
        ch_amax[w : 2 * w] / 127.0,
        ch_amax[2 * w :] / out_amax,
    ]).astype(np.float32)

    got_q = np.asarray(fused_attention_packed_q8s(
        jnp.asarray(qkv_q), jnp.asarray(cs), heads=h, scale=scale,
        interpret=True))
    got = got_q.astype(np.float32) * (out_amax / 127.0)

    deq = (qkv_q.astype(np.float32) * (ch_amax / 127.0)).astype(np.float32)
    rs = lambda t: t.reshape(b, s, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = np.split(deq, 3, axis=-1)
    ref = np.asarray(attention_xla(
        jnp.asarray(rs(q)), jnp.asarray(rs(k)), jnp.asarray(rs(v)), scale
    )).transpose(0, 2, 1, 3).reshape(b, s, w)
    # bf16 matmuls + one int8 requant step of error budget
    assert np.abs(got - ref).max() < out_amax / 90 + 2e-2 * np.abs(ref).max()

    # pre-padded variant under the zero-row contract
    padded = np.zeros((b, 16, 3 * w), np.int8)
    padded[:, :s] = qkv_q
    got_pad = np.asarray(fused_attention_packed_q8s(
        jnp.asarray(padded), jnp.asarray(cs), heads=h, scale=scale,
        s_real=s, interpret=True))
    np.testing.assert_array_equal(got_pad[:, :s], got_q)


def test_q8s_wire_long_sequence_row_tiling(rng):
    """S > 448 engages the q8s wire kernel's query-row tiling (round 4: the
    wire now fits ViT-L-336's shapes). The tiled fori_loop path — including
    the _pad_for_tiling wrapper pad and the pad-column -inf mask — must match
    the dequantize->attention->requantize XLA reference."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        _pad_for_tiling,
        _q_tile,
        attention_xla,
        fused_attention_packed_q8s,
        packed_q8s_fits,
    )

    # the gate must now admit ViT-L-336 and still reject G14-448-scale shapes
    assert packed_q8s_fits(577, 1024, 16)
    assert packed_q8s_fits(257, 1024, 16)
    assert not packed_q8s_fits(1025, 1536, 16)

    b, s, h, d = 1, 577, 2, 8
    w = h * d
    s_pad = _pad_for_tiling(s)
    assert s_pad % _q_tile(s_pad) == 0 and s_pad // _q_tile(s_pad) > 1, \
        "test shape must exercise the multi-tile fori_loop path"
    qkv = rng.normal(0, 1.5, (b, s, 3 * w)).astype(np.float32)
    ch_amax = np.maximum(np.abs(qkv).reshape(-1, 3 * w).max(0), 1e-6)
    qkv_q = np.clip(np.round(qkv * (127.0 / ch_amax)), -127, 127).astype(np.int8)
    out_amax = float(np.abs(qkv[..., 2 * w :]).max())
    scale = d ** -0.5
    cs = np.concatenate([
        ch_amax[:w] / 127.0 * scale,
        ch_amax[w : 2 * w] / 127.0,
        ch_amax[2 * w :] / out_amax,
    ]).astype(np.float32)

    got_q = np.asarray(fused_attention_packed_q8s(
        jnp.asarray(qkv_q), jnp.asarray(cs), heads=h, scale=scale,
        s_real=s, interpret=True))
    got = got_q.astype(np.float32) * (out_amax / 127.0)

    deq = (qkv_q.astype(np.float32) * (ch_amax / 127.0)).astype(np.float32)
    rs = lambda t: t.reshape(b, s, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = np.split(deq, 3, axis=-1)
    ref = np.asarray(attention_xla(
        jnp.asarray(rs(q)), jnp.asarray(rs(k)), jnp.asarray(rs(v)), scale
    )).transpose(0, 2, 1, 3).reshape(b, s, w)
    assert np.abs(got - ref).max() < out_amax / 90 + 2e-2 * np.abs(ref).max()


def test_int8_wire_per_shape_default():
    """CTPU_INT8_WIRE tri-state + the per-shape 'auto' resolution (BENCH_NOTES
    round-8 A/Bs): the wire auto-enables ONLY where the non-wire route falls
    to the flash kernel and the tiled q8s kernel fits (SO400M-384, +29%);
    it stays off where the bf16 packed kernel serves the shape (L-224
    neutral, L-336 -14%), on conv towers, and on RoPE towers."""
    import os

    from clip_assisted_data_labeling_tpu.models.vit import (
        int8_wire_enabled,
        resolve_config,
    )
    from clip_assisted_data_labeling_tpu.ops import knobs

    prev = os.environ.get("CTPU_INT8_WIRE")
    try:
        os.environ.pop("CTPU_INT8_WIRE", None)
        knobs.reload()
        assert knobs.INT8_WIRE == "auto"
        assert int8_wire_enabled(
            resolve_config("ViT-SO400M-14-SigLIP-384/webli"))
        assert not int8_wire_enabled(resolve_config("ViT-L-14/openai"))
        assert not int8_wire_enabled(resolve_config("ViT-L-14-336/openai"))
        assert not int8_wire_enabled(resolve_config("RN50/openai"))
        assert not int8_wire_enabled(resolve_config("PE-Test/tiny"))  # rope
        os.environ["CTPU_INT8_WIRE"] = "0"
        knobs.reload()
        assert not int8_wire_enabled(
            resolve_config("ViT-SO400M-14-SigLIP-384/webli"))
        os.environ["CTPU_INT8_WIRE"] = "1"
        knobs.reload()
        assert int8_wire_enabled(resolve_config("ViT-L-14/openai"))
    finally:
        if prev is None:
            os.environ.pop("CTPU_INT8_WIRE", None)
        else:
            os.environ["CTPU_INT8_WIRE"] = prev
        knobs.reload()


def test_rowquant_static_matches_ln_plus_quant(rng):
    from clip_assisted_data_labeling_tpu.ops.quant_kernel import rowquant_static

    M, K = 18, 128
    x = rng.normal(0, 2, (M, K)).astype(np.float32)
    lns = rng.normal(1, 0.1, (K,)).astype(np.float32)
    lnb = rng.normal(0, 0.1, (K,)).astype(np.float32)
    amax = 6.0
    xq = np.asarray(rowquant_static(jnp.asarray(x), jnp.asarray(lns),
                                    jnp.asarray(lnb), amax, block_m=8,
                                    interpret=True))
    xx = x.astype(np.float64)
    mu = xx.mean(1, keepdims=True)
    ln = (xx - mu) / np.sqrt(xx.var(1, keepdims=True) + 1e-5) * lns + lnb
    ref = np.clip(np.round(ln * (127.0 / amax)), -127, 127)
    assert np.abs(xq.astype(np.float64) - ref).max() <= 1  # f32-vs-f64 rounding edge


def test_packed_attention_long_sequence_row_tiling(rng):
    """S > 448 engages the query-row tiling path (VMEM budget at ViT-L-336's
    584 tokens); results must match the XLA reference exactly, including the
    overlapping final tile."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_xla,
        fused_attention_packed,
    )

    b, s, h, d = 1, 584, 2, 8
    w = h * d
    qkv = rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32)
    got = np.asarray(fused_attention_packed(
        jnp.asarray(qkv), heads=h, scale=0.25, s_real=577, interpret=True))
    rs = lambda t: t.reshape(b, s, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = np.split(qkv, 3, axis=-1)
    q2 = rs(q)[:, :, :, :] * 0.25
    scores = np.einsum("bhqd,bhkd->bhqk", q2, rs(k))
    scores[..., 577:] = -np.inf
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, rs(v)).transpose(0, 2, 1, 3).reshape(b, s, w)
    np.testing.assert_allclose(got[:, :577], ref[:, :577], atol=1e-5)


def test_packed_attention_fits_gate():
    """VMEM gate: CLIP towers fit, PE-G14-448 and f32 long sequences do not."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        packed_attention_fits,
    )

    assert packed_attention_fits(257, 1024)        # ViT-L-14 bf16
    assert packed_attention_fits(577, 1024)        # ViT-L-14-336 bf16
    assert not packed_attention_fits(577, 1024, 4)  # same in f32: too big
    assert not packed_attention_fits(1024, 1536)   # PE-G14-448 -> XLA path


def test_packed_attention_routing_at_tower_shapes():
    """Pin packed_attention_auto's routing decisions at every shipped tower
    shape (gates are pure VMEM arithmetic — no device needed). Catches gate
    regressions like the fixed-cutoff q8s bug (ADVICE r2) before they silently
    reroute a tower onto a slower kernel."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        _wholescore_group,
        grouped_attention_fits,
        packed_attention_fits,
    )

    # (s, w, heads, itemsize) -> (whole_block, grouped, wholescore group)
    expectations = {
        "ViT-L-14-224 bf16": ((257, 1024, 16, 2), (True, True, None)),
        "ViT-L-14-336 bf16": ((577, 1024, 16, 2), (True, True, 2)),
        "ViT-L-14-336 f32": ((577, 1024, 16, 4), (False, True, 2)),
        "PE-G14-448 bf16": ((1024, 1536, 16, 2), (False, True, None)),
        "PE-G14-448 f32": ((1024, 1536, 16, 4), (False, True, None)),
        "huge-S bf16 (flash)": ((8192, 512, 8, 2), (False, False, None)),
    }
    for label, ((s, w, h, isz), (whole, grouped, wsg)) in expectations.items():
        assert packed_attention_fits(s, w, isz) == whole, label
        assert grouped_attention_fits(s, w, h, isz) == grouped, label
        assert _wholescore_group(s, w, h, isz) == wsg, label


def test_grouped_attention_matches_whole_block(rng):
    """The head-grouped kernel (big-tower path) must equal the whole-block
    kernel, with and without rope, including the pad mask."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed,
        fused_attention_packed_grouped,
    )

    b, s, h, d = 2, 10, 4, 8
    w = h * d
    qkv = rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32)
    cos = rng.normal(0, 1, (s, d // 2)).astype(np.float32)
    sin = rng.normal(0, 1, (s, d // 2)).astype(np.float32)
    for rope in (None, (jnp.asarray(cos), jnp.asarray(sin))):
        ref = np.asarray(fused_attention_packed(
            jnp.asarray(qkv), heads=h, scale=0.3, s_real=9, rope=rope,
            interpret=True))
        for hg in (1, 2, 4):
            got = np.asarray(fused_attention_packed_grouped(
                jnp.asarray(qkv), heads=h, scale=0.3, s_real=9, rope=rope,
                head_group=hg, interpret=True))
            np.testing.assert_allclose(got, ref, atol=1e-5,
                                       err_msg=f"hg={hg} rope={rope is not None}")


def test_grouped_wholescores_matches_plain(rng):
    """The grouped kernel's pipelined whole-scores mode (long-sequence
    head-lookahead schedule) must equal the plain row-tiled grouped path —
    same exact -inf pad mask, same softmax — with and without rope, at a
    shape long enough that the mode is actually viable (s_pad=456 > the
    448 whole-block q-tile cap)."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        _wholescore_group,
        fused_attention_packed_grouped,
    )

    b, s, h, d = 1, 450, 4, 64
    w = h * d
    qkv = rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32)
    cos = rng.normal(0, 1, (s, d // 2)).astype(np.float32)
    sin = rng.normal(0, 1, (s, d // 2)).astype(np.float32)
    auto_hg = _wholescore_group(s, w, h, 4)
    assert auto_hg is not None, "test shape must qualify for whole-scores"
    for rope in (None, (jnp.asarray(cos), jnp.asarray(sin))):
        ref = np.asarray(fused_attention_packed_grouped(
            jnp.asarray(qkv), heads=h, scale=0.125, s_real=s - 3, rope=rope,
            head_group=2, whole_scores=False, interpret=True))
        for hg in (2, auto_hg):
            got = np.asarray(fused_attention_packed_grouped(
                jnp.asarray(qkv), heads=h, scale=0.125, s_real=s - 3,
                rope=rope, head_group=hg, whole_scores=True, interpret=True))
            np.testing.assert_allclose(
                got, ref, atol=2e-5,
                err_msg=f"hg={hg} rope={rope is not None}")


def test_attn_wholescores_route_knob(rng, monkeypatch):
    """CTPU_ATTN_WHOLESCORES_ROUTE=1 reroutes a row-tiling whole-block shape
    onto the grouped kernel's whole-scores mode through packed_attention_auto
    with identical numerics; shapes with no viable group are untouched."""
    from clip_assisted_data_labeling_tpu.ops import knobs
    from clip_assisted_data_labeling_tpu.ops.attention import (
        packed_attention_auto,
    )

    monkeypatch.setenv("CTPU_PALLAS_INTERPRET", "1")
    b, s, h, d = 1, 450, 4, 64  # s_pad 456 > q_tile 152: row-tiled, hg viable
    qkv = jnp.asarray(rng.normal(0, 1, (b, s, 3 * h * d)).astype(np.float32))
    ref = np.asarray(packed_attention_auto(qkv, heads=h, scale=0.125,
                                           s_real=s - 2))
    monkeypatch.setattr(knobs, "ATTN_WHOLESCORES_ROUTE", True)
    got = np.asarray(packed_attention_auto(qkv, heads=h, scale=0.125,
                                           s_real=s - 2))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_attention_matches_xla(rng):
    """k/v-streaming flash kernel (ops/attention.flash_attention_packed): the
    online-softmax recurrence must reproduce the exact softmax for dividing,
    ragged (s_real < S_pad), and tile-unfriendly sequence lengths."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_xla,
        flash_attention_packed,
    )

    def ref(qkv, heads, scale):
        b, s, w3 = qkv.shape
        w = w3 // 3
        d = w // heads
        q, k, v = np.split(qkv, 3, axis=-1)
        rs = lambda t: jnp.asarray(  # noqa: E731
            t.reshape(b, s, heads, d).transpose(0, 2, 1, 3))
        out = attention_xla(rs(q), rs(k), rs(v), scale)
        return np.asarray(out).transpose(0, 2, 1, 3).reshape(b, s, w)

    for b, s_pad, h, d, s_real in [
        (2, 512, 4, 32, 512),   # multi-panel online softmax
        (1, 584, 4, 32, 577),   # ViT-L-336 shape family (8·prime + ragged)
        (2, 96, 3, 16, 90),     # small + ragged
    ]:
        w = h * d
        qkv = rng.normal(0, 1, (b, s_real, 3 * w)).astype(np.float32)
        r = ref(qkv, h, 0.3)
        padded = np.zeros((b, s_pad, 3 * w), np.float32)
        padded[:, :s_real] = qkv
        got = np.asarray(flash_attention_packed(
            jnp.asarray(padded), heads=h, scale=0.3, s_real=s_real,
            interpret=True))
        np.testing.assert_allclose(got[:, :s_real], r, atol=2e-5)


def test_flash_attention_rope(rng):
    """Flash kernel with in-kernel half-split RoPE rotation (PE family) must
    match rotating q/k in XLA then running exact attention."""
    from clip_assisted_data_labeling_tpu.models.vit import (
        _apply_rope,
        _rope2d_tables,
    )
    from clip_assisted_data_labeling_tpu.ops.attention import (
        attention_xla,
        flash_attention_packed,
    )

    h, d = 4, 32
    w = h * d
    cos, sin = _rope2d_tables(8, d, 100.0, False)  # S = 64
    qkv = rng.normal(0, 1, (2, 64, 3 * w)).astype(np.float32)
    q, k, v = np.split(qkv, 3, axis=-1)
    rs = lambda t: jnp.asarray(t.reshape(2, 64, h, d).transpose(0, 2, 1, 3))  # noqa: E731
    qr = _apply_rope(rs(q), jnp.asarray(cos), jnp.asarray(sin))
    kr = _apply_rope(rs(k), jnp.asarray(cos), jnp.asarray(sin))
    ref = np.asarray(attention_xla(qr, kr, rs(v), 0.25)
                     ).transpose(0, 2, 1, 3).reshape(2, 64, w)
    got = np.asarray(flash_attention_packed(
        jnp.asarray(qkv), heads=h, scale=0.25, rope=(cos, sin),
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_attention_pipelined_head_loop_identical(rng):
    """CTPU_ATTN_PIPELINE restructure (ops/attention._packed_kernel): the
    software-pipelined head loop (head h+1's QKT issued before head h's
    softmax, for MXU/VPU overlap) is the same math in a different program
    order — outputs must be BIT-identical to the plain loop on the bf16,
    quant_out, and RoPE paths (incl. the s_real pad-mask)."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        fused_attention_packed,
    )

    b, s, h, d = 2, 14, 4, 8
    w = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (b, 16, 3 * w)).astype(np.float32))
    kw = dict(heads=h, scale=0.3, s_real=s, interpret=True)
    plain = fused_attention_packed(qkv, pipeline=False, **kw)
    piped = fused_attention_packed(qkv, pipeline=True, **kw)
    assert jnp.array_equal(plain, piped)

    pq, ps = fused_attention_packed(qkv, quant_out=True, pipeline=False, **kw)
    bq, bs = fused_attention_packed(qkv, quant_out=True, pipeline=True, **kw)
    assert jnp.array_equal(pq, bq) and jnp.array_equal(ps, bs)

    cos = jnp.asarray(rng.normal(0, 1, (16, d // 2)).astype(np.float32))
    sin = jnp.asarray(rng.normal(0, 1, (16, d // 2)).astype(np.float32))
    pr = fused_attention_packed(qkv, rope=(cos, sin), pipeline=False, **kw)
    br = fused_attention_packed(qkv, rope=(cos, sin), pipeline=True, **kw)
    assert jnp.array_equal(pr, br)


def test_packed_attention_pipeline_flag_safe_on_tiled_path(rng):
    """pipeline=True on a long sequence (n_tiles>1) is a documented NO-OP —
    the tiled fori_loop keeps the plain order (two pipelined variants measured
    slower there, see the disproof note in _packed_kernel); output must stay
    bit-identical to pipeline=False."""
    from clip_assisted_data_labeling_tpu.ops.attention import (
        _pad_for_tiling,
        _q_tile,
        fused_attention_packed,
    )

    b, s, h, d = 2, 577, 2, 64  # pads to 592 -> two 296-row tiles
    w = h * d
    assert _pad_for_tiling(s) // _q_tile(_pad_for_tiling(s)) > 1
    qkv = jnp.asarray(rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32))
    kw = dict(heads=h, scale=0.125, s_real=s, interpret=True)
    assert jnp.array_equal(
        fused_attention_packed(qkv, pipeline=False, **kw),
        fused_attention_packed(qkv, pipeline=True, **kw),
    )
    pq, ps = fused_attention_packed(qkv, quant_out=True, pipeline=False, **kw)
    bq, bs = fused_attention_packed(qkv, quant_out=True, pipeline=True, **kw)
    assert jnp.array_equal(pq, bq) and jnp.array_equal(ps, bs)
