"""Modified-ResNet tower parity: our JAX RN forward + weight conversion vs a
from-spec torch mirror of CLIP's ModifiedResNet.

The reference reaches RN towers through open_clip's generic dispatch
(utils/embedder.py:58-63, e.g. 'RN50/openai'). open_clip is not installed here
(zero egress), so the mirror below re-implements the architecture exactly as
OpenAI CLIP / open_clip define it — 3-conv stem + avgpool, anti-aliased
bottlenecks (avgpool-then-conv at every stride-2 site, incl. the shortcut),
and an AttentionPool2d readout driven through torch's own
``F.multi_head_attention_forward`` so the attention math is authoritative —
with state-dict keys matching open_clip's ``visual.*`` layout (downsample
Sequential keyed "-1"/"0"/"1" so the conv lands at ``downsample.0``).
BatchNorm running stats are randomized so the inference-time BN fold in
clip_weights.convert_rn_visual is actually exercised.
"""
import os
from collections import OrderedDict

import numpy as np
import pytest

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.resnet import (
    RN_TEST_TINY,
    RNConfig,
    rn_encode_image,
)
from clip_assisted_data_labeling_tpu.models.vit import resolve_config

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride > 1 or inplanes != planes * self.expansion:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride)),
                ("0", nn.Conv2d(inplanes, planes * self.expansion, 1,
                                stride=1, bias=False)),
                ("1", nn.BatchNorm2d(planes * self.expansion)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :].to(x.dtype)
        x, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None,
            add_zero_attn=False,
            dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False,
            need_weights=False,
        )
        return x.squeeze(0)


class ModifiedResNet(nn.Module):
    def __init__(self, layers, output_dim, heads, image_size, width):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU()
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = AttentionPool2d(
            image_size // 32, width * 32, heads, output_dim
        )

    def _make_layer(self, planes, blocks, stride=1):
        layers = [Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


def make_mirror(cfg: RNConfig, seed: int = 0) -> nn.Module:
    torch.manual_seed(seed)
    model = ModifiedResNet(
        layers=list(cfg.layers), output_dim=cfg.embed_dim, heads=cfg.heads,
        image_size=cfg.image_size, width=cfg.width,
    ).eval()
    # randomize BN running stats so the fold is non-trivial (fresh modules
    # carry mean=0/var=1, which would make a broken fold look correct)
    gen = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
    return model


def _parity(cfg: RNConfig, batch: int, rng, prefix: str = "visual."):
    model = make_mirror(cfg)
    sd = {prefix + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)

    x = rng.normal(0, 1, (batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    out = np.asarray(
        rn_encode_image(params, jnp.asarray(x), cfg, compute_dtype=jnp.float32)
    )
    cos = np.sum(out * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_rn_tiny_matches_torch(rng):
    """Tiny geometry (every stage, stride-1 AND stride-2 downsample paths)."""
    _parity(RN_TEST_TINY, batch=3, rng=rng)


def test_rn50_matches_torch(rng):
    """Full RN50 geometry — the reference README's cheapest real RN name."""
    _parity(resolve_config("RN50/openai"), batch=1, rng=rng)


def test_rn_unprefixed_state_dict(rng):
    """Bare (no 'visual.') RN state dicts convert identically."""
    _parity(RN_TEST_TINY, batch=2, rng=rng, prefix="")


def test_rn_bf16_within_parity_budget(rng):
    """bf16 compute stays within the 1e-3 cosine budget of the f32 path
    (BASELINE.md budget, same bar as the ViT tower)."""
    cfg = RN_TEST_TINY
    model = make_mirror(cfg)
    sd = {"visual." + k: v for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(sd, cfg)
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32))
    f32 = np.asarray(rn_encode_image(params, x, cfg, compute_dtype=jnp.float32))
    bf16 = np.asarray(rn_encode_image(params, x, cfg, compute_dtype=jnp.bfloat16))
    cos = np.sum(f32 * bf16, axis=-1)
    assert np.all(1.0 - cos < 1e-3), f"bf16 cosine error {1 - cos}"


def test_rn_registry():
    for name, dim, res in (("RN50", 1024, 224), ("RN101", 512, 224),
                           ("RN50x4", 640, 288), ("RN50x16", 768, 384),
                           ("RN50x64", 1024, 448)):
        cfg = resolve_config(f"{name}/openai")
        assert isinstance(cfg, RNConfig)
        assert cfg.embed_dim == dim and cfg.image_size == res
        assert cfg.patch_size is None


def test_rn_encoder_wrapper(rng, caplog):
    """CLIPImageEncoder dispatches RN names end-to-end: random-init encode,
    the fused embed_crops path, and the int8→bf16 downgrade guard."""
    import logging

    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.ops.crops import make_crop_params

    enc = CLIPImageEncoder("RN-Test/openai", compute_dtype=jnp.float32)
    assert enc.img_resolution == 64 and enc.embed_dim == 16
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    emb = np.asarray(enc.encode(jnp.asarray(x)))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    # fused crop path: centered uint8 canvases → [B, n_crops, D]
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

    # dynamic int8 has no RN formulation — downgrades with a warning
    with caplog.at_level(logging.WARNING):
        enc8 = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8")
    assert not enc8.quantized and not enc8.static_quant
    assert any("no dynamic-int8 formulation" in r.message
               for r in caplog.records)

    # int8_static auto-resolves OFF for the tiny geometry (measured gate,
    # resnet.rn_int8_static_enabled) — runs bf16 without the warning
    encs = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8_static")
    assert not encs.quantized and not encs.static_quant


def test_rn_int8_auto_gate():
    """The per-model W8A8 auto default enables the 1x1-matmul path exactly
    where it measured a win on chip (wide x-scale towers)."""
    from clip_assisted_data_labeling_tpu.models.resnet import (
        rn_int8_static_enabled,
    )

    assert rn_int8_static_enabled(resolve_config("RN50x16/openai"))
    assert rn_int8_static_enabled(resolve_config("RN50x64/openai"))
    assert not rn_int8_static_enabled(resolve_config("RN50/openai"))
    assert not rn_int8_static_enabled(resolve_config("RN-Test/openai"))


def test_rn_int8_static_within_budget(rng, monkeypatch):
    """RN int8_static (W8A8 1x1 bottleneck matmuls, models/resnet.py):
    first-batch calibration attaches per-block [2] site amaxes and the
    static-path embeddings track f32 within the fast-mode cosine budget.
    (Knob forced ON: auto resolves off for the tiny test geometry.)"""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.ops import knobs

    monkeypatch.setattr(knobs, "RN_INT8", "on")

    x = rng.normal(0, 0.7, (2, 64, 64, 3)).astype(np.float32)

    ref = np.asarray(
        CLIPImageEncoder("RN-Test/openai", compute_dtype=jnp.float32)
        .encode(jnp.asarray(x)))

    enc8 = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8_static")
    assert enc8.quantized and enc8.static_quant
    assert "s0b0_conv1_scale" in enc8.params
    got = np.asarray(enc8.encode(jnp.asarray(x)))
    assert enc8._calibrated()
    assert enc8.params["s0b0_act_amax"].shape == (2,)
    cos = np.sum(ref * got, axis=-1)
    assert np.all(cos > 0.995), cos.min()

    # second encode takes the fully-static path with identical results
    again = np.asarray(enc8.encode(jnp.asarray(x)))
    np.testing.assert_array_equal(got, again)


def test_rn_int8_static_conv_form(rng, monkeypatch):
    """The NHWC int8-conv formulation (CTPU_RN_INT8_CONV=1) matches f32
    within the same budget as the matmul form. Batch 3 so the jit cache
    can't serve a trace recorded under the other knob value."""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.ops import knobs

    monkeypatch.setattr(knobs, "RN_INT8", "on")
    monkeypatch.setattr(knobs, "RN_INT8_CONV", True)

    x = rng.normal(0, 0.7, (3, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(
        CLIPImageEncoder("RN-Test/openai", compute_dtype=jnp.float32)
        .encode(jnp.asarray(x)))
    enc8 = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8_static")
    got = np.asarray(enc8.encode(jnp.asarray(x)))
    cos = np.sum(ref * got, axis=-1)
    assert np.all(cos > 0.995), cos.min()


def test_rn_int8_min_mid_gate(monkeypatch):
    """CTPU_RN_INT8_MIN_MID skips quantizing blocks below the width floor —
    per-block fallback by key presence, wide blocks still quantized."""
    import jax

    from clip_assisted_data_labeling_tpu.models.resnet import (
        init_rn_params,
        is_rn_quantized,
        quantize_rn_params,
    )

    cfg = resolve_config("RN-Test/openai")  # mids 8, 16, 32, 64
    params = init_rn_params(cfg, jax.random.key(0))
    part = quantize_rn_params(params, min_mid=32)
    assert is_rn_quantized(part)
    assert "s0b0_conv1_scale" not in part  # mid 8 < 32: stays float
    assert "s2b0_conv1_scale" in part and "s3b0_conv3_scale" in part
    assert part["s0b0_conv1"].shape == params["s0b0_conv1"].shape  # untouched


def test_rn_int8_static_calibration_roundtrip(rng, tmp_path, monkeypatch):
    """RN calibration persistence: per-block scales save to npz with
    provenance, reload on a fresh encoder (no recalibration forward), and a
    wrong-model file is rejected."""
    from clip_assisted_data_labeling_tpu.models.encoders import (
        CLIPImageEncoder,
        check_calibration,
        load_calibration,
    )
    from clip_assisted_data_labeling_tpu.ops import knobs

    monkeypatch.setattr(knobs, "RN_INT8", "on")

    calib = str(tmp_path / "rn.calib.npz")
    x = rng.normal(0, 0.7, (2, 64, 64, 3)).astype(np.float32)

    enc = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8_static",
                           calibration_path=calib)
    first = np.asarray(enc.encode(jnp.asarray(x)))
    assert os.path.exists(calib)

    # a fresh encoder reloads the persisted scales — identical embeddings
    enc2 = CLIPImageEncoder("RN-Test/openai", compute_dtype="int8_static",
                            calibration_path=calib)
    np.testing.assert_array_equal(
        first, np.asarray(enc2.encode(jnp.asarray(x))))

    # wrong-model rejection: the RN shape check catches a ViT file's keys
    amax = load_calibration(calib)
    with pytest.raises(ValueError, match="calibrated for"):
        check_calibration(amax, resolve_config("RN50/openai"), calib,
                          "RN50/openai")
