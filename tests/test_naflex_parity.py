"""SigLIP2 naflex (variable-aspect) parity vs the canonical HF implementation.

The reference reaches naflex checkpoints through the same generic encoder
dispatch as every other model name (utils/embedder.py:58-63); transformers'
``Siglip2VisionModel`` is the authoritative torch implementation, locally
instantiated with random weights (zero egress). Covers: the aspect-preserving
grid solver (bit-equal to HF's binary search), the antialiased positional
interpolation (vs ``F.interpolate``), full tower parity at multiple aspect
ratios with ragged padding, and the square-path equivalence that lets the
labeling pipeline run naflex towers on the standard fused path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.models.clip_weights import (
    convert_torch_state_dict,
)
from clip_assisted_data_labeling_tpu.models.naflex import (
    build_pos_weights,
    naflex_encode,
    pos_resize_weights,
    target_grid,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    resolve_config,
    vit_encode_image,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = resolve_config("SigLIP2-Naflex-Test/tiny")  # 4x4 grid, patch 8, w 64


def make_hf_model():
    cfg = transformers.Siglip2VisionConfig(
        hidden_size=CFG.width,
        intermediate_size=CFG.mlp_dim,
        num_hidden_layers=CFG.layers,
        num_attention_heads=CFG.heads,
        patch_size=CFG.patch_size,
        num_patches=CFG.grid * CFG.grid,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    return transformers.Siglip2VisionModel(cfg).eval()


def test_target_grid_matches_hf():
    """Our binary-search grid solver must agree with HF's
    get_image_size_for_max_num_patches for every size it will ever see."""
    from transformers.models.siglip2.image_processing_siglip2 import (
        get_image_size_for_max_num_patches,
    )

    rng = np.random.default_rng(0)
    for _ in range(200):
        h = int(rng.integers(8, 3000))
        w = int(rng.integers(8, 3000))
        patch = int(rng.choice([8, 14, 16]))
        maxp = int(rng.choice([16, 64, 256, 1024]))
        th, tw = get_image_size_for_max_num_patches(h, w, patch, maxp)
        gh, gw = target_grid(h, w, patch, maxp)
        assert (gh, gw) == (th // patch, tw // patch), (h, w, patch, maxp)


@pytest.mark.parametrize("gh,gw", [(4, 4), (2, 6), (7, 3), (1, 16), (5, 5),
                                   (2, 2), (1, 1), (16, 16), (3, 20)])
def test_pos_interpolation_matches_torch(gh, gw, rng):
    """pos_resize_weights @ table ≡ F.interpolate(..., bilinear, antialias=True)
    — both up- and down-sampling of the positional grid."""
    grid, dim = 8, 12
    table = rng.normal(0, 1, (grid, grid, dim)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.tensor(table).permute(2, 0, 1).unsqueeze(0),
            size=(gh, gw), mode="bilinear", align_corners=False,
            antialias=True,
        )
    ref = ref[0].permute(1, 2, 0).reshape(gh * gw, dim).numpy()
    w = pos_resize_weights(gh, gw, grid)
    got = w @ table.reshape(grid * grid, dim)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _patches_for(rng, gh, gw, n_max, p):
    """Random normalized patch rows for a (gh, gw) grid, zero-padded."""
    n = gh * gw
    out = np.zeros((n_max, p * p * 3), dtype=np.float32)
    out[:n] = rng.normal(0, 1, (n, p * p * 3)).astype(np.float32)
    mask = np.zeros((n_max,), dtype=np.float32)
    mask[:n] = 1.0
    return out, mask


def test_naflex_matches_hf_multi_aspect(rng):
    """Full-tower parity at four aspect ratios in ONE ragged batch — the
    padding/masking path is exercised exactly as HF does it."""
    model = make_hf_model()
    params = convert_torch_state_dict(model.state_dict(), CFG)

    n_max = CFG.seq_len  # 16
    shapes = [(4, 4), (2, 6), (3, 5), (1, 4)]
    batch = [_patches_for(rng, gh, gw, n_max, CFG.patch_size)
             for gh, gw in shapes]
    patches = np.stack([b[0] for b in batch])
    masks = np.stack([b[1] for b in batch])

    with torch.no_grad():
        out = model(
            pixel_values=torch.tensor(patches),
            pixel_attention_mask=torch.tensor(masks, dtype=torch.long),
            spatial_shapes=torch.tensor(shapes, dtype=torch.long),
        )
    ref = out.pooler_output.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    pos_w = build_pos_weights(shapes, n_max, CFG.grid)
    got = np.asarray(naflex_encode(
        params, jnp.asarray(patches), jnp.asarray(pos_w), jnp.asarray(masks),
        CFG, compute_dtype=jnp.float32,
    ))
    cos = np.sum(got * ref, axis=-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine error {1 - cos}"
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_square_path_equals_fused_path(rng):
    """A full-grid (zero-padding) naflex forward must equal the standard
    vit_encode_image on the same pixels — this is what lets the 4-square-crop
    pipeline run naflex towers on the fused-kernel path with the pos table
    used verbatim (identity interpolation)."""
    import jax

    from clip_assisted_data_labeling_tpu.models.vit import (
        init_vit_params,
        patchify,
    )

    params = init_vit_params(CFG, jax.random.key(5))
    x = rng.normal(0, 1, (3, CFG.image_size, CFG.image_size, 3)).astype(np.float32)

    a = np.asarray(vit_encode_image(params, jnp.asarray(x), CFG,
                                    compute_dtype=jnp.float32))

    n_max = CFG.seq_len
    patches = np.asarray(patchify(jnp.asarray(x), CFG.patch_size))
    masks = np.ones((3, n_max), dtype=np.float32)
    pos_w = build_pos_weights([(CFG.grid, CFG.grid)] * 3, n_max, CFG.grid)
    np.testing.assert_allclose(
        pos_w[0], np.eye(n_max, dtype=np.float32), atol=1e-6,
    )  # identity interpolation on the native grid
    b = np.asarray(naflex_encode(
        params, jnp.asarray(patches), jnp.asarray(pos_w), jnp.asarray(masks),
        CFG, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_naflex_name_resolution():
    cfg = resolve_config("ViT-B-16-SigLIP2-naflex/webli")
    assert cfg.naflex and cfg.image_size == 256 and cfg.patch_size == 16
    assert cfg.seq_len == 256 and cfg.width == 768
    cfg = resolve_config("ViT-SO400M-16-SigLIP2-naflex/webli")
    assert cfg.naflex and cfg.width == 1152 and cfg.mlp_dim == 4304
    assert not resolve_config("ViT-B-16-SigLIP2-384/webli").naflex


def test_encoder_wrapper_variable(rng):
    """CLIPImageEncoder.encode_variable: uint8 images of different aspect
    ratios → unit embeddings; quantized/non-naflex guards raise."""
    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder

    enc = CLIPImageEncoder("SigLIP2-Naflex-Test/tiny", compute_dtype=jnp.float32)
    imgs = [rng.integers(0, 255, (60, 200, 3), dtype=np.uint8),
            rng.integers(0, 255, (100, 40, 3), dtype=np.uint8)]
    emb = np.asarray(enc.encode_variable(imgs))
    assert emb.shape == (2, CFG.width)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    with pytest.raises(ValueError, match="not a naflex"):
        CLIPImageEncoder("SigLIP-Test/tiny",
                         compute_dtype=jnp.float32).encode_variable(imgs)
    q = CLIPImageEncoder("SigLIP2-Naflex-Test/tiny", compute_dtype="int8")
    with pytest.raises(ValueError, match="int8"):
        q.encode_variable(imgs)
