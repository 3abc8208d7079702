"""Real-weight validation runbook (VERDICT r2 #6).

Every parity number in this repo rests on locally-instantiated torch modules
(zero-egress build environment). The day a REAL checkpoint lands on disk
(OpenAI/open_clip CLIP or Meta PE — the files the reference downloads in
utils/embedder.py:61-63), run:

    scripts/validate_real_weights.sh <checkpoint-or-dir> <model-name> [imgdir]

and it will, in one command:
  1. convert the checkpoint (models/clip_weights.py) and embed golden images,
  2. if the checkpoint is HF CLIPVision format, run the SAME images through
     the torch module and report f32 conversion parity (open_clip/PE formats
     have no local torch executor under zero egress — conversion is validated
     structurally and through the quantization ladder instead),
  3. re-measure the quantized modes against the f32 path on these weights:
     bf16, dynamic int8, int8_static (calibrated on a DIFFERENT batch than it
     is scored on), against the ≤1e-3 embedding-parity budget (BASELINE.md),
  4. audit the int8_static calibration margin: per-site activation amax of a
     held-out batch vs calibrated·margin — any ratio > 1 means clipping, the
     known risk on real towers with heavy activation outliers (ROADMAP.md).

Exit code is non-zero when a gate fails. Golden images come from ``imgdir``
(real photos preferred) or a deterministic synthetic batch.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")

PARITY_BUDGET = 1e-3  # BASELINE.md: cosine error vs the reference encoder


def load_goldens(imgdir: str | None, cfg, n: int = 16) -> np.ndarray:
    """[n, R, R, 3] model-normalized f32 golden batch (two halves: calibration
    and scoring use DIFFERENT images). Normalization constants come from the
    model config (CLIP/PE: OpenAI constants; SigLIP: 0.5/0.5)."""
    resolution = cfg.image_size
    if imgdir:
        from PIL import Image

        paths = sorted(
            p for ext in ("jpg", "jpeg", "png", "webp")
            for p in glob.glob(os.path.join(imgdir, f"*.{ext}"))
        )[:n]
        if len(paths) < 4:
            raise SystemExit(f"need >=4 images in {imgdir}, found {len(paths)}")
        imgs = []
        for p in paths:
            img = Image.open(p).convert("RGB")
            side = min(img.size)
            x0 = (img.size[0] - side) // 2
            y0 = (img.size[1] - side) // 2
            img = img.crop((x0, y0, x0 + side, y0 + side)).resize(
                (resolution, resolution), Image.BICUBIC)  # reference preprocess
            imgs.append(np.asarray(img, np.float32) / 255.0)
        batch = np.stack(imgs)
    else:
        print("[goldens] no --images dir: deterministic synthetic batch "
              "(fine for relative parity; real photos are better)")
        rng = np.random.default_rng(0)
        batch = rng.uniform(0, 1, (n, resolution, resolution, 3)).astype(np.float32)
    return ((batch - np.asarray(cfg.norm_mean)) / np.asarray(cfg.norm_std)
            ).astype(np.float32)


def cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return np.sum(a * b, axis=-1)


def torch_parity_hf(checkpoint_path: str, cfg, goldens: np.ndarray,
                    ours_f32: np.ndarray) -> bool:
    """HF-format checkpoints: run the torch module on the same goldens."""
    import torch
    import transformers

    import pickle

    try:
        obj = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError) as e:
        # TorchScript archives (the OpenAI CLIP download) and whole-module
        # pickles cannot be read with weights_only — they are by definition
        # not HF state dicts, so they take the graceful skip path below.
        # Anything else (truncated/corrupt file, OOM) must still FAIL loudly
        # rather than silently skipping the strongest parity gate — and a
        # corrupt checkpoint would already have failed the conversion step
        # before reaching this function.
        msg = str(e)
        known_format = isinstance(e, pickle.UnpicklingError) or any(
            s in msg for s in ("TorchScript", "torch.jit.load", "weights_only")
        )
        if not known_format:
            raise
        print(f"[torch-parity] checkpoint is not a plain state dict ({e}) — "
              "skipping the HF torch executor (open_clip/PE formats validate "
              "through the quantization ladder)")
        return True
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    if not any(k.startswith("vision_model.") for k in sd):
        print("[torch-parity] not an HF CLIPVision/SigLIP state dict — skipping "
              "the torch executor (open_clip/PE formats validate through the "
              "quantization ladder; conversion itself is structurally checked "
              "in tests/test_vit_parity.py / test_pe_parity.py)")
        return True
    if any(k.endswith("head.probe") for k in sd):  # HF SiglipVisionModel
        hf_cfg = transformers.SiglipVisionConfig(
            hidden_size=cfg.width, intermediate_size=cfg.mlp_dim,
            num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
            patch_size=cfg.patch_size, image_size=cfg.image_size,
            hidden_act="gelu_pytorch_tanh", layer_norm_eps=cfg.ln_eps,
        )
        model = transformers.SiglipVisionModel(hf_cfg).eval()
        model.load_state_dict(sd)
        with torch.no_grad():
            ref = model(pixel_values=torch.from_numpy(
                goldens.transpose(0, 3, 1, 2))).pooler_output.numpy()
    else:
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=cfg.width, intermediate_size=cfg.mlp_dim,
            num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
            patch_size=cfg.patch_size, image_size=cfg.image_size,
            projection_dim=cfg.embed_dim,
            hidden_act=("quick_gelu" if cfg.act == "quick_gelu" else "gelu"),
        )
        model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
        model.load_state_dict(sd)
        with torch.no_grad():
            ref = model(pixel_values=torch.from_numpy(
                goldens.transpose(0, 3, 1, 2))).image_embeds.numpy()
    err = 1.0 - cosine(ours_f32, ref).min()
    ok = err <= 1e-5
    print(f"[torch-parity] f32 vs HF torch: max cosine err {err:.2e} "
          f"({'OK' if ok else 'FAIL — conversion bug'})")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help=".pt/.pth/.bin/.safetensors file or a "
                    "directory containing one")
    ap.add_argument("model", help="model name, e.g. ViT-L-14-336/openai or "
                    "PE-Core-L14-336")
    ap.add_argument("--images", default=None, help="directory of golden photos")
    ap.add_argument("--margin", type=float, default=1.1,
                    help="int8_static calibration margin to audit")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI / chip busy; the env var "
                    "alone is overridden by this machine's sitecustomize)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder
    from clip_assisted_data_labeling_tpu.models.vit import (
        attach_act_amax,
        resolve_config,
        vit_act_amax,
        vit_encode_image,
    )
    from clip_assisted_data_labeling_tpu.ops.quant import quantize_vit_params

    cfg = resolve_config(args.model)
    enc = CLIPImageEncoder(args.model, model_path=args.checkpoint,
                          compute_dtype=jnp.float32)
    goldens = load_goldens(args.images, cfg)
    half = len(goldens) // 2
    calib, score = goldens[:half], goldens[half:]

    print(f"[embed] f32 forward on {len(score)} golden images")
    f32 = np.asarray(vit_encode_image(enc.params, jnp.asarray(score), cfg,
                                      compute_dtype=jnp.float32))
    ok = True
    ckpt_file = args.checkpoint
    if os.path.isdir(ckpt_file):
        cands = [f for f in sorted(os.listdir(ckpt_file))
                 if f.endswith((".pt", ".pth", ".bin"))]
        ckpt_file = os.path.join(ckpt_file, cands[0]) if cands else ckpt_file
    if os.path.isfile(ckpt_file) and not ckpt_file.endswith(".npz"):
        ok &= torch_parity_hf(ckpt_file, cfg, score, f32)

    bf16 = np.asarray(vit_encode_image(enc.params, jnp.asarray(score), cfg,
                                       compute_dtype=jnp.bfloat16))
    err_bf16 = 1.0 - cosine(f32, bf16).min()
    print(f"[quant] bf16 cosine err: {err_bf16:.2e} "
          f"({'OK' if err_bf16 <= PARITY_BUDGET else 'FAIL'})")
    ok &= err_bf16 <= PARITY_BUDGET

    qparams = quantize_vit_params(enc.params)
    dyn = np.asarray(vit_encode_image(qparams, jnp.asarray(score), cfg,
                                      compute_dtype=jnp.bfloat16))
    err_dyn = 1.0 - cosine(f32, dyn).min()
    print(f"[quant] dynamic int8 cosine err: {err_dyn:.2e} "
          f"({'OK' if err_dyn <= PARITY_BUDGET else 'FAIL'})")
    ok &= err_dyn <= PARITY_BUDGET

    amax_a = jax.tree.map(np.asarray, vit_act_amax(
        qparams, jnp.asarray(calib), cfg, compute_dtype=jnp.bfloat16))
    sparams = attach_act_amax(qparams, {"act_amax": amax_a["act_amax"]},
                              margin=args.margin)
    stat = np.asarray(vit_encode_image(sparams, jnp.asarray(score), cfg,
                                       compute_dtype=jnp.bfloat16))
    err_stat = 1.0 - cosine(f32, stat).min()
    print(f"[quant] int8_static cosine err (calib batch != score batch): "
          f"{err_stat:.2e} ({'OK' if err_stat <= PARITY_BUDGET else 'FAIL'})")
    ok &= err_stat <= PARITY_BUDGET

    # margin audit: held-out activation ranges vs calibrated*margin
    amax_b = jax.tree.map(np.asarray, vit_act_amax(
        qparams, jnp.asarray(score), cfg, compute_dtype=jnp.bfloat16))
    over = amax_b["act_amax"] / (amax_a["act_amax"] * args.margin)
    sites = ["qkv-in", "attn-out", "fc1-in", "gelu-out"]
    print(f"[margin] held-out amax / (calibrated x {args.margin}) — >1 clips:")
    for s, col in zip(sites, over.T):
        flag = " <-- CLIPPING" if col.max() > 1.0 else ""
        print(f"  {s:9s} max {col.max():.3f} (layer {int(col.argmax())}), "
              f"mean {col.mean():.3f}{flag}")
    if over.max() > 1.0:
        print("[margin] NOTE: some sites exceed the margin on held-out data; "
              "if int8_static error above is still in budget the symmetric "
              "clipping is graceful — otherwise raise --margin or recalibrate "
              "on more data (models/vit.attach_act_amax).")

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
