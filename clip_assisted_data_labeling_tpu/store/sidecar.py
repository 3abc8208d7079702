"""Per-image ``<uuid>.pt`` feature sidecars — the reference's on-disk contract.

Layout (written by reference _1_embed_with_CLIP.py:136-168, consumed by stages
2/4/5): a torch-pickled dict

    {model_name: {crop_name: float32 tensor [1, D], "img_stat_*": float32 scalar}}

merged incrementally per model (a second model run adds its key without touching
the first). We keep the format bit-compatible via the baked-in CPU torch so the
reference's own scripts can consume our sidecars and vice versa.

Crop-name note: the reference writes plain "subcrop1"/"subcrop2" but its trainer
looks up suffixed "subcrop1_0.15"/"subcrop2_0.1" (the SURVEY.md §7 interop trap).
We write the suffixed canonical names and ``resolve_crop_key`` accepts either.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from clip_assisted_data_labeling_tpu.config import CROP_ALIASES

_ALIASES_REVERSED = {v: k for k, v in CROP_ALIASES.items()}


def _torch():
    import torch

    return torch


def write_sidecar(
    path: str,
    model_name: str,
    crop_embeddings: Mapping[str, np.ndarray],
    img_stats: Mapping[str, float] | None = None,
    merge: bool = True,
) -> None:
    """Write/merge one model's features into a ``.pt`` sidecar."""
    torch = _torch()
    final: dict = {}
    if merge and os.path.exists(path):
        try:
            final = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            final = {}
    model_dict: dict = {}
    if img_stats:
        for k, v in img_stats.items():
            model_dict[k] = torch.tensor(float(v), dtype=torch.float32)
    for crop, emb in crop_embeddings.items():
        arr = np.asarray(emb, dtype=np.float32).reshape(1, -1)
        model_dict[crop] = torch.from_numpy(arr.copy())
    final[model_name] = model_dict
    # atomic replace: a SIGKILL mid-save must not truncate the merge BASE
    # (another model's embeddings already in this file — the interop contract)
    tmp = path + ".tmp"
    torch.save(final, tmp)
    os.replace(tmp, path)


def read_sidecar(path: str) -> dict:
    """Load a sidecar as {model: {key: np.ndarray | float}} (torch-free values)."""
    torch = _torch()
    raw = torch.load(path, map_location="cpu", weights_only=False)
    out: dict = {}
    for model, d in raw.items():
        if not isinstance(d, dict):  # legacy flat layout (_3_label_images.py:142)
            out[model] = np.asarray(d.float().numpy() if hasattr(d, "numpy") else d)
            continue
        out[model] = {
            k: (np.asarray(v.float().numpy()) if hasattr(v, "numpy") else v)
            for k, v in d.items()
        }
    return out


def has_model_key(path: str, model_name: str) -> bool:
    """Incremental re-embed skip check (reference _1_embed_with_CLIP.py:117-128)."""
    if not os.path.exists(path):
        return False
    try:
        return model_name in _torch().load(path, map_location="cpu", weights_only=False)
    except Exception:
        return False


def resolve_crop_key(feature_dict: Mapping, crop_name: str) -> str | None:
    """Find a crop key under canonical or legacy alias naming."""
    if crop_name in feature_dict:
        return crop_name
    alias = CROP_ALIASES.get(crop_name) or _ALIASES_REVERSED.get(crop_name)
    if alias is not None and alias in feature_dict:
        return alias
    return None


def assemble_features(
    sidecar: Mapping[str, Mapping],
    clip_models: list[str],
    crop_names: list[str],
    use_img_stat_features: bool = False,
) -> np.ndarray:
    """Feature-vector assembly with the reference trainer's semantics
    (_4_train_model.py:52-70): per model, concat the requested crops (raising on
    any that are missing), optionally append the img_stat_* scalars, then concat
    across models."""
    parts = []
    for model in clip_models:
        d = sidecar[model]
        crop_parts = []
        missing = []
        for crop in crop_names:
            key = resolve_crop_key(d, crop)
            if key is None:
                missing.append(crop)
            else:
                crop_parts.append(np.asarray(d[key], np.float32).reshape(-1))
        if missing:
            raise KeyError(
                f"Missing crops {missing} for model {model}; re-embed the image or "
                "adjust crop_names"
            )
        feats = np.concatenate(crop_parts, axis=0)
        if use_img_stat_features:
            stat_keys = [k for k in d.keys() if k.startswith("img_stat_")]
            stats = np.asarray([float(d[k]) for k in stat_keys], np.float32)
            feats = np.concatenate([feats, stats], axis=0)
        parts.append(feats)
    return np.concatenate(parts, axis=0)
