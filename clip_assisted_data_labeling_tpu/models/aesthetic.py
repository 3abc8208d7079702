"""Standalone single-image aesthetic scorer.

Equivalent of the reference's AestheticRegressor (utils/embedder.py:277-311): a
trained FC regressor plus the CLIP encoders it was trained with, applied to one
image at a time. Fixes the reference's broken path at embedder.py:303-305 (it
passed raw PIL crops to encode_image, which expects preprocessed tensors) — here
the crops go through the same fused preprocess as the batch pipeline.
"""
from __future__ import annotations

import numpy as np

from clip_assisted_data_labeling_tpu.models.encoders import create_encoder
from clip_assisted_data_labeling_tpu.models.regressor import SimpleFCRegressor
from clip_assisted_data_labeling_tpu.ops.crops import make_crop_params
from clip_assisted_data_labeling_tpu.store.sidecar import resolve_crop_key


class AestheticRegressor:
    def __init__(self, model_path: str, model_weights_dir: str | None = None,
                 canvas_size: int = 1024, verbose: int = 1):
        if model_path.endswith(".npz"):
            self.model = SimpleFCRegressor.load(model_path)
        else:
            self.model = SimpleFCRegressor.load_torch_pickle(model_path)
        if verbose:
            print("Loaded regression model")
            print("Trained on embeddings from CLIP models:", list(self.model.meta.clip_models))
            print("Used crops:", list(self.model.meta.crop_names))
        self.encoders = [
            create_encoder(name, model_path=model_weights_dir)
            for name in self.model.meta.clip_models
        ]
        self.canvas_size = canvas_size

    def predict_score(self, pil_img) -> tuple[float, np.ndarray]:
        """(score, features) for one PIL image."""
        from clip_assisted_data_labeling_tpu.config import ALL_CROPS

        img = np.asarray(pil_img.convert("RGB"))
        h, w = img.shape[:2]
        if max(h, w) > self.canvas_size:
            import cv2

            scale = self.canvas_size / max(h, w)
            img = cv2.resize(
                img, (max(1, int(w * scale)), max(1, int(h * scale))),
                interpolation=cv2.INTER_AREA,
            )
            h, w = img.shape[:2]
        C = self.canvas_size
        canvas = np.zeros((1, C, C, 3), np.uint8)
        oy, ox = (C - h) // 2, (C - w) // 2
        canvas[0, oy : oy + h, ox : ox + w] = img

        img_stats = None
        if self.model.meta.use_img_stat_features:
            from clip_assisted_data_labeling_tpu.ops.image_stats import (
                image_stats_batch,
                make_stat_params,
            )

            img_stats = np.asarray(
                image_stats_batch(canvas, make_stat_params(w, h, C)[None])
            )[0]

        parts = []
        for encoder in self.encoders:
            params = make_crop_params(w, h, C, encoder.img_resolution, ALL_CROPS)[None]
            emb = np.asarray(encoder.embed_crops(canvas, params))[0]  # [4, D]
            by_name = dict(zip(ALL_CROPS, emb))
            for crop in self.model.meta.crop_names:
                key = resolve_crop_key(by_name, crop)
                if key is None:
                    raise KeyError(f"crop {crop} unavailable")
                parts.append(by_name[key])
            if img_stats is not None:  # appended per model (reference _4:61-64)
                parts.append(img_stats)
        features = np.concatenate(parts, axis=0)[None]
        score = float(self.model.predict(features)[0])
        return score, features
