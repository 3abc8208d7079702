"""DP-sharded regressor inference matches the single-device predictor.

The reference predictor is single-device (_5_predict_labels.py:91-188); the
sharded program (parallel/predict_sharded.py) must reproduce it across awkward
batch shapes on the 8-device CPU mesh.
"""
import numpy as np

import jax

from clip_assisted_data_labeling_tpu.models.regressor import (
    RegressorMeta,
    SimpleFCRegressor,
)
from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh
from clip_assisted_data_labeling_tpu.parallel.predict_sharded import predict_sharded


def _model(input_size=24):
    meta = RegressorMeta(
        clip_models=("ViT-B-32/openai",),
        crop_names=("centre_crop",),
        input_size=input_size,
        hidden_sizes=(8,),
        data_min=0.0,
        data_max=1.0,
    )
    return SimpleFCRegressor.create(jax.random.key(5), meta)


def test_predict_sharded_matches_single(rng):
    model = _model()
    mesh = get_mesh()
    # 173 is deliberately not a multiple of 8: exercises the pad/slice path
    for n in (1, 8, 173):
        x = rng.normal(0, 1, (n, 24)).astype(np.float32)
        single = model.predict(x, wire="float32")
        sharded = predict_sharded(model.params, x, mesh, wire="float32")
        np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_predict_sharded_fp16_wire_and_chunking(rng):
    """fp16 wire stays within the documented 2e-3, and multi-chunk runs (chunk
    aligned to the mesh) concatenate correctly."""
    model = _model()
    mesh = get_mesh()
    x = rng.normal(0, 1, (67, 24)).astype(np.float32)
    exact = model.predict(x, wire="float32")
    got = predict_sharded(model.params, x, mesh, batch_size=16, wire="float16")
    np.testing.assert_allclose(got, exact, atol=2e-3)

    assert predict_sharded(model.params, x[:0], mesh).shape == (0,)


def test_predict_sharded_int8_wire(rng):
    """The int8 wire shards its per-row scales alongside the features and
    stays within the documented budget; padded rows (all-zero) ride the
    zero-scale guard."""
    model = _model()
    mesh = get_mesh()
    x = rng.normal(0, 1, (67, 24)).astype(np.float32)
    exact = model.predict(x, wire="float32")
    got = predict_sharded(model.params, x, mesh, batch_size=16, wire="int8")
    np.testing.assert_allclose(got, exact, atol=1e-2)
    assert np.abs(got - exact).mean() < 2e-3
