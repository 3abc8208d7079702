"""SimpleFC regressor: torch parity, checkpoint round-trip, reference-pickle interop."""
import os
import sys
import types

import numpy as np
import pytest

import jax

from clip_assisted_data_labeling_tpu.models.regressor import (
    RegressorMeta,
    SimpleFCRegressor,
    regressor_apply,
)

torch = pytest.importorskip("torch")

REFERENCE_CKPT = "/root/reference/models/single_crop_regression_9.4k_imgs_80_epochs.pth"


def build_torch_simplefc(input_size, hidden_sizes, dropout=0.5):
    """A torch model with the reference's layer layout, built from its spec
    (utils/nn_model.py:6-41), used both as parity golden and as pickle source."""
    sizes = [input_size, *hidden_sizes, 1]
    layers = []
    for i in range(len(sizes) - 1):
        layers.append(torch.nn.Linear(sizes[i], sizes[i + 1]))
        if i < len(sizes) - 2:
            layers.append(torch.nn.LeakyReLU())
            layers.append(torch.nn.Dropout(p=dropout))
    layers.append(torch.nn.Sigmoid())

    class SimpleFC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.ModuleList(layers)
            self.clip_models = ["ViT-B-32/openai"]
            self.crop_names = ["centre_crop", "subcrop2_0.1"]
            self.use_img_stat_features = False
            self.data_min, self.data_max = 0.0, 1.0

        def forward(self, x):
            for layer in self.layers:
                x = layer(x)
            return x

    return SimpleFC()


def test_forward_matches_torch(rng):
    torch.manual_seed(1)
    tm = build_torch_simplefc(40, [16, 8]).eval()
    params = [
        {"kernel": l.weight.detach().numpy().T, "bias": l.bias.detach().numpy()}
        for l in tm.layers
        if isinstance(l, torch.nn.Linear)
    ]
    x = rng.normal(0, 1, (5, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    got = np.asarray(regressor_apply(params, x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_save_load_roundtrip(tmp_path, rng):
    meta = RegressorMeta(
        clip_models=("ViT-B-32/openai",),
        crop_names=("centre_crop",),
        input_size=24,
        hidden_sizes=(8,),
        data_min=1.0,
        data_max=9.0,
    )
    model = SimpleFCRegressor.create(jax.random.key(0), meta)
    x = rng.normal(0, 1, (7, 24)).astype(np.float32)
    before = model.predict(x)

    path = str(tmp_path / "reg.npz")
    model.save(path)
    loaded = SimpleFCRegressor.load(path)
    np.testing.assert_allclose(loaded.predict(x), before, atol=1e-7)
    assert loaded.meta == meta


def test_load_torch_pickle_roundtrip(tmp_path, rng):
    """Pickle a reference-layout torch module under the reference's module path
    and check our interop loader reproduces its predictions + metadata."""
    torch.manual_seed(2)
    tm = build_torch_simplefc(32, [12, 6]).eval()

    # pickle it under the class path the reference uses ('utils.nn_model.SimpleFC')
    shim_pkg = sys.modules.setdefault("utils", types.ModuleType("utils"))
    shim = types.ModuleType("utils.nn_model")
    tm.__class__.__module__ = "utils.nn_model"
    tm.__class__.__qualname__ = "SimpleFC"
    shim.SimpleFC = tm.__class__
    sys.modules["utils.nn_model"] = shim
    shim_pkg.nn_model = shim
    path = str(tmp_path / "ref_style.pth")
    torch.save(tm, path)
    # drop the real class so the loader must rely on its own shim
    del sys.modules["utils.nn_model"]
    del shim_pkg.nn_model

    model = SimpleFCRegressor.load_torch_pickle(path)
    assert model.meta.clip_models == ("ViT-B-32/openai",)
    assert model.meta.crop_names == ("centre_crop", "subcrop2_0.1")

    x = rng.normal(0, 1, (4, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()[:, 0]
    np.testing.assert_allclose(model.predict(x), ref, atol=1e-6)


def test_save_torch_pickle_roundtrip(tmp_path, rng):
    """save_torch_pickle emits a reference-layout module pickle under the
    'utils.nn_model.SimpleFC' class path: our own interop loader reads it back
    with identical scores + metadata, and torch executes the module directly
    with matching outputs (structure check: Linear/LeakyReLU/Dropout/Sigmoid
    stack per utils/nn_model.py:6-41)."""
    meta = RegressorMeta(
        clip_models=("ViT-Test/tiny",),
        crop_names=("centre_crop", "subcrop2_0.1"),
        input_size=20,
        hidden_sizes=(10, 4),
        dropout_prob=0.25,
        data_min=0.1,
        data_max=0.9,
    )
    model = SimpleFCRegressor.create(jax.random.key(3), meta)
    x = rng.normal(0, 1, (6, 20)).astype(np.float32)
    want = model.predict(x)

    path = str(tmp_path / "export.pth")
    model.save_torch_pickle(path)

    back = SimpleFCRegressor.load_torch_pickle(path)
    np.testing.assert_allclose(back.predict(x), want, atol=1e-6)
    assert back.meta.clip_models == meta.clip_models
    assert back.meta.crop_names == meta.crop_names
    assert (back.meta.data_min, back.meta.data_max) == (0.1, 0.9)

    tm = torch.load(path, map_location="cpu", weights_only=False).eval()
    kinds = [type(m).__name__ for m in tm.layers]
    assert kinds == ["Linear", "LeakyReLU", "Dropout", "Linear", "LeakyReLU",
                     "Dropout", "Linear", "Sigmoid"]
    with torch.no_grad():
        got = tm(torch.tensor(x)).numpy()[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REFERENCE_CKPT), reason="reference ckpt absent")
def test_load_shipped_reference_checkpoint(rng):
    """Load the actual artifact shipped with the reference repo."""
    model = SimpleFCRegressor.load_torch_pickle(REFERENCE_CKPT)
    assert model.meta.input_size > 0
    x = rng.normal(0, 0.1, (3, model.meta.input_size)).astype(np.float32)
    scores = model.predict(x)
    assert scores.shape == (3,)
    assert np.all((scores >= 0) & (scores <= 1))


def test_predict_fp16_wire(rng):
    """The default fp16 H2D wire (transfer-bound stage, BENCH_NOTES) stays
    within 2e-3 of the exact f32 wire, and a batch holding a value outside
    fp16 range silently falls back to the exact wire."""
    meta = RegressorMeta(
        clip_models=("ViT-B-32/openai",),
        crop_names=("centre_crop",),
        input_size=24,
        hidden_sizes=(8,),
        data_min=0.0,
        data_max=1.0,
    )
    model = SimpleFCRegressor.create(jax.random.key(3), meta)
    x = rng.normal(0, 1, (64, 24)).astype(np.float32)
    exact = model.predict(x, wire="float32")
    fast = model.predict(x, wire="float16")
    np.testing.assert_allclose(fast, exact, atol=2e-3)
    assert not np.array_equal(fast, exact)  # the fp16 wire really engaged

    # img_stat-style huge value (e.g. a 70k-px width) -> f32 fallback, exact
    x[0, 0] = 7.0e4
    np.testing.assert_array_equal(
        model.predict(x, wire="float16"), model.predict(x, wire="float32")
    )


def test_describe_network_layout():
    """--print_network_layout parity: the layout listing mirrors the reference's
    verbose SimpleFC module print (utils/nn_model.py:35-36, _4_train_model.py:261)."""
    meta = RegressorMeta(
        clip_models=("ViT-L-14/openai",),
        crop_names=("centre_crop", "subcrop2_0.1"),
        input_size=1536,
        hidden_sizes=(264, 128, 64),
        dropout_prob=0.5,
    )
    text = SimpleFCRegressor.create(jax.random.key(0), meta).describe()
    assert text.count("Linear(") == 4
    assert text.count("LeakyReLU(") == 3 and text.count("Dropout(p=0.5)") == 3
    assert "Sigmoid()" in text
    # 1536*264+264 + 264*128+128 + 128*64+64 + 64*1+1
    assert "448,009" in text


def test_predict_int8_wire(rng):
    """The opt-in int8 H2D wire (per-row symmetric quantization — another
    ~2x on the transfer-bound stage) stays within 1e-2 of the exact f32
    wire on CLIP-feature-scale inputs, and a batch holding non-finite
    values falls back to the exact wire."""
    meta = RegressorMeta(
        clip_models=("ViT-B-32/openai",),
        crop_names=("centre_crop",),
        input_size=24,
        hidden_sizes=(8,),
        data_min=0.0,
        data_max=1.0,
    )
    model = SimpleFCRegressor.create(jax.random.key(3), meta)
    x = rng.normal(0, 1, (64, 24)).astype(np.float32)
    exact = model.predict(x, wire="float32")
    fast = model.predict(x, wire="int8")
    np.testing.assert_allclose(fast, exact, atol=1e-2)
    assert not np.array_equal(fast, exact)  # the int8 wire really engaged
    # typical drift is ~1e-3 in score space; 1e-2 is the hard ceiling
    assert np.abs(fast - exact).mean() < 2e-3

    x[0, 0] = np.nan
    nan_scores = model.predict(x, wire="int8")
    ref_scores = model.predict(x, wire="float32")
    np.testing.assert_array_equal(nan_scores[1:], ref_scores[1:])

    # all-zero rows must not divide by zero
    z = np.zeros((4, 24), np.float32)
    np.testing.assert_allclose(
        model.predict(z, wire="int8"), model.predict(z, wire="float32"),
        atol=1e-6)
