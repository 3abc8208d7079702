"""Classification head (--classification): the reference README's own TODO
("class labels + classification", README.md:104) implemented natively.

Distinct label values become softmax classes; training minimizes
cross-entropy; predictions are softmax-EXPECTED label values, so the CSV
contract (predicted_label: float in label units) and every downstream
consumer (sorting, subset gates, preview copies) work unchanged."""
import numpy as np
import pytest

import jax

from clip_assisted_data_labeling_tpu.config import TrainConfig
from clip_assisted_data_labeling_tpu.models.regressor import SimpleFCRegressor
from clip_assisted_data_labeling_tpu.pipeline.train import train_regressor


def _separable_data(rng, n=240, f=24, classes=(0.0, 0.5, 0.9)):
    """Features whose first components linearly encode the class."""
    y = np.asarray(classes)[rng.integers(0, len(classes), n)].astype(np.float32)
    x = rng.normal(0, 0.3, (n, f)).astype(np.float32)
    for i, c in enumerate(classes):
        x[:, i] += np.where(y == c, 3.0, 0.0)
    return x, y


def _train(rng, **kw):
    x, y = _separable_data(rng)
    base = dict(
        classification=True, n_epochs=60, batch_size=16, hidden_sizes=(16,),
        dropout_prob=0.0, test_fraction=0.25, crop_names=("centre_crop",),
        lr=3e-3, restart_epochs=60, weight_decay=1e-5,
    )
    base.update(kw)
    cfg = TrainConfig(**base)
    return train_regressor(x, y, cfg, ["ViT-Test/tiny"], verbose=False), (x, y)


def test_classification_learns(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)  # plots land here
    (model, history), (x, y) = _train(rng)
    np.testing.assert_allclose(model.meta.class_values, (0.0, 0.5, 0.9),
                               atol=1e-6)
    assert model.meta.output_size == 3
    # expected-value scores land in label units near the true class
    scores = model.predict(x)
    assert scores.shape == (len(x),)
    assert np.mean(np.abs(scores - y) < 0.2) > 0.9
    # argmax classes recover the labels on separable data
    classes = model.predict_classes(x)
    assert np.mean(classes == y) > 0.9
    # cross-entropy decreased
    assert history["train"][-1] < history["train"][0]


def test_classification_roundtrip_and_sharded(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (model, _), (x, _) = _train(rng)
    path = str(tmp_path / "clf.npz")
    model.save(path)
    loaded = SimpleFCRegressor.load(path)
    assert loaded.meta.class_values == model.meta.class_values
    np.testing.assert_array_equal(loaded.predict(x), model.predict(x))

    # data-parallel inference path computes the same expected values
    from clip_assisted_data_labeling_tpu.parallel.mesh import get_mesh
    from clip_assisted_data_labeling_tpu.parallel.predict_sharded import (
        predict_sharded,
    )

    sharded = predict_sharded(model.params, x, get_mesh(), wire="float32",
                              class_values=model.meta.class_values)
    np.testing.assert_allclose(sharded, model.predict(x), atol=1e-6)


def test_classification_guards(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (model, _), _ = _train(rng)
    # torch export is regression-only: the reference's SimpleFC would
    # silently misread a C-logit head
    with pytest.raises(ValueError, match="regression-only"):
        model.save_torch_pickle(str(tmp_path / "clf.pth"))
    # a regression model refuses predict_classes
    reg = SimpleFCRegressor.create(
        jax.random.key(0),
        type(model.meta)(clip_models=("m",), crop_names=("c",),
                         input_size=4, hidden_sizes=(4,)),
    )
    with pytest.raises(ValueError, match="classification"):
        reg.predict_classes(np.zeros((2, 4), np.float32))
    # single-class labels are a config error, not a degenerate softmax
    cfg = TrainConfig(classification=True, n_epochs=2, hidden_sizes=(4,),
                      crop_names=("centre_crop",))
    with pytest.raises(ValueError, match="distinct label values"):
        train_regressor(np.zeros((8, 4), np.float32),
                        np.full(8, 0.5, np.float32), cfg, ["m"], verbose=False)


def test_linear_model_no_hidden_layers(tmp_path, rng, monkeypatch):
    """`--hidden_sizes` with no values trains a pure linear(-logistic) model
    (the reference README TODO's 'more linear component', README.md:103) —
    both heads: logistic regression and linear softmax classification."""
    monkeypatch.chdir(tmp_path)
    x, y = _separable_data(rng)
    reg_cfg = TrainConfig(n_epochs=20, batch_size=16, hidden_sizes=(),
                          dropout_prob=0.0, test_fraction=0.25, lr=3e-3,
                          restart_epochs=20, crop_names=("centre_crop",))
    model, history = train_regressor(x, y, reg_cfg, ["m"], verbose=False)
    assert len(model.params) == 1  # input -> 1, no hidden layers
    assert history["train"][-1] < history["train"][0]

    (clf, _), (x, y) = _train(rng, hidden_sizes=())
    assert len(clf.params) == 1 and clf.meta.output_size == 3
    assert np.mean(clf.predict_classes(x) == y) > 0.9  # linearly separable


def test_classification_cli_e2e(tmp_path, rng, monkeypatch):
    """Stage 4+5 drive: --classification trains from a real store/CSV and the
    predict stage writes expected-value labels into the database."""
    from PIL import Image

    from clip_assisted_data_labeling_tpu.pipeline import embed as embed_cli
    from clip_assisted_data_labeling_tpu.pipeline import predict as predict_cli
    from clip_assisted_data_labeling_tpu.pipeline import train as train_cli
    from clip_assisted_data_labeling_tpu.store.database import LabelDatabase

    root = tmp_path / "data"
    root.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (64 + 4 * i, 80, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.jpg")
    embed_cli.main([
        "--root_dir", str(root), "--models_to_use", "ViT-Test/tiny",
        "--batch_size", "4", "--canvas_size", "64",
        "--compute_dtype", "float32",
    ])
    db = LabelDatabase.load_or_create(str(root))
    for i in range(8):
        db.relabel(f"img_{i}", 0.2 if i % 2 else 0.8)
    db.save()

    monkeypatch.chdir(tmp_path)  # models/ + plots land here
    train_cli.main([
        "--train_data_dir", str(tmp_path), "--train_data_names", "data",
        "--classification", "--n_epochs", "4", "--batch_size", "4",
        "--hidden_sizes", "8", "--crop_names", "centre_crop",
        "--model_name", "clf", "--test_fraction", "0.25",
    ])
    predict_cli.main(["--root_dir", str(root), "--model_file", "clf"])
    df = LabelDatabase.load_or_create(str(root)).df
    preds = df["predicted_label"].astype(float).values
    assert np.isfinite(preds).all()
    assert (preds >= 0.2 - 1e-6).all() and (preds <= 0.8 + 1e-6).all(), preds
