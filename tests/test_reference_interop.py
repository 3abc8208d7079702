"""Execution-level interop: the REFERENCE toolkit's own scripts run unchanged
against this framework's outputs (the BASELINE requirement that the CSV and
embedding formats stay compatible so stage-3/-6 equivalents interoperate).

Stages 2 and 6 of the reference depend only on torch/pandas/PIL (no open_clip),
so they can execute here directly as subprocesses.
"""
import os
import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from clip_assisted_data_labeling_tpu.config import DedupConfig, EmbedConfig
from clip_assisted_data_labeling_tpu.pipeline.dedup import run_dedup
from clip_assisted_data_labeling_tpu.pipeline.embed import embed_dataset
from clip_assisted_data_labeling_tpu.pipeline.label import label_dataset
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def our_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("interop") / "ds"
    root.mkdir()
    rng = np.random.default_rng(21)
    imgs = []
    for i in range(8):
        arr = rng.integers(0, 256, (120, 160, 3)).astype(np.uint8)
        arr[:, :80] = (35 * i) % 255
        imgs.append(arr)
        Image.fromarray(arr).save(root / f"img{i}.jpg", quality=95)
    # planted near-duplicate
    Image.fromarray(imgs[2]).save(root / "imgdup.jpg", quality=90)

    cfg = EmbedConfig(
        models_to_use=("ViT-Test/tiny",), batch_size=4, num_workers=2,
        canvas_size=256, compute_dtype="float32", shuffle_filenames=False,
    )
    embed_dataset(str(root), cfg)
    label_dataset(str(root), HeadlessBackend([str(d) for d in (7, 3, 9, 5)]), sort="uuid")
    return root


def _run_reference(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, script), *args],
        capture_output=True, text=True, timeout=300, cwd=REFERENCE,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout + proc.stderr


def test_reference_dedup_reads_our_sidecars(our_dataset):
    out = _run_reference(
        "_2_remove_duplicates.py", "--root_dir", str(our_dataset),
        "--threshold", "0.98", "--test",
    )
    ref_found = sum(int(m) for m in re.findall(r"Found (\d+) duplicates", out))

    ours = run_dedup(
        str(our_dataset), DedupConfig(threshold=0.98, test=True), use_mesh=False
    )
    assert ref_found == len(ours.rows) >= 1


def test_reference_subset_reads_our_csv(our_dataset):
    out = _run_reference(
        "_6_create_subset.py", "--input_dir", str(our_dataset),
        "--min_score", "0.0", "--max_score", "1.0",
        "--min_n_pixels", "100", "--extensions", ".jpg", "--test",
    )
    m = re.search(r"Found (\d+) rows", out)
    assert m and int(m.group(1)) >= 4  # the labeled rows pass the filter


@pytest.mark.slow
def test_reference_trainer_then_our_predict(our_dataset, tmp_path):
    """The reference's OWN trainer (_4_train_model.py — torch+sklearn only, no
    open_clip) runs unchanged on this framework's CSV + sidecars, and the
    whole-module ``.pth`` pickle it saves flows straight into our predict
    stage (find_model → load_torch_pickle → scores into the CSV). The predict
    half uses OUR stage because the reference's _5_predict_labels.py cannot
    execute under the baked torch 2.13 (its bare ``torch.load`` of a module
    pickle trips the weights_only default — a torch-version incompatibility in
    the reference itself, not a format gap)."""
    # Label the images the module fixture left unlabeled so the reference's
    # test split holds >1 sample (sklearn's r2_score needs >=2).
    label_dataset(
        str(our_dataset),
        HeadlessBackend([str(d) for d in (6, 8, 2, 4, 1)]),
        sort="uuid",
    )
    env = dict(os.environ, PYTHONPATH=REFERENCE, MPLBACKEND="Agg")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REFERENCE, "_4_train_model.py"),
            "--train_data_dir", str(our_dataset.parent),
            "--train_data_names", our_dataset.name,
            "--model_name", "interop", "--n_epochs", "10",
            "--test_fraction", "0.3", "--batch_size", "4",
            "--hidden_sizes", "16", "8",
        ],
        capture_output=True, text=True, timeout=300, cwd=tmp_path, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pths = list((tmp_path / "models").glob("interop_*.pth"))
    assert len(pths) == 1, (proc.stdout[-1000:], pths)

    from clip_assisted_data_labeling_tpu.pipeline.predict import predict_labels
    from clip_assisted_data_labeling_tpu.store.database import LabelDatabase

    n = predict_labels(
        str(our_dataset), str(pths[0]), batch_size=8, copy_imgs_fraction=0.0
    )
    db = LabelDatabase.load_or_create(str(our_dataset))
    assert n == db.df["predicted_label"].notna().sum() == 9
    preds = db.df["predicted_label"].astype(float)
    assert np.isfinite(preds).all()


def test_our_torch_export_loads_as_real_reference_class(tmp_path):
    """save_torch_pickle's output unpickles against the reference's REAL
    utils.nn_model.SimpleFC (not our shim): a subprocess with the reference
    on PYTHONPATH and no shim installed loads the pickle and reproduces our
    scores — models trained here flow back into the reference toolchain."""
    import jax

    from clip_assisted_data_labeling_tpu.models.regressor import (
        RegressorMeta,
        SimpleFCRegressor,
    )

    meta = RegressorMeta(
        clip_models=("ViT-Test/tiny",), crop_names=("centre_crop",),
        input_size=16, hidden_sizes=(8,), dropout_prob=0.5,
    )
    model = SimpleFCRegressor.create(jax.random.key(7), meta)
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (5, 16)).astype(np.float32)
    want = model.predict(x)
    pth = tmp_path / "ours.pth"
    model.save_torch_pickle(str(pth))
    np.save(tmp_path / "x.npy", x)

    code = (
        "import sys, numpy as np, torch\n"
        "from utils.nn_model import SimpleFC\n"  # the REAL reference class
        "m = torch.load(sys.argv[1], map_location='cpu', weights_only=False)\n"
        "assert type(m) is SimpleFC, type(m)\n"
        "assert m.crop_names == ['centre_crop'], m.crop_names\n"
        "m.eval()\n"
        "with torch.no_grad():\n"
        "    out = m(torch.tensor(np.load(sys.argv[2])))\n"
        "np.save(sys.argv[3], out.numpy())\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, str(pth), str(tmp_path / "x.npy"),
         str(tmp_path / "out.npy")],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PYTHONPATH=REFERENCE),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = np.load(tmp_path / "out.npy")[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)
