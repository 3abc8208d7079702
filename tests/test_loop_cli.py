"""The one-command active-learning loop stage (pipeline/loop.py): the
reference's label→train→predict→"loop back" workflow (README.md:6-20) driven
end-to-end for multiple laps."""
import os

import numpy as np

from benchmarks.bench_al_loop import build_corpus
from clip_assisted_data_labeling_tpu.config import TrainConfig
from clip_assisted_data_labeling_tpu.pipeline.loop import main as loop_main, run_loop
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.ui.backend import HeadlessBackend, OracleBackend


def test_run_loop_two_laps(tmp_path):
    root = tmp_path / "loopset"
    truth = build_corpus(str(root), n=60, seed=0)
    cfg = TrainConfig(
        clip_models_to_use=("AL-Synth",), crop_names=("centre_crop",),
        n_epochs=5, batch_size=8, test_fraction=0.0, hidden_sizes=(8,),
        dropout_prob=0.0, model_name="loop_t",
    )
    oracle = [OracleBackend(truth, 12), OracleBackend(truth, 12)]
    history = run_loop(
        str(root), cfg, sort="middle", laps=2,
        backend_factory=lambda lap: oracle[lap],
        models_dir=str(tmp_path / "models"), batch_size=64,
    )
    assert [h["lap"] for h in history] == [1, 2]
    assert history[0]["labels"] == 12 and history[1]["labels"] == 24
    assert all(h["predicted"] == 60 for h in history)
    assert all(os.path.exists(h["model_path"]) for h in history)
    db = LabelDatabase.load_or_create(str(root))
    assert db.df["predicted_label"].notna().sum() == 60
    assert db.n_labeled() == 24


def test_loop_stops_without_new_labels(tmp_path):
    root = tmp_path / "loopset2"
    build_corpus(str(root), n=30, seed=1)
    cfg = TrainConfig(
        clip_models_to_use=("AL-Synth",), crop_names=("centre_crop",),
        n_epochs=2, batch_size=8, test_fraction=0.0, hidden_sizes=(8,),
        dropout_prob=0.0, model_name="loop_t2",
    )
    # lap 1 labels 5; lap 2's backend quits immediately → loop must stop
    backends = [HeadlessBackend(["5", "3", "8", "1", "9", "quit"]),
                HeadlessBackend(["quit"]), HeadlessBackend(["quit"])]
    history = run_loop(
        str(root), cfg, sort="uuid", laps=3,
        backend_factory=lambda lap: backends[lap],
        models_dir=str(tmp_path / "models"), batch_size=64,
    )
    assert len(history) == 1  # lap 2 added nothing → stopped


def test_loop_cli_headless(tmp_path, monkeypatch):
    root = tmp_path / "loopset3"
    build_corpus(str(root), n=30, seed=2)
    monkeypatch.chdir(tmp_path)
    loop_main([
        "--root_dir", str(root), "--laps", "2", "--sort", "uuid",
        "--clip_models", "AL-Synth", "--crop_names", "centre_crop",
        "--n_epochs", "2", "--test_fraction", "0", "--hidden_sizes", "8",
        "--model_name", "loopcli", "--backend", "headless",
        "--keys", "4,7,2,q;9,1,q",
    ])
    db = LabelDatabase.load_or_create(str(root))
    assert db.n_labeled() >= 4
    assert db.df["predicted_label"].notna().sum() == 30
    models = os.listdir(tmp_path / "models")
    assert sum("loopcli" in m for m in models) == 2
