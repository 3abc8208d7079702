"""True CLI-surface test: the stage entry points run as subprocesses, end to end
on a small dataset (guards argparse wiring that in-process tests bypass)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

def _run(args, timeout=600):
    # the inline snippet forces the cpu platform itself (env vars are overridden
    # by this machine's sitecustomize — see CLAUDE.md)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from clip_assisted_data_labeling_tpu.pipeline import "
         f"{args[0]} as m; sys.argv = ['x'] + {args[1:]!r}; m.main(sys.argv[1:])"],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout



def test_full_cli_pipeline(tmp_path, rng):
    raw = tmp_path / "raw"
    raw.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, (90, 120, 3)).astype(np.uint8)
        arr[:, :60] = (40 * i) % 255
        Image.fromarray(arr).save(raw / f"photo {i}.jpg", quality=95)

    data = str(tmp_path / "data" / "mini")
    _run(["prep", "--root_dir", str(raw), "--output_dir", data, "--mode", "copy"])
    _run(["embed", "--root_dir", data, "--models_to_use", "ViT-Test/tiny",
          "--batch_size", "4", "--canvas_size", "256"])
    _run(["dedup", "--root_dir", data, "--threshold", "0.999", "--test"])
    _run(["label", "--root_dir", data, "--sort", "uuid", "--backend", "headless",
          "--keys", "8,2,7,3,9,q"])
    _run(["train", "--train_data_dir", str(tmp_path / "data"),
          "--train_data_names", "mini", "--n_epochs", "3", "--batch_size", "2",
          "--hidden_sizes", "8", "--crop_names", "centre_crop", "--dont_save"])
    _run(["subset", "--input_dir", data, "--min_score", "0.0",
          "--min_n_pixels", "10", "--extensions", ".jpg", "--test"])

    csv_path = tmp_path / "data" / "mini.csv"
    assert csv_path.exists()
    import pandas as pd

    df = pd.read_csv(csv_path)
    assert list(df.columns[:4]) == ["uuid", "label", "timestamp", "predicted_label"]
    assert df["label"].notna().sum() == 5


def test_bench_help():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0
    assert "images/sec" in proc.stdout + proc.stderr or "--batch" in proc.stdout
