#!/usr/bin/env bash
# End-to-end drive of every pipeline stage CLI on a synthetic dataset (CPU).
# Used by the verify workflow; must stay green.
set -e
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)"
TMP=$(mktemp -d)
trap "rm -rf $TMP" EXIT
cd "$TMP"  # train writes ./models/<name>.npz; keep artifacts out of the repo

run() {
  local stage=$1; shift
  python -c "import jax; jax.config.update('jax_platforms','cpu'); import sys; \
from clip_assisted_data_labeling_tpu.pipeline import $stage as m; \
m.main(sys.argv[1:])" "$@"
}

python - << EOF
from PIL import Image
import numpy as np, os
rng = np.random.default_rng(0)
os.makedirs("$TMP/data", exist_ok=True)
for i in range(12):
    w, h = int(rng.integers(200, 500)), int(rng.integers(200, 500))
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
        f"$TMP/data/img_{i:03d}.jpg")
# one exact duplicate pair so dedup has something real to find
import shutil; shutil.copy(f"$TMP/data/img_000.jpg", f"$TMP/data/img_011.jpg")
EOF

run prep --root_dir "$TMP/data" --mode rename --yes
run embed --root_dir "$TMP/data" --models_to_use ViT-Test/tiny --batch_size 4 --canvas_size 256
run dedup --root_dir "$TMP/data" --threshold 0.999 --test
run label --root_dir "$TMP/data" --sort uuid --backend headless --keys 3,7,2,8,1,q
run train --train_data_dir "$TMP" --train_data_names data --n_epochs 4 \
    --batch_size 2 --hidden_sizes 8 --crop_names centre_crop --model_name vtest
run predict --root_dir "$TMP/data" --model_file vtest
run subset --input_dir "$TMP/data" --min_score 0.0 --max_score 1.0 \
    --min_n_pixels 10 --extensions .jpg --test

python - << EOF
import pandas as pd, torch, glob
df = pd.read_csv("$TMP/data.csv")
assert list(df.columns)[:4] == ["uuid","label","timestamp","predicted_label"], df.columns
pt = glob.glob("$TMP/data/*.pt")[0]
d = torch.load(pt, weights_only=False)
m = d["ViT-Test/tiny"]
assert m["centre_crop"].shape == (1, 16), m["centre_crop"].shape
assert any(k.startswith("img_stat_") for k in m)
assert df["predicted_label"].notna().sum() >= 7
print("on-disk contract OK:", len(df), "rows,", len(glob.glob("$TMP/data/*.pt")), "sidecars")
EOF
echo VERIFY_OK
