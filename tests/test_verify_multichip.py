"""scripts/verify_multichip.py --smoke must stay green: it is the runbook that
turns the v5e-8 projection (BENCH_NOTES.md) into measurements the day real
multi-chip hardware is available, so CI proves the harness itself runs."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_verify_multichip_smoke():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own virtual mesh size
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_multichip.py"),
         "--smoke"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["correctness"]["ok"] is True
    assert report["dedup"]["planted_pairs_recovered"] is True
    assert report["predict"]["matches_single_device"] is True
    assert report["embed"]["mesh_imgs_per_sec"] > 0
