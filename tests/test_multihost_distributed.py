"""True multi-process (multi-host-shaped) run: two jax.distributed processes
shard-embed a dataset, the stores merge via 'pipeline.store rebuild', and the
ring dedup executes over the GLOBAL 4-device mesh with cross-process
collectives (gloo on CPU) — the end-to-end recipe from VERDICT.md item 3.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, port: int, module: str, cli_args: list[str],
           n_procs: int = 2):
    """One distributed process: CPU platform, 2 virtual local devices."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_num_cpu_devices', 2); "
        f"import sys; from clip_assisted_data_labeling_tpu.pipeline import {module} as m; "
        "m.main(sys.argv[1:])"
    )
    args = cli_args + [
        "--distributed", "--coordinator_address", f"localhost:{port}",
        "--num_processes", str(n_procs), "--process_id", str(pid),
    ]
    return subprocess.Popen(
        [sys.executable, "-c", code] + args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO,
    )


def _join(procs, timeout=600):
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    return outs


@pytest.mark.slow
def test_two_process_embed_merge_dedup(tmp_path, rng):
    data = tmp_path / "data"
    data.mkdir()
    for i in range(14):
        arr = rng.integers(0, 256, (100, 140, 3)).astype(np.uint8)
        arr[:, :70] = (33 * i) % 255
        Image.fromarray(arr).save(data / f"{i:032x}.jpg", quality=95)
    # plant an exact duplicate pair
    dup_src, dup_dst = data / f"{3:032x}.jpg", data / f"{13:032x}.jpg"
    dup_dst.write_bytes(dup_src.read_bytes())

    # --- phase 1: each process embeds its disjoint file shard ----------------
    port = _free_port()
    procs = [
        _spawn(i, port, "embed", [
            "--root_dir", str(data), "--models_to_use", "ViT-Test/tiny",
            "--batch_size", "4", "--canvas_size", "256",
        ])
        for i in range(2)
    ]
    outs = _join(procs)
    assert any("Host shard 0/2: 7 images" in o for o in outs), outs[0][-2000:]
    assert any("Host shard 1/2: 7 images" in o for o in outs)
    pts = sorted(data.glob("*.pt"))
    assert len(pts) == 14  # both shards wrote sidecars into the shared tree

    # --- phase 2: merge shards into one columnar store -----------------------
    from clip_assisted_data_labeling_tpu.pipeline import store as store_cli
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore

    (merged,) = store_cli.rebuild(str(data), ["ViT-Test/tiny"])
    assert merged.meta["n"] == 14 and int(merged.valid.sum()) == 14

    # merged rows must equal a single-process embedding of the same images
    # (weights are deterministic per model name)
    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

    single = read_sidecar(str(pts[0]))["ViT-Test/tiny"]
    row = merged.index_of(pts[0].stem)
    ci = merged.crop_index("centre_crop")
    np.testing.assert_allclose(
        np.asarray(merged.embeddings[row, ci], np.float32),
        np.asarray(single["centre_crop"], np.float32).reshape(-1),
        atol=2e-3,  # store rows are fp16
    )

    # --- phase 3: ring dedup over the GLOBAL 2x2-device mesh -----------------
    port = _free_port()
    procs = [
        _spawn(i, port, "dedup", [
            "--root_dir", str(data), "--threshold", "0.999", "--test",
        ])
        for i in range(2)
    ]
    outs = _join(procs)
    for o in outs:  # every process computes (and agrees on) the planted pair
        assert "Found 1 duplicates!" in o, o[-2000:]


@pytest.mark.slow
def test_four_process_embed_merge_dedup(tmp_path, rng):
    """VERDICT r2 #7: the distributed recipe beyond 2x2 — four processes
    (global 4x2 = 8-device mesh) shard-embed, merge, and ring-dedup with
    cross-process collectives."""
    data = tmp_path / "data"
    data.mkdir()
    for i in range(16):
        arr = rng.integers(0, 256, (100, 140, 3)).astype(np.uint8)
        arr[:, :70] = (29 * i) % 255
        Image.fromarray(arr).save(data / f"{i:032x}.jpg", quality=95)
    dup_src, dup_dst = data / f"{3:032x}.jpg", data / f"{15:032x}.jpg"
    dup_dst.write_bytes(dup_src.read_bytes())

    port = _free_port()
    procs = [
        _spawn(i, port, "embed", [
            "--root_dir", str(data), "--models_to_use", "ViT-Test/tiny",
            "--batch_size", "4", "--canvas_size", "256",
        ], n_procs=4)
        for i in range(4)
    ]
    outs = _join(procs)
    for i in range(4):
        assert any(f"Host shard {i}/4: 4 images" in o for o in outs), (
            outs[0][-2000:]
        )
    assert len(sorted(data.glob("*.pt"))) == 16

    from clip_assisted_data_labeling_tpu.pipeline import store as store_cli

    (merged,) = store_cli.rebuild(str(data), ["ViT-Test/tiny"])
    assert merged.meta["n"] == 16 and int(merged.valid.sum()) == 16

    port = _free_port()
    procs = [
        _spawn(i, port, "dedup", [
            "--root_dir", str(data), "--threshold", "0.999", "--test",
        ], n_procs=4)
        for i in range(4)
    ]
    outs = _join(procs)
    for o in outs:
        assert "Found 1 duplicates!" in o, o[-2000:]


@pytest.mark.slow
def test_distributed_kill_and_resume(tmp_path, rng):
    """Recovery story on the distributed path: SIGKILL a 2-process embed run
    mid-flight, rerun the same job, and the per-image incremental skip must
    pick up exactly where the dead run stopped — every image embedded once,
    nothing lost, nothing re-embedded."""
    import signal
    import time

    data = tmp_path / "data"
    data.mkdir()
    for i in range(24):
        arr = rng.integers(0, 256, (300, 420, 3)).astype(np.uint8)
        arr[:, :210] = (11 * i) % 255
        Image.fromarray(arr).save(data / f"{i:032x}.jpg", quality=95)

    cli = ["--root_dir", str(data), "--models_to_use", "ViT-Test/tiny",
           "--batch_size", "2", "--num_workers", "1", "--canvas_size", "512"]
    port = _free_port()
    procs = [_spawn(i, port, "embed", cli) for i in range(2)]
    # wait for SOME sidecars, then kill both processes hard (job failure)
    deadline = time.time() + 300
    while time.time() < deadline:
        if len(list(data.glob("*.pt"))) >= 4:
            break
        if all(p.poll() is not None for p in procs):
            break  # finished before we could kill — resume still validated
        time.sleep(0.02)
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
    n_before = len(list(data.glob("*.pt")))
    assert n_before >= 1, "run died before writing anything"

    # rerun the identical job: incremental skip resumes from the sidecars
    port = _free_port()
    procs = [_spawn(i, port, "embed", cli) for i in range(2)]
    outs = _join(procs)
    assert len(list(data.glob("*.pt"))) == 24
    skipped = sum(
        int(o.split(" already embedded)")[0].rsplit("(", 1)[1])
        for o in outs if " already embedded)" in o
    )
    # the intact pre-kill sidecars were skipped. SIGKILL mid-write can leave
    # one TORN .pt per process — has_model_key correctly reports those as
    # not-embedded and the resume re-embeds them (that is the recovery
    # contract: torn artifacts heal, intact ones are never redone)
    assert skipped >= min(n_before, 20) - 2, (n_before, skipped, outs[0][-1500:])

    from clip_assisted_data_labeling_tpu.pipeline import store as store_cli

    (merged,) = store_cli.rebuild(str(data), ["ViT-Test/tiny"])
    assert merged.meta["n"] == 24 and int(merged.valid.sum()) == 24
