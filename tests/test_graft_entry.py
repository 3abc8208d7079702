"""Driver entry points stay healthy: entry() is jit-traceable, dryrun works."""
import jax
import numpy as np

import __graft_entry__ as ge


def test_entry_traces():
    fn, args = ge.entry()
    # eval_shape traces the full ViT-L program without compiling it
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 4, 768)


def test_example_batch_valid():
    canvases, params = ge._example_batch(4, 256, 56)
    assert canvases.shape == (4, 256, 256, 3)
    assert params.shape == (4, 4, 2, 4)
    assert np.isfinite(params).all()


def test_dryrun_multichip_small():
    # exercises dp embed (no tp at n=2), ring dedup, dp train on 2 devices
    before = jax.device_count()
    ge.dryrun_multichip(2)
    # regression: the dryrun must NOT shrink the process's virtual device
    # pool (it once clobbered jax_num_cpu_devices to 2 under the forced-8
    # pytest env, breaking every later 4+-device mesh test in the session)
    assert jax.device_count() == before, (
        f"dryrun_multichip shrank the device pool: {before} -> {jax.device_count()}"
    )
