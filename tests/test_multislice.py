"""Multi-slice ('replica','data','model') mesh on the 8-device CPU backend."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
from sarssl_tpu.train import create_train_state
from sarssl_tpu.parallel import make_mesh, make_sharded_pretrain_step
from sarssl_tpu.data import synth_batch

from tiny import NSAMPLE, FEAT, CFG


def test_replica_mesh_step():
    mesh = make_mesh(n_replica=2, n_data=2, n_model=2)
    assert mesh.shape == {"replica": 2, "data": 2, "model": 2}
    model = SARSSL(CFG)
    x = jnp.zeros((8, 2, 64, 8, 2))
    mask = gen_patch_mask(jax.random.key(0), 8, CFG.npatch,
                          CFG.effective_nmasked())
    state = create_train_state(model, jax.random.key(0), x, mask)
    step, st_sh, b_sh = make_sharded_pretrain_step(
        model, FEAT, mesh, state, donate=False)
    assert b_sh.spec == P(("replica", "data"))
    state = jax.device_put(state, st_sh)
    wave = jax.device_put(
        jnp.asarray(synth_batch(np.random.default_rng(0), 8, NSAMPLE)[0]), b_sh)
    state, m = step(state, wave, 1e-3, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_real_two_process_pod():
    """REAL multi-process pod run (not virtual devices): two OS processes
    with Gloo collectives run the sharded train+eval steps over distinct
    host-local rows and must match a single-jit full-batch reference
    (scripts/test_multiprocess_pod.py prints POD_OK)."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "test_multiprocess_pod.py")],
        capture_output=True, text=True, timeout=1200, cwd=root)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "POD_OK" in r.stdout
