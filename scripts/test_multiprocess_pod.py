"""REAL 2-process pod test on CPU (Gloo collectives).

The pod data path (parallel/hostdata.py) was previously covered only by
single-process logic tests. This script runs the actual multi-host
machinery: two OS processes, each owning 2 CPU devices, initialize
jax.distributed, build the 4-device data mesh, contribute DISTINCT
host-local rows via global_batch_from_local, and run sharded pretrain
train+eval steps. Process 0 independently recomputes the same step on the
full batch with a local single-jit program and asserts the losses agree —
the DP-exactness property, now across real process boundaries.

Run: python scripts/test_multiprocess_pod.py          # spawns both ranks
     python scripts/test_multiprocess_pod.py --rank N # one rank (internal)
Prints POD_OK on success; exits nonzero otherwise.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PORT = 29517  # default; the parent picks a free port and passes --port
NPROC = 2
LOCAL_DEV = 2
LOCAL_BS = 4


def rank_main(rank: int, port: int = PORT) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEV}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=NPROC, process_id=rank)
    assert jax.process_count() == NPROC
    assert jax.device_count() == NPROC * LOCAL_DEV

    import numpy as np
    import jax.numpy as jnp

    from tiny import NSAMPLE, FEAT, CFG
    from sarssl_tpu.models import SARSSL
    from sarssl_tpu.ops import gen_patch_mask
    from sarssl_tpu.train import create_train_state, make_pretrain_step
    from sarssl_tpu.train.steps import pretrain_eval_body
    from sarssl_tpu.parallel import (make_mesh, make_sharded_pretrain_step,
                                     make_sharded_pretrain_eval_step,
                                     global_batch_from_local,
                                     shard_for_process)
    from sarssl_tpu.data import synth_batch

    model = SARSSL(CFG)
    nf, nt, nreim, nmic = CFG.sig_shape
    gbs = LOCAL_BS * NPROC
    x0 = jnp.zeros((gbs, nmic, nf, nt, nreim))
    m0 = gen_patch_mask(jax.random.key(0), gbs, CFG.npatch,
                        CFG.effective_nmasked())
    state = create_train_state(model, jax.random.key(0), x0, m0)

    mesh = make_mesh(n_data=NPROC * LOCAL_DEV, n_model=1)
    step, st_sh, b_sh = make_sharded_pretrain_step(model, FEAT, mesh, state,
                                                   donate=False)
    estep, _, _ = make_sharded_pretrain_eval_step(model, FEAT, mesh, state)
    state_sh = jax.device_put(state, st_sh)

    # every host contributes DISTINCT rows: host r takes rows [r*LOCAL_BS, ...)
    # of one global deterministic batch
    wave_all, _ = synth_batch(np.random.default_rng(11), gbs, NSAMPLE)
    local = wave_all[rank * LOCAL_BS:(rank + 1) * LOCAL_BS]
    gwave = global_batch_from_local(local, b_sh)

    rng = jax.random.key(7)
    new_state, m = step(state_sh, gwave, 1e-3, rng)
    loss_pod = float(m["loss"])
    em = estep(new_state, gwave, jax.random.key(9))
    eval_pod = float(em["loss"])

    # shard_for_process sanity across REAL process ids
    mine = shard_for_process(list(range(17)))
    assert len(mine) == 17 // NPROC

    if rank == 0:
        # independent single-jit reference on the full batch
        ref_step = make_pretrain_step(model, FEAT, donate=False)
        s1, m1 = ref_step(state, jnp.asarray(wave_all), 1e-3, rng)
        eref = jax.jit(pretrain_eval_body(model, FEAT))(
            s1, jnp.asarray(wave_all), jax.random.key(9))
        loss_ref, eval_ref = float(m1["loss"]), float(eref["loss"])
        print(f"pod train loss {loss_pod:.8f} vs single {loss_ref:.8f}; "
              f"pod eval {eval_pod:.8f} vs single {eval_ref:.8f}", flush=True)
        assert abs(loss_pod - loss_ref) < 1e-5 * max(1, abs(loss_ref))
        assert abs(eval_pod - eval_ref) < 1e-5 * max(1, abs(eval_ref))
        print("POD_OK", flush=True)
    return 0


def main() -> int:
    if "--rank" in sys.argv:
        port = (int(sys.argv[sys.argv.index("--port") + 1])
                if "--port" in sys.argv else PORT)
        return rank_main(int(sys.argv[sys.argv.index("--rank") + 1]), port)
    # pick a free coordinator port (a fixed one collides with TIME_WAIT
    # from a previous run or a concurrent test session)
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, os.path.abspath(__file__),
                               "--rank", str(r), "--port", str(port)])
             for r in range(NPROC)]
    try:
        rcs = [p.wait(timeout=1200) for p in procs]
    finally:
        for p in procs:  # a dead partner must not leave the other hanging
            if p.poll() is None:
                p.kill()
    if any(rcs):
        print("FAILED", rcs)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
