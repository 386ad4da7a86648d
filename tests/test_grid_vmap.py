"""Vmapped downstream grid (train/grid.py): per-cell parity with the
sequential DownstreamLearner, and the per-cell early-stop/lr-drop/ensemble
life cycle on the stacked state."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.train import (create_train_state, make_downstream_step,
                              make_downstream_eval_step)
from sarssl_tpu.train.learner import DownstreamLearner
from sarssl_tpu.train.grid import (VmappedGridRunner, slice_state,
                                   stack_states)
from sarssl_tpu.data import synth_batch

from tiny import NSAMPLE, FEAT, CFG


def _init_state():
    cfg = SARSSLConfig(**{**CFG.__dict__, "pretrain": False})
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x = jnp.zeros((4, nmic, nf, nt, nreim))
    return model, create_train_state(model, jax.random.key(0), x, None)


def _epoch_data(epoch, nb=4, nbatch=2):
    rng = np.random.default_rng(100 + epoch)
    out = []
    for _ in range(nbatch):
        w, t = synth_batch(rng, nb, NSAMPLE)
        out.append((w, (t / 16000.0).astype(np.float32)))
    return out


LRS = (1e-2, 1e-3)
NEPOCH = 3


def test_vmapped_step_exact_and_lanes_independent():
    """One vmapped step == the sequential step body per lane, bitwise-tight;
    identical-lr lanes stay identical; different-lr lanes differ."""
    from sarssl_tpu.train.steps import downstream_step_body

    model, state0 = _init_state()
    body = jax.jit(downstream_step_body(model, FEAT))
    w, g = _epoch_data(0, nbatch=1)[0]
    w, g = jnp.asarray(w), jnp.asarray(g)
    key = jax.random.key(5)

    runner = VmappedGridRunner(model, FEAT, [state0, state0, state0],
                               [(0, 1e-2), (0, 1e-2), (0, 1e-3)],
                               patience=100)

    # sequential reference for lane 0 (split chain mirrors the learner):
    # forward/loss agree to fp exactness. Raw params after the Adam update
    # are NOT compared even for one step: elements whose gradient is at
    # fp-noise level get a +-lr*sign(noise) first step (m/sqrt(v) ~ sign).
    _, sub = jax.random.split(key)
    s1, m1 = body(state0, w, g, 1e-2, sub)
    tm = runner.train_epoch(iter([(np.stack([w, w, w]),
                                   np.stack([g, g, g]))]), [key, key, key])
    assert float(m1["loss"]) == pytest.approx(float(tm["loss"][0]), rel=1e-6)
    assert float(m1["mae"]) == pytest.approx(float(tm["mae"][0]), rel=1e-6)
    # identical-lr lanes bitwise equal
    for x, y in zip(jax.tree.leaves(slice_state(runner.states, 0).params),
                    jax.tree.leaves(slice_state(runner.states, 1).params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # the 1e-3 lane took a different step
    d = max(np.abs(np.asarray(x) - np.asarray(y)).max()
            for x, y in zip(
                jax.tree.leaves(slice_state(runner.states, 0).params),
                jax.tree.leaves(slice_state(runner.states, 2).params)))
    assert d > 1e-4


def test_vmapped_grid_matches_sequential_behavior():
    """Multi-epoch: per-cell eval MAE and loss trajectories match the
    sequential DownstreamLearner. (Raw params are NOT compared after many
    Adam steps — the 1/sqrt(v) normalization chaotically amplifies
    reduction-order fp noise; step-level exactness is pinned above.)"""
    model, state0 = _init_state()
    key0 = jax.random.key(42)

    seq_maes, seq_losses = [], []
    for lr in LRS:
        learner = DownstreamLearner(
            state=state0, train_step=make_downstream_step(model, FEAT,
                                                          donate=False),
            eval_step=make_downstream_eval_step(model, FEAT),
            lr_init=lr, ckpt_dir=None, patience=100)
        losses = []
        for epoch in range(NEPOCH):
            tkey = jax.random.fold_in(key0, 7000 + epoch)
            tm = learner.train_epoch(
                ((jnp.asarray(w), jnp.asarray(g))
                 for w, g in _epoch_data(epoch)), tkey)
            losses.append(tm["loss"])
        vm = learner.eval_epoch(
            ((jnp.asarray(w), jnp.asarray(g)) for w, g in _epoch_data(99)))
        seq_maes.append(vm["mae"])
        seq_losses.append(losses)

    runner = VmappedGridRunner(model, FEAT, [state0, state0],
                               [(0, lr) for lr in LRS], patience=100)
    vm_losses = [[], []]
    for epoch in range(NEPOCH):
        data = _epoch_data(epoch)

        def stacked():
            for w, g in data:
                yield (np.stack([w, w]), np.stack([g, g]))

        rngs = [jax.random.fold_in(key0, 7000 + epoch)] * 2
        tm = runner.train_epoch(stacked(), rngs)
        for i in range(2):
            vm_losses[i].append(float(tm["loss"][i]))
        runner.end_epoch(np.array([1.0, 1.0]))
    ev = runner.eval_epoch((w, g) for w, g in _epoch_data(99))

    for i in range(2):
        assert float(ev["mae"][i]) == pytest.approx(seq_maes[i], rel=5e-3), i
        np.testing.assert_allclose(vm_losses[i], seq_losses[i], rtol=2e-2)


def test_resident_train_epoch_matches_stream(tmp_path):
    """Device-resident index-gather training draws the EXACT batches the
    packed streaming path yields (same permutation seeds, same sorted
    gathers) and produces identical per-cell losses from the same init."""
    from sarssl_tpu.data import PackedDataset, pack_dataset

    rng = np.random.default_rng(3)
    n, bs, nsteps = 24, 4, 3

    class _Src:
        def __len__(self):
            return n

        def __getitem__(self, i):
            r = np.random.default_rng(1000 + i)
            return (r.standard_normal((NSAMPLE, 2)).astype(np.float32),
                    {"TDOA": np.float32(r.uniform(-2e-4, 2e-4))})

    d = str(tmp_path / "packed")
    pack_dataset(_Src(), d, items_per_shard=7)
    pds = PackedDataset(d, load_anno=True)

    model, state0 = _init_state()
    key0 = jax.random.key(9)
    seeds = {0: 42, 1: 77}  # per-trial epoch permutation seeds

    def run(runner, use_resident):
        acol = pds.annos()["TDOA"]
        if use_resident:
            runner.stage_train_waves(pds.all_waves())

            def batches():
                its = {t: pds.batch_indices(bs, shuffle=True, seed=s)
                       for t, s in seeds.items()}
                for k, per in zip(range(nsteps), zip(*its.values())):
                    by_t = dict(zip(its.keys(), per))
                    yield (np.stack([by_t[0], by_t[1]]),
                           np.stack([np.asarray(acol[by_t[t]], np.float32)
                                     for t in (0, 1)]))
            return runner.train_epoch_resident(batches(), [key0, key0])

        def batches():
            its = {t: pds.iter_batches(bs, shuffle=True, seed=s)
                   for t, s in seeds.items()}
            for k, per in zip(range(nsteps), zip(*its.values())):
                by_t = dict(zip(its.keys(), per))
                yield (np.stack([by_t[0][0], by_t[1][0]]),
                       np.stack([np.asarray(by_t[t][1]["TDOA"], np.float32)
                                 for t in (0, 1)]))
        return runner.train_epoch(batches(), [key0, key0])

    cells = [(0, 1e-3), (1, 1e-3)]
    r1 = VmappedGridRunner(model, FEAT, [state0, state0], cells,
                           patience=100, scan_block=2)
    m1 = run(r1, False)
    r2 = VmappedGridRunner(model, FEAT, [state0, state0], cells,
                           patience=100, scan_block=2)
    m2 = run(r2, True)
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    np.testing.assert_allclose(m1["mae"], m2["mae"], rtol=1e-6)
    for x, y in zip(jax.tree.leaves(r1.states.params),
                    jax.tree.leaves(r2.states.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-6)


def test_device_ring_ensemble_math():
    """The on-device window average equals the reference's uniform mean of
    the last k epochs ending at the best, and non-best epochs don't fold."""
    model, state0 = _init_state()
    runner = VmappedGridRunner(model, FEAT, [state0], [(0, 1e-3)],
                               patience=100, ensemble_k=2)
    p0 = np.asarray(jax.tree.leaves(state0.params)[0])

    # epoch 0: params P0, new best -> candidate = mean([P0]) = P0
    runner.end_epoch(np.array([1.0]))
    # epoch 1: params P0+1, better -> candidate = mean(P0, P0+1) = P0+0.5
    runner.states = runner.states.replace(
        params=jax.tree.map(lambda x: x + 1.0, runner.states.params))
    runner.end_epoch(np.array([0.5]))
    # epoch 2: params P0+10, WORSE val -> candidate unchanged
    runner.states = runner.states.replace(
        params=jax.tree.map(lambda x: x + 9.0, runner.states.params))
    runner.end_epoch(np.array([5.0]))

    runner.ensembled_states()
    got = np.asarray(jax.tree.leaves(slice_state(runner.states, 0).params)[0])
    np.testing.assert_allclose(got, p0 + 0.5, atol=1e-6)


def test_cell_lifecycle_and_ensemble():
    """Cells stop independently (two-stage lr/10), finished cells freeze,
    ensembled params equal the mean over each cell's best window."""
    model, state0 = _init_state()
    runner = VmappedGridRunner(model, FEAT, [state0, state0],
                               [(0, 1e-2), (0, 1e-3)], patience=1,
                               ensemble_k=2)

    # train one real step per epoch so params move between snapshots
    key0 = jax.random.key(1)
    val_b = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]   # cell B: monotonically worse
    val_a = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]   # cell A: keeps improving
    done_epochs = []
    for epoch in range(6):
        data = _epoch_data(epoch, nbatch=1)

        def stacked():
            for w, g in data:
                yield np.stack([w, w]), np.stack([g, g])

        runner.train_epoch(stacked(), [jax.random.fold_in(key0, epoch)] * 2)
        done = runner.end_epoch(np.array([val_a[epoch], val_b[epoch]]))
        done_epochs.append((runner.cells[0].done, runner.cells[1].done))
        if done:
            break

    # B: best at epoch 0, patience 1 -> lr drop at epoch 1, done at epoch 2
    assert runner.cells[1].done and runner.cells[1].lr_drops == 1
    assert runner.cells[1].lr == pytest.approx(1e-4)
    assert not runner.cells[0].done  # A never stops within 6 epochs
    # B's lane froze once done: lr vector entry is 0
    assert float(runner._lrs()[1]) == 0.0

    p_before = np.asarray(
        jax.tree.leaves(slice_state(runner.states, 1).params)[0])
    data = _epoch_data(7, nbatch=1)
    runner.train_epoch(
        ((np.stack([w, w]), np.stack([g, g])) for w, g in data),
        [jax.random.fold_in(key0, 7)] * 2)
    p_after = np.asarray(
        jax.tree.leaves(slice_state(runner.states, 1).params)[0])
    np.testing.assert_array_equal(p_before, p_after)

    # ensemble: B's best is epoch 0 (k=2 ring then held only epoch 0), so
    # its candidate is exactly the epoch-0 params; A's best kept improving,
    # so its candidate is the mean of the last-2-epoch ring at its final
    # best. Check B's lane against the epoch-0 snapshot captured from the
    # ring at fold time via the candidate itself being set (non-zero).
    runner.ensembled_states()
    ens1 = np.asarray(jax.tree.leaves(slice_state(runner.states, 1).params)[0])
    assert np.abs(ens1).max() > 0, "candidate lane was never folded"
    ens0 = np.asarray(jax.tree.leaves(slice_state(runner.states, 0).params)[0])
    assert not np.array_equal(ens0, ens1), \
        "cells ended with identical ensembles despite different life cycles"


def test_nan_lane_falls_back_to_live_state():
    """A lane that never registers a best (NaN val MAE every epoch, e.g. a
    diverged high-lr cell) must not crash ensembled_states or poison the
    healthy lanes: it falls back to its live final state, the healthy
    lane keeps its folded window candidate."""
    model, state0 = _init_state()
    runner = VmappedGridRunner(model, FEAT, [state0, state0],
                               [(0, 1e-3), (0, 1e-2)],
                               patience=2, ensemble_k=2)
    p0 = np.asarray(jax.tree.leaves(state0.params)[0])

    # epoch 0: healthy lane improves (candidate = P0), NaN lane doesn't
    runner.end_epoch(np.array([1.0, np.nan]))
    # epoch 1: params drift; healthy lane improves again
    runner.states = runner.states.replace(
        params=jax.tree.map(lambda x: x + 1.0, runner.states.params))
    done = runner.end_epoch(np.array([0.5, np.nan]))
    # then the healthy lane WORSENS each epoch (a constant value would tie
    # against the converged smoothed best forever — ties count as best,
    # reference learner.py:287) until patience + lr-drop + patience ends it
    mae, epoch = 0.5, 2
    while not done:
        assert epoch < 16, "grid never stopped on worsening val MAEs"
        runner.states = runner.states.replace(
            params=jax.tree.map(lambda x: x + 1.0, runner.states.params))
        mae += 0.2
        done = runner.end_epoch(np.array([mae, np.nan]))
        epoch += 1

    live = np.asarray(jax.tree.leaves(runner.states.params)[0])
    st = runner.ensembled_states()  # must not raise
    leaves = np.asarray(jax.tree.leaves(st.params)[0])
    # NaN lane = live final params; healthy lane = a folded average,
    # which after the +1 drifts cannot equal the live value
    np.testing.assert_allclose(leaves[1], live[1], atol=1e-7)
    assert not np.allclose(leaves[0], live[0])
    assert runner.cells[0].best_epochs and not runner.cells[1].best_epochs


def test_all_nan_chunk_returns_live_states():
    """A chunk whose EVERY lane diverges to NaN from epoch 0 (e.g. one
    too-hot lr per chunk) must still produce results — live final states,
    no crash — so later chunks run and results.json is written."""
    model, state0 = _init_state()
    runner = VmappedGridRunner(model, FEAT, [state0, state0],
                               [(0, 1e-2), (0, 1e-1)],
                               patience=2, ensemble_k=2)
    done, epoch = False, 0
    while not done:
        assert epoch < 16, "all-NaN grid never stopped"
        done = runner.end_epoch(np.array([np.nan, np.nan]))
        epoch += 1
    live = np.asarray(jax.tree.leaves(runner.states.params)[0])
    st = runner.ensembled_states()  # must not raise
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(st.params)[0]), live, atol=1e-7)
