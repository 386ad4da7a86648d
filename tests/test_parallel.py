"""Multi-chip sharding on the 8-device CPU mesh: DP, DP+TP, numerics parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
from sarssl_tpu.train import create_train_state, make_pretrain_step
from sarssl_tpu.parallel import (
    make_mesh, batch_sharding, make_sharded_pretrain_step,
    make_sharded_downstream_step,
)
from sarssl_tpu.data import synth_batch

from tiny import NSAMPLE, FEAT, CFG  # shared tiny step profile


def _setup(pretrain=True):
    cfg = CFG if pretrain else SARSSLConfig(**{**CFG.__dict__, "pretrain": False})
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x = jnp.zeros((8, nmic, nf, nt, nreim))
    mask = gen_patch_mask(jax.random.key(0), 8, cfg.npatch,
                          cfg.effective_nmasked()) if pretrain else None
    state = create_train_state(model, jax.random.key(0), x, mask)
    return model, state


def test_mesh_shapes():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    m = make_mesh()  # all-data
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


@pytest.mark.parametrize("n_data,n_model", [(4, 2)])
def test_sharded_pretrain_step_runs(n_data, n_model):
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    model, state = _setup()
    step, st_sh, b_sh = make_sharded_pretrain_step(model, FEAT, mesh, state,
                                                   donate=False)
    state = jax.device_put(state, st_sh)
    wave, _ = synth_batch(np.random.default_rng(0), 8, NSAMPLE)
    wave = jax.device_put(jnp.asarray(wave), b_sh)
    state, m = step(state, wave, 1e-3, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    # params stay sharded per rules
    ff_kernel = state.params["decoder"]["proj0"]["kernel"]
    # column-parallel rule: the output dim is sharded over 'model' (on a
    # model-free mesh the same spec is degenerate-replicated)
    assert ff_kernel.sharding.spec == P(None, "model")


def test_dp_matches_single_device_numerics():
    """One DP step over 8 devices == the same step on one device."""
    model, state0 = _setup()
    wave, _ = synth_batch(np.random.default_rng(3), 8, NSAMPLE)
    wave = jnp.asarray(wave)
    rng = jax.random.key(5)

    single = make_pretrain_step(model, FEAT, donate=False)
    s1, m1 = single(state0, wave, 1e-3, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    step, st_sh, b_sh = make_sharded_pretrain_step(model, FEAT, mesh, state0,
                                                   donate=False)
    s8, m8 = step(jax.device_put(state0, st_sh),
                  jax.device_put(wave, b_sh), 1e-3, rng)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s8.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_downstream_step_runs():
    mesh = make_mesh(n_data=4, n_model=2)
    model, state = _setup(pretrain=False)
    step, st_sh, b_sh = make_sharded_downstream_step(model, FEAT, mesh, state,
                                                     donate=False)
    state = jax.device_put(state, st_sh)
    wave, tdoa = synth_batch(np.random.default_rng(0), 8, NSAMPLE)
    wave = jax.device_put(jnp.asarray(wave), b_sh)
    gt = jax.device_put(jnp.asarray(tdoa / 16000.0), NamedSharding(mesh, P("data")))
    state, m = step(state, wave, gt, 1e-3, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_sharded_lineareval_freezes_loaded_params():
    """trainable_mask plumbed through make_sharded_downstream_step: frozen
    (loaded) encoder params must not move; the head must."""
    from flax import serialization
    from flax.traverse_util import flatten_dict
    from sarssl_tpu.train.checkpoint import trainable_mask_from_loaded

    mesh = make_mesh(n_data=4, n_model=2)
    model, state = _setup(pretrain=False)

    # simulate a checkpoint load of both encoders
    sd = flatten_dict(serialization.to_state_dict(jax.device_get(state.params)))
    loaded_keys = ["/".join(map(str, k)) for k in sd
                   if k[0] in ("spec_encoder", "spat_encoder")]
    tmask = trainable_mask_from_loaded(state.params, loaded_keys)

    step, st_sh, b_sh = make_sharded_downstream_step(
        model, FEAT, mesh, state, task="TDOA", donate=False,
        trainable_mask=tmask)
    state = jax.device_put(state, st_sh)
    wave, _ = synth_batch(np.random.default_rng(0), 8, NSAMPLE)
    wave = jax.device_put(jnp.asarray(wave), b_sh)
    gt = jax.device_put(jnp.zeros((8,), jnp.float32), b_sh)

    before = jax.device_get(state.params)
    state, m = step(state, wave, gt, 1e-2, jax.random.key(1))
    after = jax.device_get(state.params)
    assert np.isfinite(float(m["loss"]))

    enc_b = flatten_dict(serialization.to_state_dict(before["spec_encoder"]))
    enc_a = flatten_dict(serialization.to_state_dict(after["spec_encoder"]))
    for k in enc_b:
        np.testing.assert_array_equal(enc_b[k], enc_a[k],
                                      err_msg=f"frozen param moved: {k}")
    head_b = np.asarray(before["head_proj"]["kernel"])
    head_a = np.asarray(after["head_proj"]["kernel"])
    assert np.abs(head_b - head_a).max() > 0, "head did not train"


def test_sharded_eval_steps_match_single_device():
    """Mesh-eval loss == single-device eval loss, pretrain and downstream
    (explicit-sharding eval constructors, VERDICT r2 weak #4)."""
    from sarssl_tpu.train import make_pretrain_eval_step, make_downstream_eval_step
    from sarssl_tpu.parallel import (make_sharded_pretrain_eval_step,
                                     make_sharded_downstream_eval_step)

    mesh = make_mesh(n_data=4, n_model=2)

    model, state = _setup()
    wave, _ = synth_batch(np.random.default_rng(7), 8, NSAMPLE)
    wave = jnp.asarray(wave)
    rng = jax.random.key(9)
    m1 = make_pretrain_eval_step(model, FEAT)(state, wave, rng)
    es, st_sh, b_sh = make_sharded_pretrain_eval_step(model, FEAT, mesh, state)
    m8 = es(jax.device_put(state, st_sh), jax.device_put(wave, b_sh), rng)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["diff"]) == pytest.approx(float(m8["diff"]), rel=1e-5)

    model_d, state_d = _setup(pretrain=False)
    wave, tdoa = synth_batch(np.random.default_rng(8), 8, NSAMPLE)
    wave = jnp.asarray(wave)
    gt = jnp.asarray(tdoa / 16000.0)
    m1 = make_downstream_eval_step(model_d, FEAT, task="TDOA")(
        state_d, wave, gt)
    es, st_sh, b_sh = make_sharded_downstream_eval_step(model_d, FEAT, mesh,
                                                        state_d, task="TDOA")
    m8 = es(jax.device_put(state_d, st_sh), jax.device_put(wave, b_sh),
            jax.device_put(gt, NamedSharding(mesh, P("data"))))
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["mae"]) == pytest.approx(float(m8["mae"]), rel=1e-5)
    # per-item outputs stay batch-sharded; values agree with single-device
    assert m8["pred"].sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(m8["pred"]), np.asarray(m1["pred"]),
                               atol=1e-5)


def test_ensemble_on_sharded_state(tmp_path):
    """The DownstreamLearner checkpoint/ensemble path works when the live
    state is mesh-sharded: save -> ensemble -> averaged params install."""
    from sarssl_tpu.train import checkpoint as ckpt
    from sarssl_tpu.train.learner import DownstreamLearner

    mesh = make_mesh(n_data=4, n_model=2)
    model, state = _setup(pretrain=False)
    step, st_sh, b_sh = make_sharded_downstream_step(model, FEAT, mesh, state,
                                                     donate=False)
    from sarssl_tpu.train import make_downstream_eval_step
    learner = DownstreamLearner(
        state=jax.device_put(state, st_sh), train_step=step,
        eval_step=make_downstream_eval_step(model, FEAT),
        lr_init=1e-3, ckpt_dir=str(tmp_path / "ck"), patience=2)

    wave, tdoa = synth_batch(np.random.default_rng(1), 8, NSAMPLE)
    wave = jax.device_put(jnp.asarray(wave), b_sh)
    gt = jax.device_put(jnp.asarray(tdoa / 16000.0),
                        NamedSharding(mesh, P("data")))
    for e in range(3):
        learner.train_epoch([(wave, gt)], jax.random.fold_in(jax.random.key(0), e))
        learner.end_epoch(1.0 - e * 0.1)  # improving -> 3 best epochs
    ens = learner.ensemble(k=3)
    # averaged params equal the mean of the saved epochs
    p0 = ckpt.load_checkpoint(ckpt.epoch_path(str(tmp_path / "ck"), 0))["params"]
    p2 = ckpt.load_checkpoint(ckpt.epoch_path(str(tmp_path / "ck"), 2))["params"]
    from flax import serialization
    ens_sd = serialization.to_state_dict(jax.device_get(ens))
    k0 = ens_sd["head_proj"]["kernel"]
    import numpy as _np
    p1 = ckpt.load_checkpoint(ckpt.epoch_path(str(tmp_path / "ck"), 1))["params"]
    want = (_np.asarray(p0["head_proj"]["kernel"])
            + _np.asarray(p1["head_proj"]["kernel"])
            + _np.asarray(p2["head_proj"]["kernel"])) / 3
    _np.testing.assert_allclose(_np.asarray(k0), want, atol=1e-6)


def test_host_data_sharding_helpers():
    """Per-host input sharding: disjoint strided splits; global batch
    assembly matches a plain sharded device_put on one process."""
    from sarssl_tpu.parallel import (shard_for_process,
                                     global_batch_from_local,
                                     host_batch_iterator)

    items = list(range(103))
    shards = [shard_for_process(items, pi, 4) for pi in range(4)]
    # equal-length shards (103 // 4 each; remainder dropped so per-host
    # batch counts agree and collective steps cannot deadlock)
    assert all(len(s) == 103 // 4 for s in shards)
    assert not set(shards[0]) & set(shards[1])        # disjoint
    assert len(set(sum(shards, []))) == 4 * (103 // 4)

    mesh = make_mesh(n_data=8, n_model=1)
    b_sh = batch_sharding(mesh)
    x = np.random.default_rng(0).standard_normal((8, 6, 2)).astype(np.float32)
    g = global_batch_from_local(x, b_sh)
    assert g.shape == (8, 6, 2)
    assert g.sharding.is_equivalent_to(b_sh, 3)
    np.testing.assert_array_equal(np.asarray(g), x)

    batches = [{"wave": x + i} for i in range(3)]
    out = list(host_batch_iterator(batches, b_sh))
    assert len(out) == 3
    np.testing.assert_array_equal(np.asarray(out[2]["wave"]), x + 2)
