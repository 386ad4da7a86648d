"""Training runtime: schedules, jitted steps, loss decreases end-to-end,
checkpoint roundtrip, partial loading, ensembling, early stopping."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
from sarssl_tpu.train import (
    cosine_schedule, create_train_state, make_pretrain_step,
    make_pretrain_eval_step, make_downstream_step, make_downstream_eval_step,
    save_checkpoint, load_checkpoint, partial_load, ensemble_params,
    EarlyStopping, smooth_data,
)
from sarssl_tpu.train.checkpoint import restore_state, latest_path, best_path
from sarssl_tpu.train.state import make_adam
from sarssl_tpu.data import synth_batch

from tiny import NSAMPLE, FEAT, CFG  # shared tiny step profile


def _state_and_model(pretrain=True, seed=0):
    cfg = CFG if pretrain else SARSSLConfig(**{**CFG.__dict__, "pretrain": False})
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x = jnp.zeros((2, nmic, nf, nt, nreim))
    mask = gen_patch_mask(jax.random.key(0), 2, cfg.npatch,
                          cfg.effective_nmasked()) if pretrain else None
    state = create_train_state(model, jax.random.key(seed), x, mask)
    return model, state


def test_cosine_schedule_endpoints():
    sched = cosine_schedule(30, 1e-3)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(30) == pytest.approx(0.0, abs=1e-9)
    assert sched(15) == pytest.approx(5e-4, rel=1e-6)


def test_pretrain_loss_decreases():
    model, state = _state_and_model()
    step = make_pretrain_step(model, FEAT, donate=False)
    rng = np.random.default_rng(0)
    wave, _ = synth_batch(rng, 8, NSAMPLE)
    wave = jnp.asarray(wave)
    losses = []
    key = jax.random.key(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, wave, 1e-3, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses


def test_downstream_step_runs_and_learns():
    model, state = _state_and_model(pretrain=False)
    step = make_downstream_step(model, FEAT, task="TDOA", donate=False)
    eval_step = make_downstream_eval_step(model, FEAT, task="TDOA")
    rng = np.random.default_rng(0)
    wave, tdoa = synth_batch(rng, 8, NSAMPLE)
    wave, gt = jnp.asarray(wave), jnp.asarray(tdoa / 16000.0)
    key = jax.random.key(0)
    first = None
    for i in range(25):
        key, sub = jax.random.split(key)
        state, m = step(state, wave, gt, 1e-3, sub)
        if first is None:
            first = float(m["loss"])
    final = eval_step(state, wave, gt)
    assert float(final["loss"]) < first


def test_lr_change_does_not_recompile():
    model, state = _state_and_model()
    step = make_pretrain_step(model, FEAT, donate=False)
    wave = jnp.asarray(synth_batch(np.random.default_rng(0), 8, NSAMPLE)[0])
    key = jax.random.key(0)
    state, _ = step(state, wave, 1e-3, key)
    n0 = step._cache_size()
    state, _ = step(state, wave, 5e-4, key)
    assert step._cache_size() == n0


def test_checkpoint_roundtrip(tmp_path):
    model, state = _state_and_model()
    d = str(tmp_path)
    save_checkpoint(d, state, epoch=3, max_score=-0.5, is_best=True)
    assert os.path.exists(latest_path(d)) and os.path.exists(best_path(d))
    payload = load_checkpoint(latest_path(d))
    assert payload["meta"]["epoch"] == 3
    _, fresh = _state_and_model(seed=1)
    restored = restore_state(fresh, payload)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_load_pretrain_to_downstream(tmp_path):
    """Encoder weights transfer across pretext->downstream pytree changes
    (reference run_downstream.py:253-256)."""
    from flax import serialization

    _, pre_state = _state_and_model(pretrain=True)
    _, ds_state = _state_and_model(pretrain=False, seed=7)
    src_sd = serialization.to_state_dict(jax.device_get(pre_state.params))
    new_params, loaded = partial_load(ds_state.params, src_sd)
    assert any(k.startswith("spec_encoder") for k in loaded)
    assert any(k.startswith("spat_encoder") for k in loaded)
    assert not any(k.startswith("decoder") for k in loaded)  # ds model has no decoder
    # loaded encoder weights equal the pretrain ones
    got = serialization.to_state_dict(jax.device_get(new_params))
    from flax.traverse_util import flatten_dict
    got_flat = flatten_dict(got)
    src_flat = flatten_dict(src_sd)
    for k in got_flat:
        if k in src_flat and "/".join(map(str, k)) in loaded:
            np.testing.assert_array_equal(got_flat[k], src_flat[k])


def test_partial_load_across_nt(tmp_path):
    """Encoder transfer across DIFFERENT frame counts — the flagship TDOA
    path loads a T=4.112 s (nt=256) pretrain checkpoint into a T=1.04 s
    (nt=64) downstream model; every encoder param must map (encoders are
    nt-independent: relative-position attention, patch-shaped convs)."""
    import jax.numpy as jnp
    from flax import serialization
    from flax.traverse_util import flatten_dict
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import gen_patch_mask
    from sarssl_tpu.train import create_train_state

    def st(nt, pretrain):
        cfg = SARSSLConfig(dtype="float32", pretrain=pretrain).tiny(
            sig_shape=(64, nt, 2, 2), patch_shape=(64, 1),
            spec_dembed=32, spat_dembed=16, pretrain=pretrain)
        m = SARSSL(cfg)
        x = jnp.zeros((2, 2, 64, nt, 2))
        msk = gen_patch_mask(jax.random.key(0), 2, cfg.npatch,
                             cfg.effective_nmasked()) if pretrain else None
        return create_train_state(m, jax.random.key(0), x, msk)

    pre, ds = st(8, True), st(4, False)
    src = serialization.to_state_dict(jax.device_get(pre.params))
    _, loaded = partial_load(ds.params, src)
    enc = [k for k in flatten_dict(serialization.to_state_dict(
        jax.device_get(ds.params)))
        if k[0] in ("spec_encoder", "spat_encoder")]
    loaded_enc = [k for k in loaded
                  if k.startswith(("spec_encoder", "spat_encoder"))]
    assert len(loaded_enc) == len(enc), (len(loaded_enc), len(enc))


def test_ensemble_params_is_mean():
    _, s1 = _state_and_model(seed=1)
    _, s2 = _state_and_model(seed=2)
    avg = ensemble_params([jax.device_get(s1.params), jax.device_get(s2.params)])
    l1 = jax.tree.leaves(jax.device_get(s1.params))[0]
    l2 = jax.tree.leaves(jax.device_get(s2.params))[0]
    la = jax.tree.leaves(avg)[0]
    np.testing.assert_allclose(la, (np.asarray(l1) + np.asarray(l2)) / 2, rtol=1e-6)


def test_early_stopping_and_smoothing():
    es = EarlyStopping(patience=3)
    assert es.update(1.0)
    assert not es.update(0.5)
    assert not es.update(0.4)
    assert not es.update(0.3)
    assert es.stopped
    s = smooth_data([1.0, 0.0, 0.0, 0.0], alpha=0.5)
    assert s == [1.0, 0.5, 0.25, 0.125]


def test_fresh_optimizer_reset():
    model, state = _state_and_model()
    step = make_pretrain_step(model, FEAT, donate=False)
    wave = jnp.asarray(synth_batch(np.random.default_rng(0), 8, NSAMPLE)[0])
    state, _ = step(state, wave, 1e-3, jax.random.key(0))

    def mu_leaves(st):
        # ScaleByAdamState(count, mu, nu): pick the momentum pytree, not the
        # scalar step counter
        adam = jax.tree.leaves(
            st.opt_state.inner_state,
            is_leaf=lambda x: hasattr(x, "mu"))[0]
        return jax.tree.leaves(adam.mu)

    assert max(float(jnp.abs(m).max()) for m in mu_leaves(state)) > 0
    state2 = state.reset_optimizer()
    assert all(float(jnp.abs(m).max()) == 0 for m in mu_leaves(state2))


def test_learner_ensemble_averages_batch_stats(tmp_path):
    """Ensembling covers the full state dict including BN running stats
    (reference learner.py:302-331 averages the whole state dict)."""
    from flax import serialization
    from sarssl_tpu.train.learner import DownstreamLearner
    from sarssl_tpu.train import checkpoint as ckpt

    _, state = _state_and_model(seed=0)
    learner = DownstreamLearner(state=state, train_step=None, eval_step=None,
                                lr_init=1e-3, ckpt_dir=str(tmp_path))

    stats = []
    for e in (0, 1):
        bs = jax.tree.map(lambda x: jnp.asarray(x) + float(e + 1),
                          state.batch_stats)
        st = state.replace(batch_stats=bs)
        ckpt.save_checkpoint(str(tmp_path), st, epoch=e, max_score=0.0,
                             keep_epoch=True)
        stats.append(jax.device_get(bs))
        learner.best_epochs.append(e)

    learner.ensemble(k=2)
    payload = ckpt.load_checkpoint(ckpt.ensemble_path(str(tmp_path)))
    got = serialization.from_state_dict(jax.device_get(state.batch_stats),
                                        payload["batch_stats"])
    want = jax.tree.map(lambda a, b: (np.asarray(a) + np.asarray(b)) / 2,
                        *stats)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_frozen_params_immune_to_weight_decay():
    """trainable_mask must hold frozen params exactly still even under
    adamw's decoupled weight decay (which ignores zeroed gradients)."""
    from flax.traverse_util import flatten_dict
    from flax import serialization
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.train import make_downstream_step
    from sarssl_tpu.train.state import create_train_state, make_adam
    from sarssl_tpu.train.checkpoint import trainable_mask_from_loaded
    from sarssl_tpu.data import synth_batch

    cfg = SARSSLConfig(**{**CFG.__dict__, "pretrain": False})
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x = jnp.zeros((2, nmic, nf, nt, nreim))
    state = create_train_state(model, jax.random.key(0), x, None,
                               tx=make_adam(1e-2, weight_decay=0.1))

    sd = flatten_dict(serialization.to_state_dict(jax.device_get(state.params)))
    frozen_keys = ["/".join(map(str, k)) for k in sd
                   if k[0] in ("spec_encoder", "spat_encoder")]
    tmask = trainable_mask_from_loaded(state.params, frozen_keys)
    step = make_downstream_step(model, FEAT, task="TDOA", donate=False,
                                trainable_mask=tmask)
    wave, tdoa = synth_batch(np.random.default_rng(0), 8, NSAMPLE)
    state2, m = step(state, jnp.asarray(wave),
                     jnp.asarray(tdoa / 16000.0), 1e-2, jax.random.key(1))
    before = flatten_dict(serialization.to_state_dict(
        jax.device_get(state.params)))
    after = flatten_dict(serialization.to_state_dict(
        jax.device_get(state2.params)))
    for k in before:
        if k[0] in ("spec_encoder", "spat_encoder"):
            np.testing.assert_array_equal(before[k], after[k],
                                          err_msg=f"frozen moved: {k}")
    assert np.abs(np.asarray(before[("head_proj", "kernel")])
                  - np.asarray(after[("head_proj", "kernel")])).max() > 0


def test_f16_export_restore_roundtrip(tmp_path):
    """scripts/export_ckpt_f16: export drops opt_state and halves floats;
    restore yields an f32 params-only checkpoint whose values match the
    original to f16 resolution and that partial_load consumes cleanly."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from export_ckpt_f16 import export_f16, restore_f32

    model, state = _state_and_model()
    d = str(tmp_path)
    save_checkpoint(d, state, epoch=7, max_score=-0.3, is_best=True)
    f16_path = os.path.join(d, "best_f16.msgpack")
    export_f16(best_path(d), f16_path)
    assert os.path.getsize(f16_path) < os.path.getsize(best_path(d)) / 2

    rdir = os.path.join(d, "restored")
    restore_f32(f16_path, os.path.join(rdir, "best_model.msgpack"))
    payload = load_checkpoint(os.path.join(rdir, "best_model.msgpack"))
    assert "opt_state" not in payload
    assert payload["meta"]["epoch"] == 7

    from flax.traverse_util import flatten_dict
    from flax import serialization
    orig = flatten_dict(serialization.to_state_dict(jax.device_get(state.params)))
    rest = flatten_dict(payload["params"])
    for k, v in orig.items():
        r = rest[k]
        assert np.asarray(r).dtype == np.float32
        np.testing.assert_allclose(np.asarray(v), np.asarray(r),
                                   rtol=2e-3, atol=2e-4)

    new_params, loaded = partial_load(state.params, payload["params"])
    assert loaded
    for leaf in jax.tree.leaves(new_params):
        assert np.asarray(leaf).dtype == np.float32
