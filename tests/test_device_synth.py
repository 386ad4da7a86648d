"""Device-resident synthesis: shapes, labels, physics sanity, jit/vmap."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.data.device_synth import (DeviceSynthConfig, synth_pair,
                                          synth_batch_device)

CFG = DeviceSynthConfig(nsample=16640)


def test_batch_shapes_and_labels():
    wave, labels = synth_batch_device(jax.random.key(0), 4, CFG)
    assert wave.shape == (4, 16640, 2)
    assert wave.dtype == jnp.float32
    w = np.asarray(wave)
    assert np.isfinite(w).all()
    np.testing.assert_allclose(np.abs(w).max(axis=(1, 2)), 0.9, atol=0.01)
    t60 = np.asarray(labels["T60"])
    assert ((t60 >= 0.2) & (t60 <= 1.0)).all()
    tdoa = np.asarray(labels["TDOA"])
    assert (np.abs(tdoa) <= 0.20 / 343.0 + 1e-9).all()


def test_tdoa_is_physically_observable():
    """Cross-correlation of the generated pair should peak near the labeled
    TDOA (direct path dominates for low T60)."""
    cfg = DeviceSynthConfig(nsample=16640, t60_range=(0.2, 0.3),
                            snr_range=(40.0, 40.0),
                            mic_dist_range=(0.15, 0.20))
    hits, total = 0, 0
    for i in range(8):
        wave, labels = synth_pair(jax.random.key(i), cfg)
        want = float(labels["TDOA"]) * cfg.fs
        if abs(want) < 2.0:  # near-broadside: integer-lag xcorr is ambiguous
            continue
        total += 1
        w = np.asarray(wave)
        x0, x1 = w[:, 0], w[:, 1]
        corr = np.correlate(x1 - x1.mean(), x0 - x0.mean(), "full")
        lag = np.argmax(np.abs(corr)) - (len(x0) - 1)
        if abs(lag - want) <= 2.5:
            hits += 1
    assert total >= 2, "unlucky geometry draw: no off-broadside cases"
    assert hits >= total - 1, f"only {hits}/{total} TDOA peaks matched"


def test_determinism():
    w1, l1 = synth_batch_device(jax.random.key(5), 2, CFG)
    w2, l2 = synth_batch_device(jax.random.key(5), 2, CFG)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_feeds_training_step():
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
    from sarssl_tpu.train import create_train_state, make_pretrain_step

    # small nfft profile (CLAUDE.md: step-heavy tests stay off the 256-bin
    # flagship feature shape)
    cfg = DeviceSynthConfig(nsample=576, nfft=128, hop=64)
    feat = FeatureConfig(win_len=128, nfft=128)
    nt = feat.num_frames(576)
    mcfg = SARSSLConfig().tiny(sig_shape=(64, nt, 2, 2), patch_shape=(64, 1),
                               spec_dembed=32, spat_dembed=16)
    model = SARSSL(mcfg)
    x0 = jnp.zeros((4, 2, 64, nt, 2))
    m0 = gen_patch_mask(jax.random.key(0), 4, mcfg.npatch,
                        mcfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    step = make_pretrain_step(model, feat, donate=False)
    wave, _ = synth_batch_device(jax.random.key(2), 4, cfg)
    state, m = step(state, wave, 1e-3, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
