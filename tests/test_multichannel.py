"""4-channel arrays through the full pipeline: pair expansion in the step,
MM mode, and the SARSSLMultiCH head on paired features."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig, SARSSLMultiCH
from sarssl_tpu.ops import FeatureConfig, stft_features, gen_patch_mask
from sarssl_tpu.train import create_train_state, make_pretrain_step

NSAMPLE = 2304
CFG = SARSSLConfig().tiny(sig_shape=(256, 8, 2, 2), patch_shape=(256, 1),
                          spec_dembed=32, spat_dembed=16)


def _wave(nb, nch, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal((nb, NSAMPLE, nch)).astype(np.float32)
                       * 0.1)


def test_4ch_m_mode_pretrain_step():
    """4 mics -> 3 ref-paired 2-ch items per utterance; one train step runs."""
    model = SARSSL(CFG)
    nb = 4
    feats = stft_features(_wave(nb, 4), FeatureConfig(ch_mode="M"))
    assert feats.shape[0] == nb * 3
    x0 = jnp.zeros_like(feats)
    mask = gen_patch_mask(jax.random.key(0), nb * 3, CFG.npatch,
                          CFG.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, mask)
    step = make_pretrain_step(model, FeatureConfig(ch_mode="M"), donate=False)
    state, m = step(state, _wave(nb, 4), 1e-3, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_4ch_mm_mode_features():
    feats = stft_features(_wave(2, 4), FeatureConfig(ch_mode="MM"))
    assert feats.shape[0] == 2 * 6  # all unordered pairs


def test_multich_head_on_paired_features():
    nmic_pair = 3
    feats = stft_features(_wave(2, 4), FeatureConfig(ch_mode="M"))
    model = SARSSLMultiCH(CFG, nmic_pair=nmic_pair, task="TDOA")
    v = model.init({"params": jax.random.key(0)}, feats, False)
    pred, joint = model.apply(v, feats, False)
    assert pred.shape == (2, nmic_pair)
    assert np.isfinite(np.asarray(pred)).all()
