"""4-channel arrays through the full pipeline: pair expansion in the step,
MM mode, and the SARSSLMultiCH head on paired features."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig, SARSSLMultiCH
from sarssl_tpu.ops import FeatureConfig, stft_features, gen_patch_mask
from sarssl_tpu.train import create_train_state, make_pretrain_step

from tiny import NSAMPLE, CFG, feat


def _wave(nb, nch, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal((nb, NSAMPLE, nch)).astype(np.float32)
                       * 0.1)


def test_4ch_m_mode_pretrain_step():
    """4 mics -> 3 ref-paired 2-ch items per utterance; one train step runs."""
    model = SARSSL(CFG)
    nb = 2
    feats = stft_features(_wave(nb, 4), feat(ch_mode="M"))
    assert feats.shape[0] == nb * 3
    x0 = jnp.zeros_like(feats)
    mask = gen_patch_mask(jax.random.key(0), nb * 3, CFG.npatch,
                          CFG.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, mask)
    step = make_pretrain_step(model, feat(ch_mode="M"), donate=False)
    state, m = step(state, _wave(nb, 4), 1e-3, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_4ch_mm_mode_features():
    feats = stft_features(_wave(2, 4), feat(ch_mode="MM"))
    assert feats.shape[0] == 2 * 6  # all unordered pairs


def test_multich_head_on_paired_features():
    nmic_pair = 3
    feats = stft_features(_wave(2, 4), feat(ch_mode="M"))
    model = SARSSLMultiCH(CFG, nmic_pair=nmic_pair, task="TDOA")
    v = model.init({"params": jax.random.key(0)}, feats, False)
    pred, joint = model.apply(v, feats, False)
    assert pred.shape == (2, nmic_pair)
    assert np.isfinite(np.asarray(pred)).all()


def test_pairwise_tdoa_expansion():
    from sarssl_tpu.ops.pairs import pairwise_tdoa

    t_ref = jnp.asarray([[1.0, 2.0, 3.0]])  # mics 1..3 vs mic 0
    m = pairwise_tdoa(t_ref, 4, "M")
    np.testing.assert_allclose(np.asarray(m), [[1.0, 2.0, 3.0]])
    mm = pairwise_tdoa(t_ref, 4, "MM")
    # triu pairs (0,1),(0,2),(0,3),(1,2),(1,3),(2,3): t_j - t_i
    np.testing.assert_allclose(np.asarray(mm),
                               [[1.0, 2.0, 3.0, 1.0, 2.0, 1.0]])


def test_downstream_cli_4ch_mm(tmp_path):
    """4-ch MM smoke through the CLI: multi-pair head + per-pair MAEs."""
    from sarssl_tpu.cli.run_downstream import main

    rc = main(["--smoke", "--nmic", "4", "--ch-mode", "MM",
               "--exp-dir", str(tmp_path)])
    assert rc in (0, None)


def test_multipair_eval_reports_per_pair_mae():
    from sarssl_tpu.ops import FeatureConfig
    from sarssl_tpu.train import create_train_state
    from sarssl_tpu.train.steps import make_downstream_eval_step
    from sarssl_tpu.data.synthetic import synth_batch_multich
    from sarssl_tpu.ops.pairs import pairwise_tdoa

    fc = feat(ch_mode="MM")
    model = SARSSLMultiCH(CFG, nmic_pair=6, task="TDOA")
    wave, tdoa = synth_batch_multich(np.random.default_rng(0), 2, NSAMPLE, 4)
    feats = stft_features(jnp.asarray(wave), fc)
    state = create_train_state(model, jax.random.key(0), feats, None)
    ev = make_downstream_eval_step(model, fc, task="TDOA", dlabel=6)
    gt = pairwise_tdoa(jnp.asarray(tdoa / 16000.0), 4, "MM")
    m = ev(state, jnp.asarray(wave), gt)
    assert m["mae_dims"].shape == (6,)
    assert np.isfinite(np.asarray(m["mae_dims"])).all()
