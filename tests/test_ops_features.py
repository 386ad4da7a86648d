"""Feature pipeline parity vs a torch re-enactment of STFTLearner.data_preprocess."""
import numpy as np

import jax.numpy as jnp

from sarssl_tpu.ops import stft_features, FeatureConfig


def _torch_preprocess(sig, eps=1e-6):
    """Oracle reproducing learner.py:525-553 semantics with torch ops."""
    import torch

    x = torch.from_numpy(sig)
    win = torch.hann_window(512)
    chs = [
        torch.stft(x[:, :, c], n_fft=512, hop_length=256, win_length=512,
                   window=win, center=False, return_complex=True)
        for c in range(x.shape[-1])
    ]
    stft = torch.stack(chs, dim=1)  # (nb, nch, nf, nt)
    mag = torch.abs(stft[:, 0:1])
    mean = mag.reshape(mag.shape[0], -1).mean(dim=1)[:, None, None, None]
    stft = stft / (mean + eps)
    # 2-ch: AddChToBatch('M') is identity
    reim = torch.view_as_real(stft)  # (nb, nch, nf, nt, 2)
    return reim[:, :, 1:257].numpy()


def test_features_match_torch_oracle():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((2, 4096, 2)).astype(np.float32) * 0.1
    ours = np.asarray(stft_features(jnp.asarray(sig)))
    ref = _torch_preprocess(sig)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=0)


def test_features_full_shape():
    cfg = FeatureConfig()
    sig = jnp.zeros((2, 65792, 2))
    out = stft_features(sig, cfg)
    assert out.shape == (2, 2, 256, 256, 2)


def test_features_4ch_pairs():
    sig = jnp.zeros((2, 4096, 4))
    out = stft_features(sig)
    assert out.shape == (6, 2, 256, 15, 2)


def test_mel_filterbank_properties():
    import numpy as np
    from sarssl_tpu.ops.features import mel_filterbank

    fb = np.asarray(mel_filterbank(30, 257, 16000))
    assert fb.shape == (30, 257)
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-6
    # triangles: each filter unimodal with a single peak
    for m in range(30):
        peak = fb[m].argmax()
        assert (np.diff(fb[m][:peak + 1]) >= -1e-9).all()
        assert (np.diff(fb[m][peak:]) <= 1e-9).all()
    # HTK mel spacing: centers increase and spread out with frequency
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) > 0).all()
    assert np.diff(centers)[-1] > np.diff(centers)[0]


def test_mel_features_shape():
    import numpy as np
    import jax.numpy as jnp
    from sarssl_tpu.ops import FeatureConfig, stft_features

    cfg = FeatureConfig(mel_bins=30)
    sig = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 2304, 2)).astype(np.float32))
    feats = stft_features(sig, cfg)
    assert feats.shape == (2, 2, 30, cfg.num_frames(2304), 2)
    assert np.isfinite(np.asarray(feats)).all()


def test_fast_path_matches_fft_path():
    """The interleaved single-matmul fast path (mel=0, ratio=1.0) must agree
    with the generic fft path for every channel mode and mic count."""
    rng = np.random.default_rng(1)
    for nch in (2, 4):
        sig = jnp.asarray(rng.standard_normal((2, 8192, nch)).astype("float32"))
        for mode in ("M", "MM"):
            fast = stft_features(sig, FeatureConfig(ch_mode=mode))
            ref = stft_features(sig, FeatureConfig(ch_mode=mode,
                                                   stft_impl="fft"))
            assert fast.shape == ref.shape
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       atol=2e-5)


def test_fre_used_ratio_half_general_path():
    sig = jnp.zeros((1, 4096, 2))
    out = stft_features(sig, FeatureConfig(fre_used_ratio=0.5))
    assert out.shape == (1, 2, 128, 15, 2)
