"""Vendored P.862 perceptual model: qualitative PESQ properties."""
import numpy as np

from sarssl_tpu.utils.pesq import pesq_wb

FS = 16000


def _speechish(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    src = rng.standard_normal(n)
    for _ in range(2):
        src[1:] += 0.9 * src[:-1]
    src *= (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)) ** 2
    return src / np.abs(src).max()


def test_identity_hits_ceiling():
    x = _speechish(2 * FS)
    assert pesq_wb(x, x) > 4.5


def test_monotone_in_snr():
    x = _speechish(2 * FS)
    rng = np.random.default_rng(1)
    scores = []
    for snr in (30, 20, 10, 0):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x ** 2) / 10 ** (snr / 10) / np.mean(n ** 2))
        scores.append(pesq_wb(x, x + n))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.0 and scores[-1] < 2.0


def test_gain_invariant_and_range():
    x = _speechish(FS)
    assert pesq_wb(x, 0.25 * x) > 4.4
    y = np.random.default_rng(2).standard_normal(len(x))
    s = pesq_wb(x, y)
    assert 1.0 <= s <= 1.6
