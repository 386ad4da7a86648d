"""Perceptual speech-quality metric (PESQ, ITU-T P.862.2 wideband shape).

The reference reports PESQ on pretext reconstructions through torchmetrics
(/root/reference/code/learner.py:604-615). Neither torchmetrics nor the
``pesq`` package ship in this environment, so this module implements the
P.862 perceptual model in NumPy for the *pre-aligned* case — in the SAR-SSL
pretext evaluation, prediction and target come from the same STFT frames,
so the reference/degraded signals are sample-aligned by construction and
P.862's utterance time-alignment search is the identity.

Pipeline (the published P.862 structure):
  1. level alignment to a fixed active-speech power;
  2. Hann-windowed power spectra (512/256 at 16 kHz);
  3. Bark-band integration (49 bands on a Zwicker Bark axis — P.862's
     hand-tuned band tables are replaced by the standard Bark formula);
  4. partial frequency-response compensation of the degraded spectrum;
  5. per-frame gain compensation (bounded, smoothed);
  6. Zwicker loudness transform;
  7. symmetric + asymmetric disturbance with masking;
  8. L6-over-subintervals / L2-over-time aggregation;
  9. raw score 4.5 - 0.1 d_sym - 0.0309 d_asym, mapped to MOS-LQO with the
     P.862.2 logistic.

If the real ``pesq`` package (or torchmetrics) is importable it is used
instead, making this a faithful fallback rather than a replacement.
"""
from __future__ import annotations

import numpy as np

_SPL_TARGET = 1e7     # P.862 level-alignment target power
_NBARK = 49
_GAMMA = 0.23         # Zwicker compactness exponent


def _external_pesq():
    try:
        from pesq import pesq as _p

        return lambda ref, deg, fs: float(_p(fs, ref, deg, "wb"))
    except ImportError:
        pass
    try:
        from torchmetrics.functional.audio.pesq import (
            perceptual_evaluation_speech_quality)
        import torch

        return lambda ref, deg, fs: float(perceptual_evaluation_speech_quality(
            torch.from_numpy(deg), torch.from_numpy(ref), fs, "wb"))
    except ImportError:
        return None


def _bark_edges(fs: int, nfft: int):
    """FFT-bin -> Bark-band assignment on the Zwicker Bark axis."""
    freqs = np.arange(nfft // 2 + 1) * fs / nfft
    bark = 13.0 * np.arctan(0.00076 * freqs) + \
        3.5 * np.arctan((freqs / 7500.0) ** 2)
    idx = np.minimum((bark / bark[-1] * _NBARK).astype(int), _NBARK - 1)
    centers = np.array([freqs[idx == b].mean() if np.any(idx == b) else 0.0
                        for b in range(_NBARK)])
    return idx, centers


def _hearing_threshold(freq_hz: np.ndarray) -> np.ndarray:
    """Absolute threshold in power units (Terhardt approximation)."""
    f = np.maximum(freq_hz, 20.0) / 1000.0
    tq_db = (3.64 * f ** -0.8 - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
             + 1e-3 * f ** 4)
    return 10.0 ** (np.clip(tq_db, -10, 96) / 10.0)


def _bark_spectra(x: np.ndarray, fs: int, nfft: int, hop: int, bark_idx):
    n = (len(x) - nfft) // hop + 1
    if n <= 0:
        raise ValueError("signal shorter than one PESQ frame")
    win = np.hanning(nfft)
    idx = np.arange(nfft)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * win
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n, nfft/2+1)
    bands = np.zeros((n, _NBARK))
    np.add.at(bands.T, bark_idx, spec.T)
    return bands


def _loudness(bands: np.ndarray, p0: np.ndarray) -> np.ndarray:
    """Zwicker loudness per Bark band."""
    sl = (p0 / 0.5) ** _GAMMA
    ratio = np.maximum(bands / p0[None, :], 0.0)
    loud = sl[None, :] * ((0.5 + 0.5 * ratio) ** _GAMMA - 1.0)
    return np.maximum(loud, 0.0)


def _lp(x: np.ndarray, p: float, axis=None) -> np.ndarray:
    return np.mean(np.abs(x) ** p, axis=axis) ** (1.0 / p)


_EXT_PESQ = ...  # resolved once on first use (import attempts are slow)


def pesq_wb(ref: np.ndarray, deg: np.ndarray, fs: int = 16000) -> float:
    """Wideband PESQ MOS-LQO of a (pre-aligned) degraded signal.

    Uses the external P.862 implementation when installed; its per-utterance
    errors (e.g. no-utterance detection) PROPAGATE so callers record NaN
    rather than silently mixing the vendored approximation's score scale
    into the same average."""
    global _EXT_PESQ
    if _EXT_PESQ is ...:
        _EXT_PESQ = _external_pesq()
    if _EXT_PESQ is not None:
        return _EXT_PESQ(np.asarray(ref, np.float32),
                         np.asarray(deg, np.float32), fs)
    return _pesq_wb_numpy(np.asarray(ref, np.float64).ravel(),
                          np.asarray(deg, np.float64).ravel(), fs)


def _pesq_wb_numpy(ref: np.ndarray, deg: np.ndarray, fs: int) -> float:
    assert fs in (8000, 16000), fs
    nfft = 512 if fs == 16000 else 256
    hop = nfft // 2
    n = min(len(ref), len(deg))
    ref, deg = ref[:n] - ref[:n].mean(), deg[:n] - deg[:n].mean()

    # 1. level alignment
    def align(x):
        p = np.mean(x ** 2) + 1e-20
        return x * np.sqrt(_SPL_TARGET / p)

    ref, deg = align(ref), align(deg)

    bark_idx, centers = _bark_edges(fs, nfft)
    p0 = _hearing_threshold(np.where(centers > 0, centers, 20.0))

    br = _bark_spectra(ref, fs, nfft, hop, bark_idx)
    bd = _bark_spectra(deg, fs, nfft, hop, bark_idx)

    # speech-active frames of the reference (energy gate)
    frame_pow = br.sum(axis=1)
    active = frame_pow > 1e-2 * np.maximum(frame_pow.max(), 1e-20)
    if not np.any(active):
        active = np.ones_like(frame_pow, bool)

    # 4. partial frequency compensation: scale the degraded bands by the
    # bounded mean ratio so pure linear filtering is mostly forgiven
    mean_r = br[active].mean(axis=0) + 1000.0
    mean_d = bd[active].mean(axis=0) + 1000.0
    band_gain = np.clip(mean_r / mean_d, 10.0 ** -2, 10.0 ** 2)
    bd = bd * band_gain[None, :]

    # 5. bounded, smoothed per-frame gain compensation
    raw_gain = (br.sum(axis=1) + 5e3) / (bd.sum(axis=1) + 5e3)
    gain = np.empty_like(raw_gain)
    g = 1.0
    for t, r in enumerate(np.clip(raw_gain, 3e-4, 5.0)):
        g = 0.8 * g + 0.2 * r
        gain[t] = g
    bd = bd * gain[:, None]

    # 6. loudness
    lr = _loudness(br, p0)
    ld = _loudness(bd, p0)

    # 7. disturbance with masking
    diff = ld - lr
    mask = 0.25 * np.minimum(ld, lr)
    d = np.where(diff > mask, diff - mask,
                 np.where(diff < -mask, diff + mask, 0.0))

    # asymmetry factor: additive distortions annoy more than omissions
    asym = ((bd + 50.0) / (br + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))
    d_asym = d * asym

    # 8. frame disturbances: band norms normalized by loudness (uniform
    # Bark-band weights reduce to identity and are omitted)
    frame_sym = _lp(d, 3.0, axis=1)
    frame_asym = np.sum(np.abs(d_asym), axis=1)
    denom = (lr.sum(axis=1) + 1e5) ** 0.04
    frame_sym = np.minimum(frame_sym / denom, 45.0)
    frame_asym = np.minimum(frame_asym / denom, 45.0)

    # 9. L6 over 20-frame subintervals, L2 over subintervals
    def aggregate(fd):
        step = 10
        chunks = [fd[s:s + 20] for s in range(0, max(len(fd) - 10, 1), step)]
        l6 = np.array([_lp(c, 6.0) for c in chunks if len(c)])
        return _lp(l6, 2.0)

    d_sym = aggregate(frame_sym[active])
    d_asy = aggregate(frame_asym[active])

    raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asy
    # P.862.2 MOS-LQO mapping
    mos = 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return float(np.clip(mos, 1.0, 4.644))
