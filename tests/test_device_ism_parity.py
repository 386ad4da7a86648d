"""Device CTF synth vs the host ISM engine (VERDICT r3 next #4).

Pins the generator-gap closure: the device-resident synthesis model
(data/device_synth.ctf_frames) must agree with the offline image-source
engine (data/ism.simulate_rir_single) that produces the downstream corpora —
same scene, same reflection model:

  1. early transfer function: the frame-binned CTF assembled back into a
     transfer function matches the DFT of the ISM RIR's early segment;
  2. EDC-T60: a time-domain RIR reconstructed from the CTF frames has the
     specified T60 under the same Schroeder/linregress estimator the
     reference uses to validate gpuRIR outputs
     (utils_simu_rir_sig.py:526-614).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.data.device_synth import DeviceSynthConfig, ctf_frames
from sarssl_tpu.data.ism import simulate_rir_single
from sarssl_tpu.data.annotations import t60_from_rir

FS = 16000
ROOM = np.array([6.0, 5.0, 3.0])
SRC = np.array([2.0, 3.1, 1.6])
MICS = np.array([[3.9, 2.45, 1.5], [3.9, 2.55, 1.5]])


def _beta(room, t60):
    V = float(np.prod(room))
    S = 2 * (room[0] * room[1] + room[0] * room[2] + room[1] * room[2])
    alpha = np.clip(0.161 * V / (S * t60), 0.02, 0.95)
    return np.sqrt(1.0 - alpha) * np.ones(6)


def _ctf(t60, cfg):
    H = ctf_frames(jax.random.key(0), jnp.asarray(ROOM), jnp.asarray(t60),
                   jnp.asarray(_beta(ROOM, t60)), jnp.asarray(MICS),
                   jnp.asarray(SRC), cfg)
    return np.asarray(H)  # (2, J, nf)


def _rir_from_ctf(H, cfg):
    """Time-domain RIR from CTF frames: irfft each frame (residuals are
    within +-hop/2 samples, so rolling by hop keeps them unwrapped) and
    overlap-place at j*hop."""
    nmic, J, _ = H.shape
    hop, nfft = cfg.hop, cfg.nfft
    frames = np.fft.irfft(H, n=nfft, axis=-1)        # (2, J, nfft)
    frames = np.roll(frames, hop, axis=-1)           # content in [0, 2*hop)
    rir = np.zeros((nmic, (J + 2) * hop + nfft))
    for j in range(J):
        start = j * hop  # true position j*hop - hop, shifted +hop by roll
        rir[:, start:start + nfft] += frames[:, j]
    return rir[:, hop:]  # undo the roll shift


def test_early_transfer_function_matches_ism():
    """Frames covering [0, 40 ms) assemble to the same transfer function as
    the DFT (at STFT bin frequencies) of the ISM RIR's first 40 ms."""
    t60 = 0.4
    cfg = DeviceSynthConfig()
    H = _ctf(t60, cfg)

    rir = simulate_rir_single(ROOM, _beta(ROOM, t60), SRC, MICS, FS, t60)
    # frames 0..2 hold images binned by round(tau*fs/hop) <= 2, i.e. taus in
    # [0, 2.5*hop) samples = [0, 40 ms); add the windowed-sinc spill margin
    n_lim = int(2.5 * cfg.hop)
    seg = np.array(rir[:, :n_lim + 8], np.float64)
    # DFT at the STFT bin frequencies f_i = i*fs/nfft == folded rfft
    pad = (-seg.shape[1]) % cfg.nfft
    seg = np.pad(seg, ((0, 0), (0, pad)))
    href = np.fft.rfft(seg.reshape(2, -1, cfg.nfft).sum(1), axis=-1)

    phase = np.exp(-2j * np.pi
                   * np.arange(cfg.nf)[None, :] * (cfg.fs / cfg.nfft)
                   * (np.arange(3) * cfg.hop / cfg.fs)[:, None])  # (3, nf)
    hdev = np.einsum("mjf,jf->mf", H[:, :3], phase)

    # compare away from DC/Nyquist where the 16-tap windowed sinc rolls off
    band = slice(int(0.05 * cfg.nf), int(0.8 * cfg.nf))
    err = (np.linalg.norm(hdev[:, band] - href[:, band], axis=1)
           / np.linalg.norm(href[:, band], axis=1))
    assert (err < 0.12).all(), f"early TF mismatch: rel err {err}"


@pytest.mark.parametrize("t60", [0.3, 0.6, 0.9])
def test_edc_t60_matches_spec_and_ism(t60):
    cfg = DeviceSynthConfig()
    rir_dev = _rir_from_ctf(_ctf(t60, cfg), cfg)
    t60_dev, corr_dev = t60_from_rir(rir_dev[0], FS)

    rir_ism = simulate_rir_single(ROOM, _beta(ROOM, t60), SRC, MICS, FS, t60)
    t60_ism, _ = t60_from_rir(np.array(rir_ism[0], np.float64), FS)

    assert abs(corr_dev) > 0.9, f"EDC not linear (corr {corr_dev})"
    assert abs(t60_dev - t60) < 0.15 * t60 + 0.03, \
        f"device EDC-T60 {t60_dev:.3f} vs spec {t60:.3f}"
    assert abs(t60_dev - t60_ism) < 0.2 * t60 + 0.03, \
        f"device {t60_dev:.3f} vs ism {t60_ism:.3f}"


def test_direct_path_tdoa_subsample_phase():
    """The direct-path inter-mic phase in frame 0 encodes the geometric TDOA
    to sub-sample accuracy (what the pretext/downstream tasks rely on)."""
    t60 = 0.2
    cfg = DeviceSynthConfig()
    H = _ctf(t60, cfg)
    d = np.linalg.norm(SRC - MICS, axis=-1)
    tdoa = (d[1] - d[0]) / 343.0
    # dominant direct path: fit the cross-spectrum phase slope over low bins
    cross = H[1, 0] * np.conj(H[0, 0])
    band = slice(2, 40)
    f = np.arange(cfg.nf) * (FS / cfg.nfft)
    ph = np.unwrap(np.angle(cross[band]))
    slope = np.polyfit(f[band], ph, 1)[0]  # = -2*pi*tdoa
    tdoa_est = -slope / (2 * np.pi)
    assert abs(tdoa_est - tdoa) < 0.25 / FS, \
        f"TDOA from CTF {tdoa_est*FS:.3f} vs geometric {tdoa*FS:.3f} samples"
