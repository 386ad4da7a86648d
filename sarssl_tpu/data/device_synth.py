"""Device-resident on-the-fly training-pair synthesis (pure jnp).

The reference generates microphone pairs on the host (gpuRIR + fftconvolve
inside DataLoader workers, dataset.py:287-382). This module synthesizes
batches entirely ON DEVICE so pretraining never stalls on host preprocessing:

  1. sample a room, a 2-mic pair and a source position with a keyed PRNG;
  2. build the low-order image set (Allen-Berkley, order <= IMG_ORDER) in
     closed form — positions, per-image reflection amplitudes, delays;
  3. form the frequency response H(f) = sum_img a/(4 pi d) e^{-2 pi i f d/c}
     on the STFT grid plus an exponentially decaying stochastic tail matched
     to the sampled T60 (multiplicative-transfer-function model: exact for
     the direct path and early reflections, band-limited/CTF-approximate for
     the late tail — adequate for the masked-reconstruction pretext);
  4. synthesize a speech-like source in the STFT domain (AR-colored noise
     with slow energy modulation), multiply by each mic's H, ISTFT, add
     white noise at a random SNR, peak-normalize.

Everything is jit/vmap-compatible; labels (TDOA, T60) are exact from the
sampled geometry. FLOPs are a matmul over (images x freqs) — MXU-friendly.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.stft import istft, hann_window

IMG_ORDER = 1  # images with |n|<=1 per axis: 3^3 * 8 sign combos collapsed


@dataclass(frozen=True)
class DeviceSynthConfig:
    nsample: int = 16640
    fs: int = 16000
    nfft: int = 512
    hop: int = 256
    c: float = 343.0
    room_lo: Tuple[float, float, float] = (4.0, 4.0, 2.5)
    room_hi: Tuple[float, float, float] = (10.0, 8.0, 4.0)
    t60_range: Tuple[float, float] = (0.2, 1.0)
    mic_dist_range: Tuple[float, float] = (0.03, 0.20)
    snr_range: Tuple[float, float] = (15.0, 30.0)

    @property
    def nf(self) -> int:
        return self.nfft // 2 + 1

    @property
    def nt(self) -> int:
        # frames so that after cropping one window from each edge (where the
        # synthesis-window envelope is near zero) nsample samples remain
        return (self.nsample + 2 * self.nfft - self.nfft) // self.hop + 1 + 2


def _image_set(room, src, beta):
    """Low-order image positions/amplitudes: per axis n in {-1,0,1} with both
    parities. Returns (pos (K,3), amp (K,)) with K=216."""
    n = jnp.array([-1, 0, 1])
    q = jnp.array([0, 1])
    nn, qq = jnp.meshgrid(n, q, indexing="ij")
    nn, qq = nn.reshape(-1), qq.reshape(-1)  # (6,) per axis

    def axis(L, s, b0, b1):
        coord = 2.0 * nn * L + (1 - 2 * qq) * s
        amp = (b0 ** jnp.abs(nn - qq)) * (b1 ** jnp.abs(nn))
        return coord, amp

    cx, ax = axis(room[0], src[0], beta[0], beta[1])
    cy, ay = axis(room[1], src[1], beta[2], beta[3])
    cz, az = axis(room[2], src[2], beta[4], beta[5])
    pos = jnp.stack(jnp.meshgrid(cx, cy, cz, indexing="ij"),
                    axis=-1).reshape(-1, 3)                       # (216, 3)
    amp = (ax[:, None, None] * ay[None, :, None]
           * az[None, None, :]).reshape(-1)                        # (216,)
    return pos, amp


def _sample_scene(key, cfg: DeviceSynthConfig):
    ks = jax.random.split(key, 8)
    room = jax.random.uniform(ks[0], (3,),
                              minval=jnp.asarray(cfg.room_lo),
                              maxval=jnp.asarray(cfg.room_hi))
    t60 = jax.random.uniform(ks[1], (), minval=cfg.t60_range[0],
                             maxval=cfg.t60_range[1])
    # uniform-absorption Sabine inverse: alpha = 0.161 V / (S T60)
    V = jnp.prod(room)
    S = 2 * (room[0] * room[1] + room[0] * room[2] + room[1] * room[2])
    alpha = jnp.clip(0.161 * V / (S * t60), 0.02, 0.95)
    beta = jnp.sqrt(1.0 - alpha) * jnp.ones(6)

    center = room * jax.random.uniform(ks[2], (3,), minval=0.35, maxval=0.65)
    d = jax.random.uniform(ks[3], (), minval=cfg.mic_dist_range[0],
                           maxval=cfg.mic_dist_range[1])
    theta = jax.random.uniform(ks[4], (), minval=0.0, maxval=2 * jnp.pi)
    off = 0.5 * d * jnp.array([jnp.cos(theta), jnp.sin(theta), 0.0])
    mics = jnp.stack([center - off, center + off])  # (2, 3)

    src = room * jax.random.uniform(ks[5], (3,), minval=0.2, maxval=0.8)
    # keep the source off the array by at least ~0.5 m (resample-free nudge)
    delta = src - center
    dist = jnp.linalg.norm(delta)
    src = center + delta / jnp.maximum(dist, 1e-3) * jnp.maximum(dist, 0.5)
    src = jnp.clip(src, 0.1, room - 0.1)
    return room, t60, beta, mics, src, ks[6], ks[7]


def synth_pair(key, cfg: DeviceSynthConfig = DeviceSynthConfig()):
    """One (wave (nsample, 2), labels {TDOA, T60}) sample, fully on device."""
    room, t60, beta, mics, src, knoise, ksrc = _sample_scene(key, cfg)
    pos, amp = _image_set(room, src, beta)

    f = jnp.arange(cfg.nf) * (cfg.fs / cfg.nfft)  # (nf,)
    dists = jnp.linalg.norm(pos[None, :, :] - mics[:, None, :], axis=-1)
    gains = amp[None, :] / (4 * jnp.pi * jnp.maximum(dists, 0.1))   # (2, K)
    phase = -2j * jnp.pi * f[None, None, :] * (dists / cfg.c)[:, :, None]
    H = jnp.sum(gains[:, :, None] * jnp.exp(phase), axis=1)         # (2, nf)

    # stochastic late tail: random-phase response with Sabine-consistent
    # energy, decorrelated between mics beyond the early part
    k1, k2 = jax.random.split(knoise)
    tail_energy = jnp.sum(gains ** 2, axis=1, keepdims=True) * (t60 / 0.2)
    tail = (jax.random.normal(k1, H.shape) + 1j * jax.random.normal(k2, H.shape)
            ) * jnp.sqrt(tail_energy / cfg.nf) * 0.3
    H = H + tail

    # source spectrogram: AR(1)-colored noise with slow energy modulation
    kt, kf, ke = jax.random.split(ksrc, 3)
    nt = cfg.nt
    spec = (jax.random.normal(kt, (cfg.nf, nt))
            + 1j * jax.random.normal(kf, (cfg.nf, nt)))
    color = 1.0 / jnp.sqrt(1.0 + (f / 800.0) ** 2)[:, None]
    env_t = 0.4 + 0.6 * jax.nn.sigmoid(
        3 * jnp.sin(jnp.linspace(0, 6 * jnp.pi, nt)
                    + jax.random.uniform(ke, ()) * 6.28))[None, :]
    S = spec * color * env_t                                         # (nf, nt)

    X = S[None, :, :] * H[:, :, None]                                # (2, nf, nt)
    wave = istft(jnp.transpose(X, (1, 2, 0))[None], cfg.nfft,
                 cfg.hop / cfg.nfft, cfg.nfft)[0]                    # (ns, 2)
    # drop one window from each edge: the synthesis-window envelope is ~0
    # there and division amplifies synthesized-frame content enormously
    wave = wave[cfg.nfft: cfg.nfft + cfg.nsample]
    pad = cfg.nsample - wave.shape[0]
    wave = jnp.pad(wave, ((0, pad), (0, 0)))

    kn = jax.random.fold_in(key, 99)
    snr = jax.random.uniform(jax.random.fold_in(kn, 1), (),
                             minval=cfg.snr_range[0], maxval=cfg.snr_range[1])
    sig_pow = jnp.mean(wave ** 2)
    noise = jax.random.normal(kn, wave.shape) * jnp.sqrt(
        sig_pow / 10 ** (snr / 10))
    wave = wave + noise
    wave = wave / (jnp.max(jnp.abs(wave)) + 1e-6) * 0.9

    d_direct = jnp.linalg.norm(src - mics, axis=-1)
    tdoa = (d_direct[1] - d_direct[0]) / cfg.c
    return wave.astype(jnp.float32), {"TDOA": tdoa.astype(jnp.float32),
                                      "T60": t60.astype(jnp.float32),
                                      "SNR": snr.astype(jnp.float32)}


@functools.partial(jax.jit, static_argnames=("nb", "cfg"))
def synth_batch_device(key, nb: int, cfg: DeviceSynthConfig = DeviceSynthConfig()):
    """(wave (nb, nsample, 2), labels dict of (nb,)) — jitted, vmapped."""
    keys = jax.random.split(key, nb)
    return jax.vmap(lambda k: synth_pair(k, cfg))(keys)
