"""Batched STFT / ISTFT as pure jnp functions.

Semantics match the reference wrappers around ``torch.stft`` (see
/root/reference/code/common/utils_module.py:28-113): periodic Hann window,
``center=False`` framing with ``nt = floor((nsample - win_len)/hop) + 1``,
un-normalized FFT, and an exact window-envelope division on the inverse.

TPU notes: when ``win_len == 2*hop`` (the only configuration the reference
drivers use) framing is done with two strided reshapes instead of a gather, so
XLA lowers the whole STFT to reshape + rFFT with no scatter/gather ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_len: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = jnp.arange(win_len, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_len))


def frame_signal(x: jax.Array, win_len: int, hop: int) -> jax.Array:
    """Split ``x (..., nsample)`` into frames ``(..., nt, win_len)``.

    ``center=False`` convention: frame ``t`` covers samples
    ``[t*hop, t*hop + win_len)`` and ``nt = (nsample - win_len)//hop + 1``.
    """
    nsample = x.shape[-1]
    nt = (nsample - win_len) // hop + 1
    if win_len == 2 * hop and nsample % hop == 0:
        # Two half-frame views -> pure reshape/concat, no gather.
        nblocks = nsample // hop
        blocks = x.reshape(x.shape[:-1] + (nblocks, hop))
        left = blocks[..., : nt, :]
        right = blocks[..., 1 : nt + 1, :]
        return jnp.concatenate([left, right], axis=-1)
    starts = jnp.arange(nt) * hop
    idx = starts[:, None] + jnp.arange(win_len)[None, :]
    return x[..., idx]


def _dft_matrices(win_len: int, nfft: int, dtype=jnp.float32):
    """Real-DFT basis combined with the Hann window: frames @ (C, S) gives
    (real, imag) rFFT values. TPUs have no FFT hardware (XLA emulates it,
    slowly); for the small nfft used here a windowed-DFT matmul runs on the
    MXU at full rate."""
    n = np.arange(nfft)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / nfft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_len) / win_len))
    Cw = win[:, None] * np.cos(ang)[:win_len]
    Sw = win[:, None] * np.sin(ang)[:win_len]
    return jnp.asarray(Cw, dtype), jnp.asarray(Sw, dtype)


def stft(
    signal: jax.Array,
    win_len: int = 512,
    win_shift_ratio: float = 0.5,
    nfft: int = 512,
    impl: str = "matmul",
) -> jax.Array:
    """STFT of multi-channel signals.

    Args:
      signal: ``(nb, nsample, nch)`` float.
      impl: 'matmul' (windowed-DFT on the MXU; TPU-fast) or 'fft'.
    Returns:
      ``(nb, nf, nt, nch)`` complex64 with ``nf = nfft//2 + 1``.

    Mirrors reference ``STFT.forward`` (utils_module.py:49-72) but processes
    all channels in one batched transform instead of a per-channel loop.
    """
    hop = int(win_len * win_shift_ratio)
    x = jnp.moveaxis(signal, -1, 1)  # (nb, nch, nsample)
    frames = frame_signal(x, win_len, hop)  # (nb, nch, nt, win_len)
    if impl == "matmul" and win_len <= nfft:
        C, S = _dft_matrices(win_len, nfft, frames.dtype)
        re = jnp.matmul(frames, C, preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, S, preferred_element_type=jnp.float32)
        spec = jax.lax.complex(re, im)  # (nb, nch, nt, nf)
    else:
        win = hann_window(win_len, frames.dtype)
        spec = jnp.fft.rfft(frames * win, n=nfft, axis=-1)
    return jnp.transpose(spec, (0, 3, 2, 1))  # (nb, nf, nt, nch)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add frames ``(..., nt, win_len)`` -> ``(..., (nt-1)*hop + win_len)``.

    Implemented scatter-free for the ``win_len == 2*hop`` case by summing the
    two half-frame streams.
    """
    *lead, nt, win_len = frames.shape
    out_len = (nt - 1) * hop + win_len
    if win_len == 2 * hop:
        halves = frames.reshape(*lead, nt, 2, hop)
        left = halves[..., 0, :].reshape(*lead, nt * hop)
        right = halves[..., 1, :].reshape(*lead, nt * hop)
        out = jnp.zeros((*lead, out_len), frames.dtype)
        out = out.at[..., : nt * hop].add(left)
        out = out.at[..., hop : hop + nt * hop].add(right)
        return out
    out = jnp.zeros((*lead, out_len), frames.dtype)
    for t in range(nt):  # static unroll; used only for exotic configs
        out = out.at[..., t * hop : t * hop + win_len].add(frames[..., t, :])
    return out


def istft(
    spec: jax.Array,
    win_len: int = 512,
    win_shift_ratio: float = 0.5,
    nfft: int = 512,
) -> jax.Array:
    """Inverse STFT with exact window-envelope compensation.

    Args:
      spec: ``(nb, nf, nt, nch)`` complex.
    Returns:
      ``(nb, nsample, nch)`` float with ``nsample = (nt - 1)*hop + win_len``.

    Matches ``torch.istft(..., center=False)`` used by the reference ISTFT
    wrapper (utils_module.py:91-113).
    """
    hop = int(win_len * win_shift_ratio)
    x = jnp.transpose(spec, (0, 3, 2, 1))  # (nb, nch, nt, nf)
    frames = jnp.fft.irfft(x, n=nfft, axis=-1)[..., :win_len]
    win = hann_window(win_len, frames.dtype)
    sig = overlap_add(frames * win, hop)  # (nb, nch, nsample)
    nt = x.shape[-2]
    env = overlap_add(
        jnp.broadcast_to(win * win, (1, 1, nt, win_len)), hop
    )[0, 0]
    sig = sig / jnp.maximum(env, 1e-11)
    return jnp.moveaxis(sig, 1, -1)


@functools.partial(jax.jit, static_argnames=("win_len", "win_shift_ratio", "nfft"))
def stft_jit(signal, win_len=512, win_shift_ratio=0.5, nfft=512):
    return stft(signal, win_len, win_shift_ratio, nfft)
