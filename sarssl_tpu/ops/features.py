"""Waveform -> model-input feature pipeline, fully inside the jitted step.

Equivalent of reference ``STFTLearner.data_preprocess``
(/root/reference/code/learner.py:525-553): STFT, per-example magnitude
normalization by channel 0, mic-pair rebatching, real/imag stacking, and
DC-bin dropping. Runs on device as one fused XLA computation so the input
pipeline never stalls on host preprocessing.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .pairs import mic_pair_rebatch
from .stft import stft


@dataclass(frozen=True)
class FeatureConfig:
    win_len: int = 512
    win_shift_ratio: float = 0.5
    nfft: int = 512
    fre_used_ratio: float = 1.0  # 1.0 -> bins 1..nfft/2 ; 0.5 -> bins 0..nfft/4
    ch_mode: str = "M"
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def nf_used(self) -> int:
        return int(self.nfft // 2 * self.fre_used_ratio)

    def num_frames(self, nsample: int) -> int:
        hop = int(self.win_len * self.win_shift_ratio)
        return (nsample - self.win_len) // hop + 1


def stft_features(mic_sig: jax.Array, cfg: FeatureConfig = FeatureConfig()) -> jax.Array:
    """Compute model input features from raw waveforms.

    Args:
      mic_sig: ``(nb, nsample, nch)`` float waveforms.
    Returns:
      ``(nb*npair, 2, nf_used, nt, 2)`` float: (batch*pairs, mic, freq, time, re/im).
    """
    spec = stft(mic_sig, cfg.win_len, cfg.win_shift_ratio, cfg.nfft)  # (nb,nf,nt,nch)
    spec = jnp.transpose(spec, (0, 3, 1, 2))  # (nb, nch, nf, nt)

    # normalize by mean |X| of channel 0 per example (learner.py:537-542)
    mag0 = jnp.abs(spec[:, 0])
    mean = jnp.mean(mag0.reshape(mag0.shape[0], -1), axis=1)
    spec = spec / (mean[:, None, None, None] + cfg.eps)

    pairs = mic_pair_rebatch(spec, cfg.ch_mode)  # (nb*npair, 2, nf, nt)
    reim = jnp.stack([pairs.real, pairs.imag], axis=-1)  # (nb', 2, nf, nt, 2)

    if cfg.fre_used_ratio == 1.0:
        reim = reim[:, :, 1 : cfg.nf_used + 1]  # drop DC (learner.py:515-518)
    elif cfg.fre_used_ratio == 0.5:
        reim = reim[:, :, : cfg.nf_used]
    else:
        raise ValueError("fre_used_ratio must be 1.0 or 0.5")
    return reim.astype(cfg.dtype)
