"""Pretext-task evaluation: spectrogram reconstruction -> waveform metrics.

Equivalent of reference ``STFTLearner.pretrain_evaluate``
(/root/reference/code/learner.py:574-618): view the predicted/target patch
grids as complex STFTs, prepend the dropped DC bin, ISTFT, peak-normalize,
and compute masked/unmasked MSEs plus (optionally) PESQ.

PESQ is a host-side metric with no TPU analogue; we use the real ``pesq``
package / torchmetrics when installed, else the vendored P.862 model in
``sarssl_tpu.utils.pesq`` (valid here because the pretext reconstruction is
sample-aligned with its target by construction).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.patches import patch_recover


def _pesq_fn():
    from ..utils.pesq import pesq_wb

    def fn(pred: np.ndarray, ref: np.ndarray, fs: int) -> float:
        return pesq_wb(ref, pred, fs)

    return fn


def reconstruct_waveforms(pred_tf, win_len: int = 512,
                          win_shift_ratio: float = 0.5, nfft: int = 512):
    """(nb, nf, nt, nreim, nch) TF grid (DC dropped) -> (nb, nsample, nch).

    Host-side numpy (numerics identical to ``ops.stft.istft``): this is an
    eval-only path whose output feeds PESQ/plot dumps on the host anyway, and
    complex arithmetic is UNIMPLEMENTED on the axon TPU backend — keeping it
    off-device makes ``--test`` runnable against a live chip state.
    """
    pred_tf = np.asarray(pred_tf)
    cplx = pred_tf[..., 0, :] + 1j * pred_tf[..., 1, :]  # (nb, nf, nt, nch)
    dc = np.zeros_like(cplx[:, :1])
    full = np.concatenate([dc, cplx], axis=1)  # (nb, nf+1, nt, nch)
    sig = _istft_np(full, win_len, win_shift_ratio, nfft)
    peak = np.max(np.abs(sig))
    return sig / max(peak, 1e-9)


def _istft_np(spec: np.ndarray, win_len: int, win_shift_ratio: float,
              nfft: int) -> np.ndarray:
    """Numpy mirror of ``ops.stft.istft`` (same Hann/center=False semantics)."""
    hop = int(win_len * win_shift_ratio)
    x = np.transpose(spec, (0, 3, 2, 1))  # (nb, nch, nt, nf)
    frames = np.fft.irfft(x, n=nfft, axis=-1)[..., :win_len]
    n = np.arange(win_len)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_len))
    frames = frames * win
    nb, nch, nt, _ = frames.shape
    out_len = (nt - 1) * hop + win_len
    sig = np.zeros((nb, nch, out_len), frames.dtype)
    env = np.zeros(out_len, win.dtype)
    for t in range(nt):
        sig[..., t * hop : t * hop + win_len] += frames[..., t, :]
        env[t * hop : t * hop + win_len] += win * win
    sig = sig / np.maximum(env, 1e-11)
    return np.moveaxis(sig, 1, -1)


def pretext_metrics(aux: Dict, sig_shape, patch_shape,
                    fs: int = 16000, compute_pesq: bool = False) -> Dict:
    """Metrics from a pretext forward's aux dict {pred, tar, mask}.

    Returns {'mse', 'mse_mask', 'mse_mask_ch', 'pesq' (nb, nch) or NaN,
    'pesq_mask_ch' (nb,), 'sig_pred', 'sig_tar'}.
    """
    nf, nt = sig_shape[0], sig_shape[1]
    f_first = patch_shape[1] != 1
    pred = patch_recover(aux["pred"].astype(jnp.float32), (nf, nt),
                         patch_shape, f_first)   # (nb, nf, nt, 2, nmic)
    tar = patch_recover(aux["tar"].astype(jnp.float32), (nf, nt),
                        patch_shape, f_first)
    mask = aux["mask"]
    nb, npatch = mask.patch.shape
    nmic = tar.shape[-1]

    # dense mask over the TF grid: 1 = kept, 0 = masked (ref convention)
    mp = mask.patch.astype(jnp.float32)  # (nb, npatch), 1 = masked
    ch = jax.nn.one_hot(mask.ch, nmic)   # (nb, nmic), 1 = masked channel
    dpatch = patch_shape[0] * patch_shape[1]
    dense_patches = 1.0 - mp[:, :, None, None] * ch[:, None, None, :]
    mask_dense = patch_recover(
        jnp.broadcast_to(dense_patches, (nb, npatch, dpatch, nmic)),
        (nf, nt), patch_shape, f_first)          # (nb, nf, nt, nmic)

    diff = (pred - tar) ** 2                      # (nb, nf, nt, 2, nmic)
    # tile to the full (nb,nf,nt,nreim,nch) grid like the reference
    # (learner.py:594) so the denominator counts re AND im cells
    md = jnp.broadcast_to(mask_dense[:, :, :, None, :], diff.shape)
    diff_mask = diff * (1 - md)
    mse = jnp.mean(diff)
    mse_mask = jnp.sum(diff_mask) / jnp.maximum(jnp.sum(1 - md), 1)
    mse_mask_ch = jnp.mean(jnp.sum(diff_mask, axis=-1))  # learner.py:599-600

    out = {"mse": float(mse), "mse_mask": float(mse_mask),
           "mse_mask_ch": float(mse_mask_ch)}

    sig_pred = np.asarray(reconstruct_waveforms(pred))
    sig_tar = np.asarray(reconstruct_waveforms(tar))
    out["sig_pred"], out["sig_tar"] = sig_pred, sig_tar

    pesq = _pesq_fn() if compute_pesq else None
    if pesq is not None:
        vals = np.zeros((nb, nmic))
        for b in range(nb):
            for m in range(nmic):
                try:
                    vals[b, m] = pesq(sig_pred[b, :, m], sig_tar[b, :, m], fs)
                except Exception:
                    vals[b, m] = np.nan
        out["pesq"] = vals
    else:
        out["pesq"] = np.full((nb, nmic), np.nan)
    # PESQ of each item's masked channel (learner.py:609-616: the channel
    # with FEWER kept cells is the masked one)
    kept = np.asarray(jnp.sum(mask_dense, axis=(1, 2)))  # (nb, nmic)
    mask_ch = np.argmin(kept, axis=1)
    out["pesq_mask_ch"] = out["pesq"][np.arange(nb), mask_ch]
    # per-instance artifacts for the reference's 'ins' test dumps
    # (run_pretrain.py:462-483): dense kept-mask and the TF grids
    out["mask_dense"] = np.asarray(mask_dense)
    out["pred_tf"], out["tar_tf"] = np.asarray(pred), np.asarray(tar)
    return out
