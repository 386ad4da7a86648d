"""STFT/ISTFT parity vs torch.stft (the reference's backend) and round trips."""
import numpy as np
import pytest

import jax.numpy as jnp

from sarssl_tpu.ops import stft, istft


def _torch_stft(sig, win_len=512, hop=256, nfft=512):
    import torch

    x = torch.from_numpy(sig)  # (nb, nsample, nch)
    win = torch.hann_window(win_len)
    outs = []
    for ch in range(x.shape[-1]):
        s = torch.stft(
            x[:, :, ch], n_fft=nfft, hop_length=hop, win_length=win_len,
            window=win, center=False, normalized=False, return_complex=True,
        )
        outs.append(s)
    return torch.stack(outs, dim=-1).numpy()  # (nb, nf, nt, nch)


@pytest.mark.parametrize("nsample,nch", [(4096, 2), (65792, 2), (4096, 4)])
def test_stft_matches_torch(nsample, nch):
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((2, nsample, nch)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(sig)))
    ref = _torch_stft(sig)
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-3 * scale, rtol=0)


def test_stft_shape_4p112s():
    # T=4.112s @ 16kHz -> 65792 samples -> 256 frames, 257 bins
    sig = jnp.zeros((1, 65792, 2))
    out = stft(sig)
    assert out.shape == (1, 257, 256, 2)


def test_istft_roundtrip():
    rng = np.random.default_rng(1)
    sig = rng.standard_normal((2, 4096, 2)).astype(np.float32)
    spec = stft(jnp.asarray(sig))
    rec = np.asarray(istft(spec))
    # center=False: edges are attenuated by the window envelope; compare interior
    n = rec.shape[1]
    assert n == (spec.shape[2] - 1) * 256 + 512
    interior = slice(512, n - 512)
    np.testing.assert_allclose(
        rec[:, interior], sig[:, interior][:, : rec[:, interior].shape[1]],
        atol=1e-3, rtol=0,
    )


def test_istft_np_matches_jax():
    """The host-side numpy istft in pretext_eval mirrors ops.stft.istft.

    The --test eval path reconstructs waveforms on the host (complex math is
    UNIMPLEMENTED on the axon TPU backend); pin its numerics to the jax op.
    """
    from sarssl_tpu.train.pretext_eval import _istft_np

    rng = np.random.default_rng(3)
    sig = rng.standard_normal((2, 4096, 2)).astype(np.float32)
    spec = np.asarray(stft(jnp.asarray(sig)))
    ours = _istft_np(spec, 512, 0.5, 512)
    ref = np.asarray(istft(jnp.asarray(spec)))
    assert ours.shape == ref.shape
    # numpy FFT computes in float64, the jax op in float32; at the signal
    # edges the 1e-11-floored envelope division amplifies that dtype gap,
    # so pin the interior (same convention as test_istft_roundtrip).
    interior = (slice(None), slice(512, -512))
    np.testing.assert_allclose(ours[interior], ref[interior], atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=0)


def test_reconstruct_waveforms_host():
    """reconstruct_waveforms accepts a DC-dropped (nb,nf,nt,2,nch) grid and
    returns a peak-normalised host array (pretext --test path)."""
    from sarssl_tpu.train.pretext_eval import reconstruct_waveforms

    rng = np.random.default_rng(4)
    sig = rng.standard_normal((1, 4096, 2)).astype(np.float32)
    spec = np.asarray(stft(jnp.asarray(sig)))  # (1, 257, nt, 2)
    grid = np.stack([spec.real, spec.imag], axis=-2)[:, 1:]  # drop DC
    rec = reconstruct_waveforms(jnp.asarray(grid))
    assert isinstance(rec, np.ndarray)
    assert rec.shape[0] == 1 and rec.shape[-1] == 2
    assert abs(np.max(np.abs(rec)) - 1.0) < 1e-5


def test_istft_scale_invariance():
    """istft(stft(x)) reproduces x exactly where the window envelope is full.

    Note: torch.istft(center=False) rejects hann windows outright (NOLA check
    fails at the signal edges), so the reference's own ISTFT wrapper cannot be
    used as an oracle here; we validate via the analytic roundtrip instead.
    """
    rng = np.random.default_rng(2)
    sig = rng.standard_normal((1, 8192, 1)).astype(np.float32)
    spec = stft(jnp.asarray(sig))
    rec = np.asarray(istft(2.0 * spec))[0, :, 0]
    interior = slice(512, 7000)
    np.testing.assert_allclose(rec[interior], 2.0 * sig[0, interior, 0], atol=2e-3)
