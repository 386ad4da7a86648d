"""Channel-per-file corpora (AMI-style) and the h5 extractor path."""
import os

import numpy as np
import pytest

from sarssl_tpu.data import RealMicSigDataset, CorpusSpec, write_wav

FS = 16000


def test_channel_per_file_corpus(tmp_path):
    rng = np.random.default_rng(0)
    meet = tmp_path / "meeting1"
    meet.mkdir()
    base = rng.standard_normal(int(3.0 * FS)).astype(np.float32) * 0.1
    for ch in range(4):
        # each channel = shifted copy so pairing is meaningful
        sig = np.roll(base, ch * 3)[:, None]
        write_wav(str(meet / f"headset{ch}.wav"), sig, FS)
    spec = CorpusSpec("AMI_like", channel_per_file=True)
    ds = RealMicSigDataset(str(tmp_path), spec, T=1.04, fs=FS, seed=0)
    sig = ds[0]
    assert sig.shape == (int(1.04 * FS), 2)
    assert np.isfinite(sig).all() and np.abs(sig).max() > 0

