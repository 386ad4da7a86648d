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


def test_dechorate_h5_extractor(tmp_path):
    h5py = pytest.importorskip("h5py")
    from sarssl_tpu.data.extractors import DEchorateExtractor

    root = tmp_path / "dech"
    root.mkdir()
    rng = np.random.default_rng(0)
    with h5py.File(str(root / "master.hdf5"), "w") as f:
        g = f.create_group("rir").create_group("room011")
        rir = np.zeros((4000, 5), np.float32)
        for m in range(5):
            rir[60 + m, m] = 1.0
            rir[200:600, m] = rng.standard_normal(400) * 0.02
        g.create_dataset("src1", data=rir)
    out = tmp_path / "out"
    n = DEchorateExtractor(str(root), fs=16000).extract(str(out))
    assert n > 0
    files = list((out / "room011").glob("SP*_MP*.npy"))
    assert files
    r = np.load(str(files[0]))
    assert r.shape[1] == 2 and np.isfinite(r).all()
