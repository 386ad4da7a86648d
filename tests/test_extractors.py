"""RIR extractor framework on synthetic corpus fixtures."""
import os
from pathlib import Path

import numpy as np
import pytest

from sarssl_tpu.data.extractors import WavRIRExtractor, MeshRIRExtractor
from sarssl_tpu.data.real_rir import NpyRIRDataset
from sarssl_tpu.data import write_wav


def test_wav_extractor_pairs_and_tree(tmp_path):
    corpus = tmp_path / "corpus" / "Room1"
    corpus.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rir = np.zeros((4000, 8), np.float32)
    for m in range(8):
        rir[100 + m, m] = 1.0
        rir[300:800, m] = rng.standard_normal(500) * 0.02
    write_wav(str(corpus / "Room1_RIR_x.wav"), rir, 16000)
    write_wav(str(corpus / "AmbientNoise_x.wav"),
              rng.standard_normal((8000, 8)).astype(np.float32) * 0.01, 16000)

    out = tmp_path / "out"
    ex = WavRIRExtractor(str(tmp_path / "corpus"), glob="**/*RIR*.wav",
                         mic_spacing=0.06, noise_glob="*Noise*.wav")
    n = ex.extract(str(out))
    assert n > 0
    files = list((out / "Room1").glob("SP*_MP*.npy"))
    assert files
    # spacing 0.06: pairs up to 3 apart (0.18m) valid, 4 apart (0.24) not
    names = {f.name for f in files}
    assert "SP0_MP0-1.npy" in names and "SP0_MP0-3.npy" in names
    assert "SP0_MP0-4.npy" not in names
    # matched noise written alongside
    assert (out / "Room1" / "SP0_MP0-1_noise.wav").exists()

    # consumable by NpyRIRDataset
    ds = NpyRIRDataset(str(out))
    rir2, info, noise = ds[0]
    assert rir2.shape[1] == 2
    assert noise is not None and noise.shape[1] == 2
    assert "mic_pos" in info


def test_mesh_extractor(tmp_path):
    root = tmp_path / "mesh"
    root.mkdir()
    # 3x1 grid of positions 8cm apart, single-channel IRs
    pos = np.stack([np.arange(3) * 0.08, np.zeros(3), np.zeros(3)], 1)
    np.save(str(root / "pos_mic.npy"), pos)
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(str(root / f"ir_{i}.npy"),
                rng.standard_normal(2000).astype(np.float32) * 0.1)
    out = tmp_path / "out"
    n = MeshRIRExtractor(str(root)).extract(str(out))
    assert n >= 2  # pairs (0,1),(1,2) at 8cm and (0,2) at 16cm
