"""Real-data layer on synthetic corpus trees: mic-pair selection, real
recording crops, corpus mixing, speaker-tree sources, RIR-based synthesis."""
import os

import numpy as np
import pytest

from sarssl_tpu.data import (RealMicSigDataset, RandomRealDataset, CorpusSpec,
                             select_mic_pairs, ARRAY_GEOMETRIES,
                             NpyRIRDataset, MicSigFromRIRDataset, dp_from_rir,
                             SpeakerTreeDataset, write_wav)

FS = 16000


def test_select_mic_pairs_distance_filter():
    pairs = select_mic_pairs(ARRAY_GEOMETRIES["locata_dicit"], 2, (0.03, 0.20))
    for idxes, pos in pairs:
        d = np.linalg.norm(pos[0] - pos[1])
        assert 0.03 <= d <= 0.20
    # 4cm/8cm/... spacings exist in dicit -> non-empty, and 1.92m pairs excluded
    assert pairs
    with pytest.raises(ValueError):
        select_mic_pairs(np.array([[0, 0, 0], [1.0, 0, 0]]), 2, (0.03, 0.20))


def _make_corpus(root, n_files=3, nch=4, dur_s=6.0):
    rng = np.random.default_rng(0)
    for i in range(n_files):
        sig = rng.standard_normal((int(dur_s * FS), nch)).astype(np.float32) * 0.1
        write_wav(os.path.join(root, f"rec{i}.wav"), sig, FS)


def test_real_micsig_dataset_crops(tmp_path):
    _make_corpus(str(tmp_path))
    spec = CorpusSpec("test", geometry=ARRAY_GEOMETRIES["locata_dummy"])
    ds = RealMicSigDataset(str(tmp_path), spec, T=1.04, fs=FS, seed=1)
    sig = ds[0]
    assert sig.shape == (int(1.04 * FS), 2)
    assert sig.dtype == np.float32
    # unknown-geometry corpus: adjacent channels
    ds2 = RealMicSigDataset(str(tmp_path), CorpusSpec("anon"), T=1.04, fs=FS)
    assert ds2[0].shape == (int(1.04 * FS), 2)


def test_random_real_dataset_mixing(tmp_path):
    a = tmp_path / "a"; b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    _make_corpus(str(a), n_files=1)
    _make_corpus(str(b), n_files=1)
    da = RealMicSigDataset(str(a), CorpusSpec("a"), T=1.04, fs=FS)
    db = RealMicSigDataset(str(b), CorpusSpec("b"), T=1.04, fs=FS)
    mix = RandomRealDataset([da, db], probs=[0.7, 0.3], dataset_sz=5)
    assert len(mix) == 5
    assert mix[0].shape == (int(1.04 * FS), 2)


def test_speaker_tree_source(tmp_path):
    rng = np.random.default_rng(0)
    for spk in ("spk1", "spk2"):
        d = tmp_path / spk
        d.mkdir()
        for u in range(2):
            write_wav(str(d / f"utt{u}.wav"),
                      rng.standard_normal((FS, 1)).astype(np.float32), FS)
    src = SpeakerTreeDataset(str(tmp_path), T=2.0, fs=FS, seed=0)
    out = src.sample()
    assert out.shape == (2 * FS, 1)
    assert abs(out.mean()) < 1e-3  # mean-removed
    # deterministic by index
    np.testing.assert_array_equal(src[5], src[5])


def test_dp_from_rir_window():
    rir = np.zeros((1000, 2), np.float32)
    rir[100, 0] = 1.0
    rir[500, 0] = 0.5   # echo outside the window
    rir[100, 1] = 1.0
    n0 = int(FS * 2.5 / 1000)
    rir[100 + n0, 0] = 0.25       # last sample INSIDE the +/-2.5 ms window
    rir[100 + n0 + 1, 0] = 0.125  # first sample OUTSIDE: must be zeroed
    dp = dp_from_rir(rir, FS)
    assert dp[100, 0] == 1.0 and dp[500, 0] == 0.0
    assert dp[100 + n0, 0] == 0.25       # window edge kept
    assert dp[100 + n0 + 1, 0] == 0.0    # just past the edge dropped


def test_micsig_from_rir_dataset(tmp_path):
    # fake extracted RIR tree + speaker sources
    rng = np.random.default_rng(0)
    room = tmp_path / "RoomA"; room.mkdir()
    rir = np.zeros((2000, 2), np.float32)
    rir[50, 0] = 1.0; rir[55, 1] = 0.9
    rir[300:800, :] = rng.standard_normal((500, 2)) * 0.05 * \
        np.exp(-np.arange(500) / 150)[:, None]
    np.save(str(room / "SP1_MP1.npy"), rir)
    np.savez(str(room / "SP1_MP1_info.npz"), TDOA=np.float32(5 / FS))
    spk = tmp_path / "src" / "spk1"; spk.mkdir(parents=True)
    write_wav(str(spk / "u0.wav"),
              rng.standard_normal((FS, 1)).astype(np.float32), FS)

    rirs = NpyRIRDataset(str(tmp_path))
    srcs = SpeakerTreeDataset(str(tmp_path / "src"), T=1.04, fs=FS)
    ds = MicSigFromRIRDataset(rirs, srcs, T=1.04, fs=FS, length=4)
    mic, annos = ds[0]
    assert mic.shape == (int(1.04 * FS), 2)
    assert np.abs(mic).max() == pytest.approx(0.9, abs=0.01)
    assert np.isfinite(annos["DRR"]) and np.isfinite(annos["C50"])
    assert annos["TDOA"] == pytest.approx(5 / FS)
    # per-index determinism
    mic2, _ = MicSigFromRIRDataset(rirs, srcs, T=1.04, fs=FS, length=4)[0]
    np.testing.assert_array_equal(mic, mic2)
