"""LOCATA reader on a synthetic corpus fixture: layout walking, pair
selection, silence-onset skipping, TDOA-from-tracks interpolation."""
import os
from pathlib import Path

import numpy as np
import pytest

from sarssl_tpu.data.locata import LOCATADataset, silence_onset
from sarssl_tpu.data import write_wav

FS = 48000  # LOCATA native rate


def _make_locata(root: Path, subset="eval", task=1, array="dicit",
                 src_pos=(3.0, 4.0, 1.5), dur_s=8.0):
    adir = root / subset / f"task{task}" / "recording1" / array
    adir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = int(dur_s * FS)
    sig = rng.standard_normal((n, 15)).astype(np.float32) * 0.1
    sig[: FS // 2] *= 0.001  # 0.5 s leading silence
    write_wav(str(adir / f"audio_array_{array}.wav"), sig, FS)

    npt = 40
    t = np.linspace(0, dur_s, npt)
    def tsv(path, cols):
        with open(path, "w") as f:
            f.write("\t".join(cols.keys()) + "\n")
            for i in range(npt):
                f.write("\t".join(str(cols[c][i]) for c in cols) + "\n")

    hours = np.zeros(npt); mins = np.zeros(npt)
    tsv(str(adir / "required_time.txt"),
        {"hour": hours, "minute": mins, "second": t})
    eye = np.eye(3)
    cols = {"x": np.full(npt, 1.0), "y": np.full(npt, 1.0),
            "z": np.full(npt, 1.0),
            "ref_vec_x": np.ones(npt), "ref_vec_y": np.zeros(npt),
            "ref_vec_z": np.zeros(npt)}
    for i in range(3):
        for j in range(3):
            cols[f"rotation_{i+1}{j+1}"] = np.full(npt, eye[i, j])
    tsv(str(adir / f"position_array_{array}.txt"), cols)
    tsv(str(adir / "position_source_talker1.txt"),
        {"x": np.full(npt, src_pos[0]), "y": np.full(npt, src_pos[1]),
         "z": np.full(npt, src_pos[2])})
    return adir


def test_silence_onset():
    sig = np.zeros((FS * 2, 2), np.float32)
    sig[FS:] = 1.0
    assert silence_onset(sig, FS) == pytest.approx(1.0, abs=0.01)


def test_locata_dataset_end_to_end(tmp_path):
    _make_locata(tmp_path)
    ds = LOCATADataset(str(tmp_path), T=1.04, fs=16000, stage="train",
                       arrays=("dicit",), seed=3)
    sig, anno = ds[0]
    assert sig.shape == (int(1.04 * 16000), 2)
    assert np.abs(sig).max() == pytest.approx(0.9, abs=0.02)
    # static source + static array: TDOA equals the geometric value for the
    # selected pair; bounded by pair distance / c
    assert np.isfinite(anno["TDOA"])
    assert abs(anno["TDOA"]) <= 0.20 / 343.0 + 1e-6


def test_locata_tdoa_matches_geometry(tmp_path):
    src = np.array([10.0, 1.0, 1.0])
    _make_locata(tmp_path, src_pos=tuple(src))
    ds = LOCATADataset(str(tmp_path), T=1.04, fs=16000, stage="train",
                       arrays=("dicit",), seed=0)
    # the sampled item is one of ds.items; its annotation must equal the
    # geometric TDOA (d(src,mic1) - d(src,mic0))/c of SOME valid pair
    expected = [
        (np.linalg.norm(src - it[4][1]) - np.linalg.norm(src - it[4][0]))
        / 343.0 for it in ds.items]
    sig, anno = ds[0]
    err = min(abs(float(anno["TDOA"]) - e) for e in expected)
    assert err < 6.25e-5, (anno["TDOA"], err)  # within one sample @ 16 kHz
    # idx=None path is stochastic; use indexed access for determinism
    a1 = LOCATADataset(str(tmp_path), T=1.04, fs=16000, stage="train",
                       arrays=("dicit",))[7]
    a2 = LOCATADataset(str(tmp_path), T=1.04, fs=16000, stage="train",
                       arrays=("dicit",))[7]
    np.testing.assert_array_equal(a1[0], a2[0])
    assert a1[1]["TDOA"] == a2[1]["TDOA"]


def test_locata_test_split_uses_dev(tmp_path):
    _make_locata(tmp_path, subset="dev")
    with pytest.raises(AssertionError):
        LOCATADataset(str(tmp_path), stage="train", arrays=("dicit",))
    ds = LOCATADataset(str(tmp_path), T=1.04, fs=16000, stage="test",
                       arrays=("dicit",))
    assert len(ds.items) > 0
