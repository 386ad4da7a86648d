"""Corpus-faithful RIR extractors on synthetic trees replicating each
corpus's on-disk format (reference gen_real_rir.py)."""
import json
import os
from pathlib import Path

import numpy as np
import pytest
import scipy.io

from sarssl_tpu.data.extractors import (
    ACEExtractor, BUTReverbExtractor, DCASEExtractor, DEchorateExtractor,
    MIRExtractor, MeshRIRExtractor, find_dp_index, pair_in_range,
    rooms_for_stage, strip_noise_silence)
from sarssl_tpu.data.real_rir import NpyRIRDataset
from sarssl_tpu.data.wavio import write_wav

RNG = np.random.default_rng(0)


def _decaying_rir(n, nmic, peak_at=100, fs=16000):
    rir = RNG.standard_normal((n, nmic)).astype(np.float64) * 0.01
    rir *= np.exp(-np.arange(n) / (0.1 * fs))[:, None]
    for m in range(nmic):
        rir[peak_at + m, m] = 1.0
    return rir


# ---------------------------------------------------------------------- ACE

def _make_ace_tree(root: Path):
    d = root / "RIRN" / "Lin8Ch" / "Office_1" / "1"
    d.mkdir(parents=True)
    rir = _decaying_rir(4000, 8)
    write_wav(str(d / "Office_1_1_RIR.wav"), rir.astype(np.float32), 16000)
    write_wav(str(d / "Office_1_1_Noise_Ambient.wav"),
              (RNG.standard_normal((8000, 8)) * 0.01).astype(np.float32),
              16000)
    data = root / "Data"
    data.mkdir()
    rows = ["Mic config:, Room decode:, Room config:, Chan:, FB T60:, FB DRR:"]
    for ch in range(1, 9):
        rows.append(f"Lin8Ch, Office_1, 1, {ch}, 0.45, 3.2")
    (data / "20150814T154139_Corpus_Mean_DRRs_and_T60s.csv").write_text(
        "\n".join(rows))


def test_ace_geometry_pairs_and_annotations(tmp_path):
    _make_ace_tree(tmp_path)
    out = tmp_path / "out"
    counts = ACEExtractor(str(tmp_path)).extract(str(out))
    files = sorted((out / "Office_1" / "Lin8Ch").glob("SP*_MP*.npy"))
    names = {f.name for f in files}
    # Lin8Ch spacing 0.06 m: pairs <= 3 apart valid, >= 4 apart (0.24) not
    assert "SP1_MP1-1-2.npy" in names and "SP1_MP1-1-4.npy" in names
    assert "SP1_MP1-1-5.npy" not in names
    arr = np.load(files[0])
    assert arr.shape[0] == 1 and arr.shape[1] == 2 and arr.shape[3] == 1
    info = dict(np.load(str(files[0]).replace(".npy", "_info.npz")))
    for key in ("room_sz", "mic_pos", "T60fromDataset", "DRRfromDataset",
                "DRR", "C50", "ABS", "fs"):
        assert key in info, key
    assert info["T60fromDataset"] == pytest.approx(0.45)
    assert np.allclose(info["room_sz"], [3.32, 4.83, 2.95])
    # matched noise with the array-position MP tag
    assert (out / "Office_1" / "Lin8Ch" / "_MP1-1-2_Ambient.wav").exists()
    assert counts["rir"] > 0 and counts["noise"] > 0

    ds = NpyRIRDataset(str(out))
    rir, info2, noise = ds[0]
    assert rir.ndim == 2 and rir.shape[1] == 2
    assert noise is not None and noise.shape[1] == 2


def test_find_dp_index_prefers_early_strong_peak():
    rir = np.zeros(1000)
    rir[100] = 0.8   # direct path: early, above half max
    rir[300] = 1.0   # strongest (e.g. reflection focus)
    rir[50] = 0.2    # early but weak
    assert find_dp_index(rir) == 100


# ---------------------------------------------------------------- BUTReverb

def _make_but_tree(root: Path):
    mic_xyz = [(0.0, 0.0, 1.0), (0.05, 0.0, 1.0), (0.10, 0.0, 1.0),
               (0.40, 0.0, 1.0)]
    spk = "SpkID01_20170901_S"
    for i, (x, y, z) in enumerate(mic_xyz, start=1):
        d = root / "RIRs" / "VUT_FIT_L207" / "MicID01" / spk / f"{i:02d}"
        (d / "RIR").mkdir(parents=True)
        (d / "silence").mkdir()
        meta = [
            f"$EnvMicID {i}",
            f"$EnvMic{i}TypeID 01-{i}",
            f"$EnvMic{i}RelRT60 0.6",
            f"$EnvMic{i}RelRT30 0.55",
            f"$EnvMic{i}RelRT20 0.5",
            f"$EnvMic{i}Depth {x}",
            f"$EnvMic{i}Width {y}",
            f"$EnvMic{i}Height {z}",
            "$EnvSpk1Depth 2.0", "$EnvSpk1Width 1.5", "$EnvSpk1Height 1.2",
            "$EnvDepth 4.0", "$EnvWidth 6.0", "$EnvHeight 2.6",
        ]
        (d / "mic_meta.txt").write_text("\n".join(meta) + "\n")
        write_wav(str(d / "RIR" / "ir.wav"),
                  _decaying_rir(3000, 1).astype(np.float32), 16000)
        write_wav(str(d / "silence" / "n1.wav"),
                  (RNG.standard_normal((4000, 1)) * 0.01).astype(np.float32),
                  16000)
        write_wav(str(d / "silence" / "n2.wav"),
                  (RNG.standard_normal((4000, 1)) * 0.01).astype(np.float32),
                  16000)


def test_butreverb_meta_geometry_and_noise_concat(tmp_path):
    _make_but_tree(tmp_path)
    out = tmp_path / "out"
    counts = BUTReverbExtractor(str(tmp_path)).extract(str(out))
    d = out / "VUT_FIT_L207" / "spherical"
    names = {f.name for f in d.glob("SP*_MP*.npy")}
    # mics at x=0,.05,.10,.40: valid pairs (1,2),(1,3),(2,3); mic 4 too far
    assert names == {"SPSpkID01_MP-1-2.npy", "SPSpkID01_MP-1-3.npy",
                     "SPSpkID01_MP-2-3.npy"}
    info = dict(np.load(d / "SPSpkID01_MP-1-2_info.npz"))
    assert np.allclose(info["room_sz"], [4.0, 6.0, 2.6])
    assert info["T60"] == pytest.approx(0.6)
    assert np.allclose(info["mic_pos"],
                       [[0, 0, 1.0], [0.05, 0, 1.0]])
    # silence recordings concatenated (2 x 4000 samples)
    noise = d / "SPSpkID01_MP-1-2_silence.wav"
    assert noise.exists()
    from sarssl_tpu.data.wavio import read_wav
    sig, _ = read_wav(str(noise))
    assert sig.shape == (8000, 2)
    assert counts == {"rir": 3, "noise": 3}


# ------------------------------------------------------------------ MeshRIR

def test_meshrir_per_mic_files_and_resample(tmp_path):
    sess = tmp_path / "S32-M441_npy"
    sess.mkdir()
    pos_mic = np.stack([np.arange(3) * 0.08, np.zeros(3), np.zeros(3)], 1)
    pos_src = np.array([[1.0, 1.0, 1.0], [2.0, 1.0, 1.0]])
    np.save(sess / "pos_mic.npy", pos_mic)
    np.save(sess / "pos_src.npy", pos_src)
    L = 4800
    for m in range(3):
        np.save(sess / f"ir_{m}.npy",
                RNG.standard_normal((2, L)).astype(np.float32) * 0.1)
    (sess / "data.json").write_text(json.dumps({"samplerate": 48000}))

    out = tmp_path / "out"
    counts = MeshRIRExtractor(str(tmp_path)).extract(str(out))
    d = out / "R1" / "A1"
    names = {f.name for f in d.glob("*.npy")}
    # 8 cm grid: (1,2),(2,3) at 0.08 and (1,3) at 0.16 all valid, 2 sources
    assert {"SP1_MP-1-2.npy", "SP1_MP-1-3.npy", "SP1_MP-2-3.npy",
            "SP2_MP-1-2.npy"} <= names
    arr = np.load(d / "SP1_MP-1-2.npy")
    assert arr.shape == (1, 2, L // 3, 1)  # 48k -> 16k resample
    info = dict(np.load(d / "SP1_MP-1-2_info.npz"))
    assert info["T60"] == pytest.approx(0.19)
    assert np.allclose(np.ravel(info["traj_pts"]), [1.0, 1.0, 1.0])
    assert counts["rir"] == 6


# ---------------------------------------------------------------- dEchorate

def _make_dechorate_tree(root: Path):
    import h5py

    # annotations: 30 mics = 6 arrays x 5 mics spaced 4 cm, arrays 1 m apart
    mics = np.zeros((3, 30))
    for a in range(6):
        for m in range(5):
            mics[0, a * 5 + m] = a * 1.0 + m * 0.04
    with h5py.File(root / "dEchorate_annotations.h5", "w") as f:
        f["room_size"] = np.array([5.7, 5.9, 2.3])
        f["microphones"] = mics
        f["arrays_position"] = np.zeros((3, 6))
        f["sources_directional_position"] = np.zeros((3, 6))
        f["sources_directional_direction"] = np.zeros((3, 6))
        f["sources_omnidirection_position"] = np.arange(9.0).reshape(3, 3)
        f["sources_noise_position"] = np.zeros((3, 4))
        f["sources_noise_direction"] = np.zeros((3, 4))
    with h5py.File(root / "dEchorate_rir.h5", "w") as f:
        f.attrs["sampling_rate"] = 48000
        g = f.create_group("rir").create_group("011000")
        for s in range(9):  # 6 directional + 3 omni, sorted keys
            g[f"0{s}"] = _decaying_rir(4800, 31, fs=48000)
    with h5py.File(root / "dEchorate_silence_gzip7.hdf5", "w") as f:
        f.attrs["sampling_rate"] = 48000
        g = f.create_group("silence").create_group("011000")
        g["00"] = RNG.standard_normal((48000 * 4, 31)) * 0.01


def test_dechorate_arrays_and_omni_sources(tmp_path):
    pytest.importorskip("h5py")
    _make_dechorate_tree(tmp_path)
    out = tmp_path / "out"
    counts = DEchorateExtractor(str(tmp_path)).extract(str(out))
    d = out / "011000" / "A2"
    names = {f.name for f in d.glob("SP*.npy")}
    # 3 omni sources x array pairs; 5 mics at 4 cm: pairs up to 4 apart
    # (0.16 m) valid -> C(5,2) = 10 pairs per source
    assert len(names) == 30
    assert "SP1_MP-1-2.npy" in names and "SP3_MP-4-5.npy" in names
    info = dict(np.load(d / "SP1_MP-1-2_info.npz"))
    assert np.allclose(info["room_sz"], [5.7, 5.9, 2.3])
    # A2 mics start at x = 1.0
    assert info["mic_pos"][0, 0] == pytest.approx(1.0)
    # omni source position column 0 = [0, 3, 6]
    assert np.allclose(np.ravel(info["traj_pts"]), [0.0, 3.0, 6.0])
    # control channel dropped: 31 channels -> 30 usable
    arr = np.load(d / "SP1_MP-1-2.npy")
    assert arr.shape[1] == 2 and arr.shape[2] == 1600  # 48k->16k
    assert (d / "_MP-1-2_sil_1.wav").exists()
    assert counts["noise"] > 0


def test_strip_noise_silence_trims_lead_in():
    fs = 1000
    n = np.zeros((10 * fs, 2))
    # silence lead-in/out with activity between 2 s and 8 s (the corpus
    # recordings put the onset within the first boundary_time=3 s)
    n[2 * fs:8 * fs] = RNG.standard_normal((6 * fs, 2))
    with pytest.raises(ValueError):
        strip_noise_silence(np.zeros((10 * fs, 2)) + 1e-12, fs)
    out = strip_noise_silence(n, fs)
    assert 4 * fs <= out.shape[0] <= 7 * fs
    assert np.abs(out).max() > 0.1


# -------------------------------------------------------------------- DCASE

def _make_dcase_tree(root: Path):
    base = root / "TAU-SRIR_DB"
    base.mkdir(parents=True)
    ntraj, nhei, npoint, nmic, nsamp = 2, 1, 3, 4, 2400

    # tetra geometry: radius 0.042 m, az/el in degrees
    azel = np.array([[45.0, 35.0], [-45.0, 145.0],
                     [135.0, 145.0], [-135.0, 35.0]])
    # per-room struct: field order matters for positional fallback
    traj_cell = np.empty((ntraj, 1), object)
    for t in range(ntraj):
        hei_cell = np.empty((nhei, 1), object)
        for h in range(nhei):
            hei_cell[h, 0] = np.stack(
                [np.linspace(0, np.pi / 2, npoint),
                 np.full(npoint, np.pi / 3),
                 np.full(npoint, 1.5)], axis=1)  # (npoint, 3) sph
        traj_cell[t, 0] = hei_cell
    room = np.zeros((1,), dtype=[("name", object), ("nrirs", object),
                                 ("rirs", object)])
    room[0]["name"] = "bomb_shelter"
    room[0]["nrirs"] = np.full((ntraj, nhei), npoint)
    room[0]["rirs"] = traj_cell
    rooms = np.empty((1, 10), object)
    for i in range(10):
        rooms[0, i] = room
    scipy.io.savemat(base / "rirdata.mat", {"rirdata": {
        "room": rooms, "fs": 24000.0, "tetra_mic_radius_m": 0.042,
        "tetra_mic_azel_deg": azel}})

    dims = np.empty((1, 10), object)
    poss = np.empty((1, 10), object)
    for i in range(10):
        dims[0, i] = np.array([10.0, 8.0, 3.0])
        poss[0, i] = np.array([5.0, 4.0, 1.5])
    scipy.io.savemat(base / "measinfo.mat",
                     {"measinfo": {"dimensions": dims, "micPosition": poss}})

    mic_cell = np.empty((ntraj, 1), object)
    for t in range(ntraj):
        hei_cell = np.empty((nhei, 1), object)
        for h in range(nhei):
            hei_cell[h, 0] = RNG.standard_normal(
                (nsamp, nmic, npoint)).astype(np.float32) * 0.05
        mic_cell[t, 0] = hei_cell
    scipy.io.savemat(base / "rirs_01_bomb_shelter.mat",
                     {"rirs": {"mic": mic_cell}})

    noise_dir = root / "TAU-SNoise_DB" / "01_bomb_shelter"
    noise_dir.mkdir(parents=True)
    write_wav(str(noise_dir / "ambience_tetra_24k_edited.wav"),
              (RNG.standard_normal((24000, 4)) * 0.01).astype(np.float32),
              24000)


def test_dcase_every_trajectory_point(tmp_path):
    _make_dcase_tree(tmp_path)
    out = tmp_path / "out"
    counts = DCASEExtractor(str(tmp_path)).extract(str(out))
    d = out / "bomb_shelter" / "tetra"
    names = {f.name for f in d.glob("SP*.npy")}
    # 2 traj x 1 height x 3 points, tetra radius 0.042 -> all 6 pairs valid
    assert "SP1-1-1_MP-1-2.npy" in names
    assert "SP1-1-3_MP-1-2.npy" in names, "all trajectory points, not just 0"
    assert "SP2-1-2_MP-3-4.npy" in names
    assert counts["rir"] == 2 * 1 * 3 * 6
    info = dict(np.load(d / "SP1-1-2_MP-1-2_info.npz"))
    assert np.allclose(info["room_sz"], [10.0, 8.0, 3.0])
    assert np.allclose(info["array_pos"], [5.0, 4.0, 1.5])
    assert "traj_pts" in info
    # mic geometry: physical tetra positions around the array center
    d01 = np.linalg.norm(info["mic_pos"][0] - info["mic_pos"][1])
    assert 0.03 <= d01 <= 0.09
    arr = np.load(d / "SP1-1-2_MP-1-2.npy")
    assert arr.shape == (1, 2, 1600, 1)  # 24k -> 16k
    assert (d / "_MP-1-2_silence.wav").exists()
    assert counts["noise"] == 6


# ---------------------------------------------------------------------- MIR

def _make_mir_tree(root: Path):
    d = root / "Impulse_response_Acoustic_Lab_Bar-Ilan_University"
    d.mkdir(parents=True)
    spacing = np.array([4.0, 4.0, 4.0, 8.0, 4.0, 4.0, 4.0])  # cm
    name = ("Impulse_response_Acoustic_Lab_Bar-Ilan_University_"
            "(Reverberation_0.160s)_4-4-4-8-4-4-4_1m_000.mat")
    scipy.io.savemat(d / name, {
        "impulse_response": _decaying_rir(20000, 8, fs=48000),
        "simpar": {"fs": 48000.0},
        "metapar": {"reverberation": 0.16, "mic_spacing": spacing,
                    "mic_position": "pos: 030 deg, 150 deg",
                    "azimuth": np.array([0.0]),
                    "distance": np.array([1.0])}})


def test_mir_spacing_geometry(tmp_path):
    _make_mir_tree(tmp_path)
    out = tmp_path / "out"
    counts = MIRExtractor(str(tmp_path)).extract(str(out))
    d = out / "R1" / "4-4-4-8-4-4-4"
    files = sorted(d.glob("SP1m-000_MP*.npy"))
    assert files, "MIR naming SP<dist>-<angle>"
    # geometry from mic_spacing: along = |cum - center| / 100 with two wings
    geom = MIRExtractor.geometry(spacing_cm := np.array(
        [4.0, 4.0, 4.0, 8.0, 4.0, 4.0, 4.0]), (30.0, 150.0))
    assert geom.shape == (8, 3)
    # the two central mics sit 8 cm apart along different wings
    d34 = np.linalg.norm(geom[3] - geom[4])
    assert 0.03 <= d34 <= 0.20
    info = dict(np.load(str(files[0]).replace(".npy", "_info.npz")))
    assert info["T60"] == pytest.approx(0.16)
    # RIR truncated at 2*T60 before resample: 0.32s * 16k = 5120
    arr = np.load(files[0])
    assert arr.shape[2] == int(0.16 * 2 * 16000)
    assert counts["rir"] == len(files)


# ------------------------------------------------------------- room splits

def test_room_splits_prevent_leakage():
    tr = rooms_for_stage("DCASE", "pretrain")
    va = rooms_for_stage("DCASE", "preval")
    assert set(tr).isdisjoint(va)
    assert "tb103" in va and "se203" in va
    tr_b = rooms_for_stage("BUTReverb", "pretrain")
    va_b = rooms_for_stage("BUTReverb", "preval")
    assert set(tr_b).isdisjoint(va_b) and va_b == ["VUT_FIT_E112"]
    assert rooms_for_stage("ACE", "pretrain") is None
    with pytest.raises(ValueError):
        rooms_for_stage("ACE", "preval")
    assert rooms_for_stage("LOCATA", "preval") is None  # unknown corpus
