"""Bespoke real-recording corpus readers on synthetic trees, plus the
header-only audio probe and the TextGrid overlap-removal machinery."""
import struct
from pathlib import Path

import numpy as np
import pytest

from sarssl_tpu.data.corpora import (
    AISHELL4Reader, AMIReader, CHiME3Reader, LOCATAReader, LibriCSSReader,
    M2MeTReader, MCWSJReader, RealMANReader, realman_high_resolution_array,
    circular_array, select_pairs, MCWSJ_ARRAY, AISHELL4_ARRAY, CHIME3_ARRAY)
from sarssl_tpu.data.wavio import audio_info, read_audio, read_wav, write_wav
from sarssl_tpu.data.textgrid import single_speaker_windows

FS = 16000
RNG = np.random.default_rng(7)


def _wav(path, nsample, nch, fs=FS):
    path.parent.mkdir(parents=True, exist_ok=True)
    sig = (RNG.standard_normal((nsample, nch)) * 0.1).astype(np.float32)
    write_wav(str(path), sig, fs)
    return sig


# ----------------------------------------------------------------- wavio

def test_audio_info_header_only_and_ranged_read(tmp_path):
    p = tmp_path / "a.wav"
    sig = _wav(p, 32000, 3)
    info = audio_info(str(p))
    assert (info.frames, info.fs, info.channels) == (32000, FS, 3)
    assert info.duration == pytest.approx(2.0)
    # ranged read == full read slice
    part, fs = read_audio(str(p), 1000, 5000)
    full, _ = read_wav(str(p))
    assert fs == FS
    np.testing.assert_allclose(part, full[1000:5000], rtol=0, atol=0)
    np.testing.assert_allclose(part, sig[1000:5000], rtol=0, atol=1e-6)


def test_audio_info_pcm16(tmp_path):
    from scipy.io import wavfile
    p = tmp_path / "i16.wav"
    data = (RNG.standard_normal((8000, 2)) * 8000).astype(np.int16)
    wavfile.write(str(p), FS, data)
    info = audio_info(str(p))
    assert (info.frames, info.channels, info.sampwidth) == (8000, 2, 2)
    part, _ = read_audio(str(p), 100, 200)
    assert part.shape == (100, 2) and np.abs(part).max() <= 1.0


def test_flac_streaminfo_probe(tmp_path):
    # hand-assemble a FLAC header: fLaC + last-block STREAMINFO
    fs, nch, bits, frames = 48000, 4, 16, 123456
    blk = bytearray(34)
    blk[10] = (fs >> 12) & 0xFF
    blk[11] = (fs >> 4) & 0xFF
    blk[12] = ((fs & 0xF) << 4) | ((nch - 1) << 1) | ((bits - 1) >> 4)
    blk[13] = (((bits - 1) & 0xF) << 4) | ((frames >> 32) & 0xF)
    blk[14:18] = struct.pack(">I", frames & 0xFFFFFFFF)
    p = tmp_path / "x.flac"
    p.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(blk))
    info = audio_info(str(p))
    assert (info.frames, info.fs, info.channels) == (frames, fs, nch)


# -------------------------------------------------------------- textgrid

def test_single_speaker_windows_reference_algorithm():
    # sentences: [0,3], [10,12], [12.5,30], [31,33]
    ivals = [(0.0, 3.0), (10.0, 12.0), (12.5, 30.0), (31.0, 33.0)]
    wins = single_speaker_windows(ivals, min_dur=4.0, audio_duration=40.0)
    # window i: [latest end before i, start of i+1]
    # i=0: [0, 10] len 10 ok; i=1: [3, 12.5] len 9.5 ok; i=2: [12, 31] len 19
    assert wins == [(0.0, 10.0, 10.0), (3.0, 12.5, 9.5), (12.0, 31.0, 19.0)]
    # overlapping sentences kill the window between them
    ivals = [(0.0, 8.0), (2.0, 9.0), (20.0, 22.0)]
    wins = single_speaker_windows(ivals, min_dur=4.0, audio_duration=40.0)
    assert wins == [(8.0, 20.0, 12.0)]


# ---------------------------------------------------------------- RealMAN

def test_realman_geometry_and_scene_split(tmp_path):
    geom = realman_high_resolution_array()
    assert geom.shape == (32, 3)
    # inner ring at 3 cm, outer at 9 cm, vertical stack at 4.5/9 cm
    assert np.linalg.norm(geom[1]) == pytest.approx(0.03)
    assert np.linalg.norm(geom[17]) == pytest.approx(0.09)
    assert geom[28, 2] == pytest.approx(0.09)

    # synthetic tree: train scene + val scene, 8 channel files each (subset)
    for scene in ("LivingRoom1", "LivingRoom2"):
        for k in range(32):
            _wav(tmp_path / "ma_speech" / scene / "static" / "spk1" /
                 f"utt1.CH{k}.wav", int(1.5 * FS), 1)
    ds = RealMANReader(str(tmp_path), T=1.04, fs=FS, stage="train", seed=3)
    sig = ds.sample()
    assert sig.shape == (int(1.04 * FS), 2)
    assert all("LivingRoom1" in it.paths[0] for it in ds.items), \
        "train stage must exclude val scenes"
    ds_val = RealMANReader(str(tmp_path), T=1.04, fs=FS, stage="val")
    assert all("LivingRoom2" in it.paths[0] for it in ds_val.items)


# ------------------------------------------------------------------ MCWSJ

def test_mcwsj_channel_files_and_circular_geometry(tmp_path):
    pairs = select_pairs(MCWSJ_ARRAY)
    # 20 cm circle: opposite mics at 0.2 m are included, adjacent 0.0765 m too
    dists = {round(float(np.linalg.norm(MCWSJ_ARRAY[a] - MCWSJ_ARRAY[b])), 3)
             for a, b in pairs}
    assert 0.2 in dists and 0.077 in dists

    d = tmp_path / "MC_WSJ_AV_Dev" / "audio" / "stat" / "T7" / "array1" / "adap"
    for k in range(1, 9):
        _wav(d / f"spk_u1-{k}_T.wav", int(2.0 * FS), 1)
    ds = MCWSJReader(str(tmp_path), T=1.04, fs=FS, stage="train")
    sig = ds.sample()
    assert sig.shape == (int(1.04 * FS), 2)
    # channel substitution resolved distinct per-channel files
    it = ds.items[0]
    assert len(it.paths) == 2 and it.paths[0] != it.paths[1]


# --------------------------------------------------------------- LibriCSS

def test_libricss_seven_channel(tmp_path):
    d = (tmp_path / "exp" / "data" / "7ch" / "utterances" /
         "overlap_ratio_0.0_sil0.1_1.0_session0_actual0.0")
    _wav(d / "segment_0.wav", int(3.0 * FS), 7)
    ds = LibriCSSReader(str(tmp_path), T=1.04, fs=FS, stage="train")
    assert ds.sample().shape == (int(1.04 * FS), 2)
    # center+hexagon at 4.25 cm: all 42 ordered pairs valid
    assert len(ds._pairs) == 42


# -------------------------------------------------------------------- AMI

def test_ami_all_pairs_and_session_prefix(tmp_path):
    d = tmp_path / "ScenarioMeetings" / "ES2002" / "audio"
    for k in range(1, 9):
        _wav(d / f"ES2002a.Array1-0{k}.wav", int(2.0 * FS), 1)
    # session with non-matching prefix must be ignored
    d2 = tmp_path / "ScenarioMeetings" / "XX9999" / "audio"
    for k in range(1, 9):
        _wav(d2 / f"XX9999a.Array1-0{k}.wav", int(2.0 * FS), 1)
    ds = AMIReader(str(tmp_path), T=1.04, fs=FS, stage="train")
    assert all("ES2002" in it.paths[0] for it in ds.items)
    assert len(ds._pairs) == 8 * 7  # all ordered pairs, no geometry
    assert ds.sample().shape == (int(1.04 * FS), 2)


# --------------------------------------------------------------- AISHELL4

TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 30
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "SPK01"
        xmin = 0
        xmax = 30
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 2
            text = "hello"
        intervals [2]:
            xmin = 2
            xmax = 20
            text = ""
        intervals [3]:
            xmin = 20
            xmax = 22
            text = "again"
    item [2]:
        class = "IntervalTier"
        name = "SPK02"
        xmin = 0
        xmax = 30
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 25
            text = ""
        intervals [2]:
            xmin = 25
            xmax = 27
            text = "reply"
"""


def test_aishell4_overlap_removal_windows(tmp_path):
    room = "M_R003"
    wav_dir = tmp_path / "test" / "wav"
    tg_dir = tmp_path / "test" / "TextGrid"
    name = f"20200707_{room}S01C01"
    _wav(wav_dir / f"{name}.wav", int(30 * FS), 8)
    tg_dir.mkdir(parents=True)
    (tg_dir / f"{name}.TextGrid").write_text(TEXTGRID)

    ds = AISHELL4Reader(str(tmp_path), T=4.0, fs=FS, stage="val",
                        remove_spkoverlap=True)
    # sentences at [0,2], [20,22], [25,27]: windows [0,20) and [2,25)
    wins = {it.window for it in ds.items}
    assert wins == {(0.0, 20.0), (2.0, 25.0)}
    sig = ds.sample()
    assert sig.shape == (4 * FS, 2)
    # all crops stay inside a single-speaker window
    # geometry: 10 cm circle -> all 56 ordered pairs within [0.03, 0.20]
    assert len(ds._pairs) == 56

    # without overlap removal the whole session is one item pool
    ds2 = AISHELL4Reader(str(tmp_path), T=4.0, fs=FS, stage="val",
                         remove_spkoverlap=False)
    assert all(it.window is None for it in ds2.items)
    # train stage must not see the val room
    with pytest.raises(AssertionError):
        AISHELL4Reader(str(tmp_path), T=4.0, fs=FS, stage="train",
                       remove_spkoverlap=False)


# ------------------------------------------------------------------ M2MeT

def test_m2met_rooms_and_overlap(tmp_path):
    base = tmp_path / "Test_Ali" / "Test_Ali_far"
    _wav(base / "audio_dir" / "R8002_M8001_MS801.wav", int(30 * FS), 8)
    (base / "textgrid_dir").mkdir(parents=True)
    (base / "textgrid_dir" / "R8002_M8001.TextGrid").write_text(TEXTGRID)
    ds = M2MeTReader(str(tmp_path), T=4.0, fs=FS, stage="val",
                     remove_spkoverlap=True)
    assert {it.window for it in ds.items} == {(0.0, 20.0), (2.0, 25.0)}
    assert ds.sample().shape == (4 * FS, 2)


# ----------------------------------------------------------------- CHiME3

def test_chime3_tablet_geometry_and_stage(tmp_path):
    d = tmp_path / "data" / "audio" / "16kHz" / "isolated" / "dt05_bth"
    for k in range(6):
        _wav(d / f"F01_22GC010X_BTH.CH{k}.wav", int(2.0 * FS), 1)
    ds = CHiME3Reader(str(tmp_path), T=1.04, fs=FS, stage="val")
    assert ds.sample().shape == (int(1.04 * FS), 2)
    # tablet: only same-edge pairs (0.1/0.2 m) are valid, cross-edge 1.9 m not
    dists = {round(float(np.linalg.norm(CHIME3_ARRAY[a] - CHIME3_ARRAY[b])), 2)
             for a, b in ds._pairs}
    assert dists == {0.1, 0.2}


# ----------------------------------------------------------------- LOCATA

def test_locata_reader_arrays(tmp_path):
    d = tmp_path / "eval" / "task1" / "recording1" / "dicit"
    _wav(d / "audio_array_dicit.wav", int(2.0 * FS), 15)
    ds = LOCATAReader(str(tmp_path), T=1.04, fs=FS, stage="train",
                      arrays=("dicit",))
    assert ds.sample().shape == (int(1.04 * FS), 2)
    # dicit pairs: only spacings within [3,20] cm (e.g. mics at 0.04 & 0.08)
    assert all(len(it.paths) == 1 for it in ds.items)
