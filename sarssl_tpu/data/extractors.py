"""Real-RIR corpus extractors (corpus-faithful).

Equivalent of /root/reference/code/data_generation/gen_real_rir.py: extract
2-channel RIR pairs (mic spacing within [0.03, 0.20] m) plus matched recorded
noise from six public RIR corpora into the reference's on-disk schema

    <save_dir>/<room>/<array>/SP<src>_MP<tag>-<a>-<b>.npy     float32
        array layout (npoints, nmic=2, nsample, nsources=1)
    ...same stem..._info.npz                                  room_sz/mic_pos/
                                                              traj_pts/T60/fs
    ...(SP..)_MP<tag>-<a>-<b>_<noisetype>[_k].wav             matched noise

so trees written here are interchangeable with reference-produced ones.

Per-corpus behavior encoded (citations are reference gen_real_rir.py):

  DCASE / TAU-SRIR   tetra-array geometry from rirdata.mat radius+azimuth/
                     elevation, *every* trajectory point of every (traj,
                     height) written as its own source (:41-215);
  MIR                per-file mic_spacing metadata -> centered two-wing
                     linear geometry, RIR truncated at 2*T60 (:217-307);
  MeshRIR            one ir_<i>.npy per microphone holding (nsrc, irlen);
                     441-mic grid positions from pos_mic.npy (:309-421);
  dEchorate          HDF5 master RIRs, 6x5-mic arrays from the annotation
                     h5, omni sources only, control channel dropped; noise
                     (white/babble/silence) with energy-gated silence
                     stripping (:423-669);
  BUTReverb          per-mic mic_meta.txt geometry + RT60s, 8-mic spherical
                     array wavs, silence recordings as noise (:671-871);
  ACE                published array geometries (Chromebook/Mobile/Crucif/
                     Lin8Ch/EM32), corpus CSV T60/DRR annotations, per-pair
                     direct-path peak search -> DRR/C50/ABS (:873-1160).

Deviations from the reference, deliberate and documented inline:
  * DCASE mic azimuth/elevation are converted degrees->radians before
    sph->cart (the reference feeds degrees straight into sin/cos);
  * DCASE room size/array position are indexed by the room's position in
    the *full* 10-room list (the reference indexes measinfo by the reduced
    9-room list, which mismatches after the excluded room);
  * dEchorate pair distances are checked on the actual array's mic
    positions (the reference always checks array A1's coordinates).

No audio corpus ships with this repo; every extractor is exercised by
synthetic-tree unit tests (tests/test_extractors.py) that replicate each
corpus's file format.
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from itertools import combinations
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import scipy.io
import scipy.signal

from .wavio import read_wav, write_wav

MIC_DIST_RANGE = (0.03, 0.20)
EPS = 1e-8


def pair_in_range(mic_pos: np.ndarray,
                  dist_range: Tuple[float, float]) -> bool:
    """True when the (2, 3) mic pair is spaced within ``dist_range``."""
    d = float(np.linalg.norm(mic_pos[0] - mic_pos[1]))
    return dist_range[0] <= d <= dist_range[1]


def find_dp_index(rir_1d: np.ndarray, th_ratio: float = 0.5,
                  num_largest: int = 5) -> Optional[int]:
    """Direct-path sample index: earliest of the ``num_largest`` highest
    positive peaks that reach ``th_ratio`` of the RIR maximum
    (reference ACERIRDataset._find_dp_from_rir, gen_real_rir.py:931-959)."""
    peaks, _ = scipy.signal.find_peaks(rir_1d)
    if len(peaks) == 0:
        return None
    heights = rir_1d[peaks]
    top = peaks[np.argsort(heights)[-num_largest:]]
    keep = top[rir_1d[top] >= th_ratio * float(np.max(rir_1d))]
    return int(keep.min()) if len(keep) else None


def _energy_ratio_db(rir: np.ndarray, sel: np.ndarray) -> np.ndarray:
    num = np.sum(rir ** 2 * sel, axis=-1)
    den = np.sum(rir ** 2 * (1.0 - sel), axis=-1)
    return 10.0 * np.log10(num / (den + EPS) + EPS)


def dp_window_metrics(rir_pair: np.ndarray, fs: int) -> Dict[str, float]:
    """DRR (+/-2.5 ms around the found dp peak) and C50 (early <= dp+50 ms)
    of the reference channel, from peak-search direct paths
    (gen_real_rir.py:1060-1092)."""
    nmic, nsample = rir_pair.shape
    t = np.arange(nsample)[None, :]
    dp = np.array([find_dp_index(rir_pair[m, : int(fs / 160)]) or
                   int(np.argmax(np.abs(rir_pair[m]))) for m in range(nmic)],
                  dtype=np.int64)[:, None]
    half = int(fs * 2.5 / 1000)
    dp_sel = ((t >= dp - half) & (t <= dp + half)).astype(np.float64)
    early_sel = (t <= dp + int(fs * 50 / 1000)).astype(np.float64)
    return {
        "DRR": float(_energy_ratio_db(rir_pair, dp_sel)[0]),
        "C50": float(_energy_ratio_db(rir_pair, early_sel)[0]),
    }


def strip_noise_silence(noise: np.ndarray, fs: int, boundary_time: float = 3,
                        filt_time: float = 0.4, silence_time: float = 1.5
                        ) -> np.ndarray:
    """Trim leading/trailing silence from a noise recording by thresholding
    its smoothed energy envelope (dEchorate recordings begin and end with
    silence; reference rm_silence_from_noise, gen_real_rir.py:597-615)."""
    energy = np.abs(noise) ** 2
    flen = int(fs * filt_time)
    filt = np.ones((flen, 1)) / flen
    env = scipy.signal.convolve(energy, filt, mode="full").mean(axis=1)
    sil_lo = env[flen:int(fs * silence_time)]
    body = env[int(fs * boundary_time):len(env) - int(fs * boundary_time)]
    th = (sil_lo.mean() + body.mean()) / 4 + (sil_lo.max() + body.min()) / 4
    on = env > th
    st = int(np.argmax(on[: int(fs * boundary_time)]))
    ed = int(np.argmin(on[int(fs * boundary_time):])) + int(fs * boundary_time) - flen
    if ed <= st or (ed - st) / fs <= 3:
        raise ValueError("noise silence stripping found no usable segment")
    return noise[st:ed]


@dataclass
class RIRRecord:
    """One multi-channel RIR measurement (raw corpus rate)."""

    room: str
    array: str
    source_id: str                  # goes after 'SP' in the file stem
    rir: np.ndarray                 # (nsample, nmic)
    fs: int
    mic_pos: np.ndarray             # (nmic, 3)
    traj_pts: Optional[np.ndarray] = None   # (npoints, 3, nsources)
    info: Dict = field(default_factory=dict)
    mp_tag: str = ""                # e.g. ACE array-position prefix


@dataclass
class NoiseRecord:
    """One matched noise recording for a (room, array)."""

    room: str
    array: str
    noise_type: str                 # 'silence' | 'ambience' | ...
    sig: np.ndarray                 # (nsample, nmic)
    fs: int
    mic_pos: np.ndarray
    sp_tag: str = ""                # BUT prepends 'SP<spk>'
    index_tag: str = ""             # dEchorate appends '_<k>'
    mp_tag: str = ""


class CorpusExtractor:
    """Shared pair-selection / resampling / writing machinery."""

    name = "base"

    def __init__(self, data_dir: str, fs: int = 16000,
                 mic_dist_range: Tuple[float, float] = MIC_DIST_RANGE):
        self.data_dir = data_dir
        self.fs = fs
        self.mic_dist_range = mic_dist_range

    # -- per-corpus iterators -------------------------------------------
    def rir_records(self) -> Iterable[RIRRecord]:  # pragma: no cover
        raise NotImplementedError

    def noise_records(self) -> Iterable[NoiseRecord]:
        return ()

    def pair_info(self, rec: RIRRecord, rir_pair: np.ndarray,
                  mic_idxes: Tuple[int, int]) -> Dict:
        """Per-pair extra info (ACE adds dp-based DRR/C50)."""
        return {}

    # -- shared machinery -------------------------------------------------
    def _pairs(self, mic_pos: np.ndarray) -> List[Tuple[int, int]]:
        return [(a, b) for a, b in combinations(range(mic_pos.shape[0]), 2)
                if pair_in_range(mic_pos[[a, b]], self.mic_dist_range)]

    def _resample(self, sig: np.ndarray, fs: int) -> np.ndarray:
        if fs == self.fs:
            return sig
        return scipy.signal.resample_poly(sig, self.fs, fs, axis=0)

    def extract(self, save_dir: str, what: Sequence[str] = ("rir", "noise"),
                verbose: bool = True) -> Dict[str, int]:
        counts = {"rir": 0, "noise": 0}
        if "rir" in what:
            for rec in self.rir_records():
                for a, b in self._pairs(rec.mic_pos):
                    rir = self._resample(rec.rir[:, [a, b]], rec.fs)
                    rirs4 = rir.T[None, :, :, None]  # (1, 2, nsample, 1)
                    out_dir = os.path.join(save_dir, rec.room, rec.array)
                    os.makedirs(out_dir, exist_ok=True)
                    stem = f"SP{rec.source_id}_MP{rec.mp_tag}-{a + 1}-{b + 1}"
                    np.save(os.path.join(out_dir, stem + ".npy"),
                            rirs4.astype(np.float32))
                    info = {"mic_pos": rec.mic_pos[[a, b]], "fs": self.fs}
                    if rec.traj_pts is not None:
                        info["traj_pts"] = rec.traj_pts
                    info.update(rec.info)
                    info.update(self.pair_info(rec, rirs4[0, :, :, 0], (a, b)))
                    np.savez(os.path.join(out_dir, stem + "_info.npz"), **info)
                    counts["rir"] += 1
        if "noise" in what:
            for noi in self.noise_records():
                for a, b in self._pairs(noi.mic_pos):
                    sig = self._resample(noi.sig[:, [a, b]], noi.fs)
                    out_dir = os.path.join(save_dir, noi.room, noi.array)
                    os.makedirs(out_dir, exist_ok=True)
                    stem = (f"{noi.sp_tag}_MP{noi.mp_tag}-{a + 1}-{b + 1}"
                            f"_{noi.noise_type}{noi.index_tag}")
                    write_wav(os.path.join(out_dir, stem + ".wav"),
                              sig.astype(np.float32), self.fs)
                    counts["noise"] += 1
        if verbose:
            print(f"{self.name}: wrote {counts['rir']} pair RIRs, "
                  f"{counts['noise']} noise wavs to {save_dir}")
        return counts


# ---------------------------------------------------------------------------
# matlab helpers (no mat73 in the environment; v7.3 files are HDF5)
# ---------------------------------------------------------------------------

def load_mat_any(path: str):
    """Load a .mat as nested python structures: scipy for <= v7.2,
    h5py-based traversal for v7.3."""
    try:
        return scipy.io.loadmat(path, squeeze_me=False)
    except NotImplementedError:
        import h5py

        def deref(obj, f):
            if isinstance(obj, h5py.Dataset):
                arr = obj[()]
                if arr.dtype == np.dtype("O") or arr.dtype.kind == "O":
                    return np.vectorize(
                        lambda r: deref(f[r], f), otypes=[object])(arr)
                if isinstance(arr, np.ndarray) and arr.dtype.kind in "fiu":
                    return arr.T  # MATLAB stores transposed
                return arr
            if isinstance(obj, h5py.Group):
                return {k: deref(obj[k], f) for k in obj
                        if not k.startswith("#")}
            return obj

        with h5py.File(path, "r") as f:
            return {k: deref(f[k], f) for k in f if not k.startswith("#")}


def _mat_field(struct, name: str, idx: int):
    """Field of a scipy mat struct array by name (fall back to position)."""
    if hasattr(struct, "dtype") and struct.dtype.names:
        if name in struct.dtype.names:
            return struct[name]
        return struct[struct.dtype.names[idx]]
    if isinstance(struct, dict):
        return struct[name]
    raise TypeError(f"unsupported mat struct {type(struct)}")


def sph2cart(sph: np.ndarray) -> np.ndarray:
    """[azi, ele, r] (radians, elevation from +z) -> [x, y, z]."""
    azi, ele, r = sph[..., 0], sph[..., 1], sph[..., 2]
    return np.stack([r * np.sin(ele) * np.cos(azi),
                     r * np.sin(ele) * np.sin(azi),
                     r * np.cos(ele)], axis=-1)


# ---------------------------------------------------------------------------
# DCASE / TAU-SRIR
# ---------------------------------------------------------------------------

class DCASEExtractor(CorpusExtractor):
    """TAU-SRIR DB (DCASE SELD): trajectory RIRs of a tetrahedral array.

    Layout (reference gen_real_rir.py:41-215):
      TAU-SRIR_DB/rirdata.mat      rooms, fs, tetra mic radius + azel (deg),
                                   per-room trajectory point spherical coords
      TAU-SRIR_DB/measinfo.mat     room dimensions + array positions
      TAU-SRIR_DB/rirs_<nn>_<room>.mat   rirs.mic[traj][height]
                                   -> (nsample, nmic, npoint)
      TAU-SNoise_DB/<nn>_<room>/ambience_tetra_24k_edited.wav
    Every trajectory point becomes its own source 'SP<t>-<h>-<p>'.
    """

    name = "DCASE"
    ROOMS_ALL = ["bomb_shelter", "gym", "pb132", "pc226", "sa203", "sc203",
                 "se201", "se203", "tb103", "tc352"]
    ROOMS = ["bomb_shelter", "gym", "pb132", "pc226", "sa203", "sc203",
             "se203", "tb103", "tc352"]  # se201 excluded as in the reference

    def _load_meta(self):
        base = os.path.join(self.data_dir, "TAU-SRIR_DB")
        md = scipy.io.loadmat(os.path.join(base, "rirdata.mat"),
                              squeeze_me=False)
        rd = md["rirdata"]
        rooms = _mat_field(rd, "room", 0)[0][0]
        rir_fs = float(np.squeeze(_mat_field(rd, "fs", 1)[0][0]))
        radius = np.squeeze(_mat_field(rd, "tetra_mic_radius_m", 2)[0][0])
        azel_deg = np.atleast_2d(
            np.squeeze(_mat_field(rd, "tetra_mic_azel_deg", 3)[0][0]))
        # deviation: reference feeds degrees straight into sin/cos; we
        # convert so the saved geometry (and downstream TDOA) is physical
        azel = np.deg2rad(azel_deg.astype(np.float64))
        sph = np.concatenate(
            [azel, np.full((azel.shape[0], 1), float(np.mean(radius)))], axis=1)
        mic_pos_tetra = sph2cart(sph)

        mi = scipy.io.loadmat(os.path.join(base, "measinfo.mat"),
                              squeeze_me=False)["measinfo"]
        room_szs = _mat_field(mi, "dimensions", 0)[0][0]
        array_poss = _mat_field(mi, "micPosition", 1)[0][0]
        return base, rooms, rir_fs, mic_pos_tetra, room_szs, array_poss

    def rir_records(self):
        base, rooms_meta, rir_fs, mic_tetra, room_szs, array_poss = \
            self._load_meta()
        for room_name in self.ROOMS:
            # deviation: index meta by the full-list position, which is what
            # the files are actually ordered by
            ridx = self.ROOMS_ALL.index(room_name)
            rank = f"{ridx + 1:02d}"
            rir_path = os.path.join(base, f"rirs_{rank}_{room_name}.mat")
            if not os.path.exists(rir_path):
                continue
            data = load_mat_any(rir_path)
            rir_sets = self._traj_sets(data)
            room_sz = np.squeeze(np.asarray(room_szs[0, ridx])).astype(float) \
                if room_szs.shape[-1] > ridx else np.zeros(3)
            array_pos = np.squeeze(np.asarray(array_poss[0, ridx])).astype(float) \
                if array_poss.shape[-1] > ridx else np.zeros(3)
            mic_poss = array_pos[None, :] + mic_tetra
            traj_sph = self._traj_sph(rooms_meta, ridx)
            for t, heights in enumerate(rir_sets):
                for h, rirs in enumerate(heights):
                    rirs = np.asarray(rirs, dtype=np.float64)
                    if rirs.ndim == 2:
                        rirs = rirs[:, :, None]
                    npoint = rirs.shape[2]
                    for pidx in range(npoint):
                        traj_pts = None
                        if traj_sph is not None:
                            try:
                                pts = sph2cart(np.atleast_2d(
                                    traj_sph[t][h])[pidx:pidx + 1])
                                traj_pts = pts[:, :, None]
                            except (IndexError, TypeError):
                                traj_pts = None
                        yield RIRRecord(
                            room=room_name, array="tetra",
                            source_id=f"{t + 1}-{h + 1}-{pidx + 1}",
                            rir=rirs[:, :, pidx], fs=int(rir_fs),
                            mic_pos=mic_poss,
                            traj_pts=traj_pts,
                            info={"room_sz": room_sz, "array_pos": array_pos})

    @staticmethod
    def _traj_sets(data) -> List[List[np.ndarray]]:
        """rirs.mic as a nested [traj][height] list of (nsample, nmic, npt)."""
        rirs = data["rirs"]
        mic = rirs["mic"] if isinstance(rirs, dict) else \
            _mat_field(rirs, "mic", 0)[0][0]
        out = []
        for traj in np.ravel(np.asarray(mic, dtype=object)):
            heights = []
            for h in np.ravel(np.asarray(traj, dtype=object)):
                heights.append(np.asarray(h))
            out.append(heights)
        return out

    @staticmethod
    def _unwrap_cell(x):
        """Strip nested singleton MATLAB cell wrappers."""
        while (isinstance(x, np.ndarray) and x.dtype == object
               and x.size == 1):
            x = x.ravel()[0]
        return x

    @classmethod
    def _traj_sph(cls, rooms_meta, ridx: int):
        """Per-(traj, height) spherical trajectory points from rirdata."""
        try:
            room = rooms_meta[0, ridx] if rooms_meta.ndim == 2 \
                else rooms_meta[ridx]
            cells = cls._unwrap_cell(_mat_field(room, "rirs", 2))
            out = []
            for traj in np.atleast_1d(cells).ravel():
                traj = cls._unwrap_cell(traj)
                if isinstance(traj, np.ndarray) and traj.dtype != object:
                    hs = [np.asarray(traj, dtype=np.float64)]  # one height
                else:
                    hs = [np.asarray(cls._unwrap_cell(h), dtype=np.float64)
                          for h in np.atleast_1d(traj).ravel()]
                out.append(hs)
            return out
        except Exception:
            return None

    def noise_records(self):
        noise_base = os.path.join(
            str(self.data_dir).replace("SRIR", "SNoise"), "TAU-SNoise_DB")
        if not os.path.isdir(noise_base):
            noise_base = os.path.join(self.data_dir, "TAU-SNoise_DB")
        _, _, _, mic_tetra, _, array_poss = self._load_meta()
        for room_name in self.ROOMS:
            ridx = self.ROOMS_ALL.index(room_name)
            rank = f"{ridx + 1:02d}"
            wav = os.path.join(noise_base, f"{rank}_{room_name}",
                               "ambience_tetra_24k_edited.wav")
            if not os.path.exists(wav):
                continue
            sig, fs = read_wav(wav)
            array_pos = np.squeeze(np.asarray(array_poss[0, ridx])).astype(float) \
                if array_poss.shape[-1] > ridx else np.zeros(3)
            yield NoiseRecord(room=room_name, array="tetra",
                              noise_type="silence", sig=sig, fs=fs,
                              mic_pos=array_pos[None, :] + mic_tetra)


# ---------------------------------------------------------------------------
# MIR (Bar-Ilan multichannel impulse response database)
# ---------------------------------------------------------------------------

class MIRExtractor(CorpusExtractor):
    """MIR: 8-mic two-wing linear arrays, three T60 settings
    (reference gen_real_rir.py:217-307). Geometry comes from each file's
    ``mic_spacing`` (cm) and the two wing angles in ``mic_position``."""

    name = "MIR"
    ROOM_SZ = np.array([6.0, 6.0, 2.4])
    T60_SET = ["0.160", "0.360", "0.610"]
    ROOMS = ["R1", "R2", "R3"]
    ARRAYS = ["3-3-3-8-3-3-3", "4-4-4-8-4-4-4", "8-8-8-8-8-8-8"]
    DISTS = ["1m", "2m"]
    ANGLES = ["270", "285", "300", "315", "330", "345", "000", "015", "030",
              "045", "060", "075", "090"]

    @staticmethod
    def geometry(mic_spacing_cm: np.ndarray,
                 angles_deg: Tuple[float, float]) -> np.ndarray:
        """Centered linear positions folded into two wings at the given
        angles (meters)."""
        spacing = np.asarray(mic_spacing_cm, dtype=np.float64).ravel()
        nmic = len(spacing) + 1
        along = np.concatenate([[0.0], np.cumsum(spacing)])
        along = np.abs(along - (along[0] + along[-1]) / 2) / 100.0
        ang = np.empty(nmic)
        ang[: nmic // 2] = np.deg2rad(angles_deg[0])
        ang[nmic // 2:] = np.deg2rad(angles_deg[1])
        return np.stack([along * np.cos(ang), along * np.sin(ang),
                         np.zeros(nmic)], axis=1)

    @staticmethod
    def _parse_angles(mic_position_str: str) -> Tuple[float, float]:
        vals = re.findall(r"[-+]?\d+(?:\.\d+)?", str(mic_position_str))
        if len(vals) >= 2:
            return float(vals[0]), float(vals[1])
        v = float(vals[0]) if vals else 0.0
        return v, v

    def rir_records(self):
        root = os.path.join(
            self.data_dir, "Impulse_response_Acoustic_Lab_Bar-Ilan_University")
        if not os.path.isdir(root):
            root = self.data_dir
        for room_idx, room in enumerate(self.ROOMS):
            for array in self.ARRAYS:
                for angle in self.ANGLES:
                    for dist in self.DISTS:
                        fname = ("Impulse_response_Acoustic_Lab_Bar-Ilan_"
                                 f"University_(Reverberation_"
                                 f"{self.T60_SET[room_idx]}s)_"
                                 f"{array}_{dist}_{angle}.mat")
                        path = os.path.join(root, fname)
                        if not os.path.exists(path):
                            continue
                        d = scipy.io.loadmat(path, squeeze_me=False)
                        rirs = np.asarray(d["impulse_response"], np.float64)
                        sim = d["simpar"][0, 0]
                        rir_fs = int(np.squeeze(_mat_field(sim, "fs", 0)))
                        meta = d["metapar"][0, 0]
                        t60 = float(np.squeeze(
                            _mat_field(meta, "reverberation", 0)))
                        spacing = np.squeeze(
                            _mat_field(meta, "mic_spacing", 1))
                        angles = self._parse_angles(np.squeeze(
                            _mat_field(meta, "mic_position", 2)))
                        mic_pos = self.geometry(spacing, angles)
                        nkeep = int(t60 * 2 * rir_fs)
                        yield RIRRecord(
                            room=room, array=array,
                            source_id=f"{dist}-{angle}",
                            rir=rirs[:nkeep], fs=rir_fs, mic_pos=mic_pos,
                            info={"room_sz": self.ROOM_SZ, "T60": t60})


# ---------------------------------------------------------------------------
# MeshRIR
# ---------------------------------------------------------------------------

class MeshRIRExtractor(CorpusExtractor):
    """MeshRIR S32-M441: 441-point mic grid x 32 sources; one ir_<i>.npy per
    microphone with shape (nsrc, irlen) (reference gen_real_rir.py:309-421,
    loadIR :393-421)."""

    name = "MeshRIR"
    ROOM_SZ = np.array([7.0, 6.4, 2.7])
    T60 = 0.19

    def _session(self) -> Optional[Path]:
        root = Path(self.data_dir)
        cand = root / "S32-M441_npy"
        if cand.is_dir():
            return cand
        hits = sorted(root.rglob("pos_mic.npy"))
        return hits[0].parent if hits else None

    def rir_records(self):
        sess = self._session()
        if sess is None:
            return
        mic_pos = np.load(sess / "pos_mic.npy")
        src_pos = np.load(sess / "pos_src.npy")
        with open(sess / "data.json", encoding="utf-8") as f:
            rir_fs = int(json.load(f)["samplerate"])
        per_mic = {}
        for p in sess.iterdir():
            if p.is_file() and p.stem.startswith("ir_"):
                per_mic[int(p.stem.split("_")[-1])] = np.load(p)
        nmic = mic_pos.shape[0]
        assert len(per_mic) == nmic, \
            f"expected one ir per mic: {len(per_mic)} vs {nmic}"
        full = np.stack([per_mic[i] for i in range(nmic)], axis=1)
        # full: (nsrc, nmic, irlen)
        for s in range(full.shape[0]):
            yield RIRRecord(
                room="R1", array="A1", source_id=str(s + 1),
                rir=full[s].T, fs=rir_fs, mic_pos=mic_pos,
                traj_pts=src_pos[s][None, :, None],
                info={"room_sz": self.ROOM_SZ, "T60": self.T60})


# ---------------------------------------------------------------------------
# dEchorate
# ---------------------------------------------------------------------------

class DEchorateExtractor(CorpusExtractor):
    """dEchorate: 11 wall-configuration 'rooms', 6 linear 5-mic arrays, 9
    sources (6 directional skipped, 3 omni used), HDF5 master files
    (reference gen_real_rir.py:423-669)."""

    name = "dEchorate"
    ROOM_ENVS = ["000000", "000001", "000010", "000100", "001000", "010000",
                 "011000", "011100", "011110", "011111", "020002"]
    ARRAYS = ["A1", "A2", "A3", "A4", "A5", "A6"]
    NMIC_PER_ARRAY = 5
    NOISE_SOURCES = {"noisrc": ("noise", 6), "babsrc": ("babble", 4),
                     "sil": ("silence", 1)}

    def _annotations(self):
        import h5py

        path = os.path.join(self.data_dir, "dEchorate_annotations.h5")
        with h5py.File(path, "r") as f:
            room_sz = np.asarray(f["room_size"])
            mics = np.asarray(f["microphones"])          # (3, 30)
            srcs_omn = np.asarray(f["sources_omnidirection_position"])
            n_dir = np.asarray(f["sources_directional_position"]).shape[-1]
        return room_sz, mics.T, srcs_omn, n_dir

    def rir_records(self):
        import h5py

        room_sz, mic_poss, srcs_omn, n_dir = self._annotations()
        path = os.path.join(self.data_dir, "dEchorate_rir.h5")
        with h5py.File(path, "r") as f:
            rir_fs = int(f.attrs["sampling_rate"])
            for env in self.ROOM_ENVS:
                if env not in f["rir"]:
                    continue
                srcs = sorted(f["rir"][env].keys())
                for s in range(srcs_omn.shape[-1]):
                    key = srcs[s + n_dir]  # omni sources follow directional
                    rir = np.asarray(f["rir"][env][key])[:, :-1]  # drop ctrl
                    for arr_i, array in enumerate(self.ARRAYS):
                        off = arr_i * self.NMIC_PER_ARRAY
                        sel = slice(off, off + self.NMIC_PER_ARRAY)
                        yield RIRRecord(
                            room=env, array=array, source_id=str(s + 1),
                            rir=rir[:, sel], fs=rir_fs,
                            mic_pos=mic_poss[sel],
                            traj_pts=srcs_omn[None, :, s:s + 1],
                            info={"room_sz": np.ravel(room_sz)})

    def noise_records(self):
        import h5py

        _, mic_poss, _, _ = self._annotations()
        for kind, (group, nsrc) in self.NOISE_SOURCES.items():
            path = os.path.join(self.data_dir,
                                f"dEchorate_{group}_gzip7.hdf5")
            if not os.path.exists(path):
                continue
            with h5py.File(path, "r") as f:
                fs = int(f.attrs.get("sampling_rate", 48000))
                root = f[group] if group in f else f[list(f.keys())[0]]
                for env in self.ROOM_ENVS:
                    if env not in root:
                        continue
                    srcs = sorted(root[env].keys())
                    for s in range(min(nsrc, len(srcs))):
                        sig = np.asarray(root[env][srcs[s]])[:, :-1]
                        # silence recordings keep their full length; active
                        # noise gets its lead-in/out silence stripped
                        # (except the all-reflective babble room, :564-566)
                        if kind != "sil" and not (kind == "babsrc"
                                                  and env == "011111"):
                            try:
                                sig = strip_noise_silence(sig, fs)
                            except ValueError:
                                pass
                        for arr_i, array in enumerate(self.ARRAYS):
                            off = arr_i * self.NMIC_PER_ARRAY
                            sel = slice(off, off + self.NMIC_PER_ARRAY)
                            yield NoiseRecord(
                                room=env, array=array, noise_type=kind,
                                sig=sig[:, sel], fs=fs,
                                mic_pos=mic_poss[sel],
                                index_tag=f"_{s + 1}")


# ---------------------------------------------------------------------------
# BUT ReverbDB
# ---------------------------------------------------------------------------

class BUTReverbExtractor(CorpusExtractor):
    """BUT Speech@FIT Reverb Database: 9 rooms, 8-mic spherical array; per-mic
    RIR wavs + metadata text files (reference gen_real_rir.py:671-871)."""

    name = "BUTReverb"
    ROOMS = ["Hotel_SkalskyDvur_ConferenceRoom2", "Hotel_SkalskyDvur_Room112",
             "VUT_FIT_E112", "VUT_FIT_L207", "VUT_FIT_L212", "VUT_FIT_L227",
             "VUT_FIT_Q301", "VUT_FIT_C236", "VUT_FIT_D105"]
    NMIC = 8

    @staticmethod
    def _parse_meta(path: str) -> Dict[str, str]:
        attr = {}
        with open(path, "r", encoding="UTF-8") as f:
            for line in f:
                parts = line.strip("\n").split()
                if len(parts) == 2:
                    attr[parts[0].lstrip("$")] = parts[1]
        return attr

    def _speaker_mics(self, room: str, spk: str):
        """Collect the 8-channel array mics for one speaker position."""
        spk_dir = os.path.join(self.data_dir, "RIRs", room, "MicID01", spk)
        mic_pos = np.zeros((self.NMIC, 3))
        t60 = np.full(self.NMIC, np.nan)
        sou_pos = np.zeros(3)
        room_sz = np.zeros(3)
        entries = []  # (mic_idx, mic_dir)
        for mic in sorted(os.listdir(spk_dir)):
            mdir = os.path.join(spk_dir, mic)
            if not os.path.isdir(mdir):
                continue
            meta_path = os.path.join(mdir, "mic_meta.txt")
            if not os.path.exists(meta_path):
                continue
            attr = self._parse_meta(meta_path)
            mic_id = attr.get("EnvMicID")
            if mic_id is None:
                continue
            # only the 8-channel array (TypeID '01-<id>'), :739-741
            if attr.get(f"EnvMic{mic_id}TypeID") != f"01-{mic_id}":
                continue
            i = int(mic) - 1
            if not 0 <= i < self.NMIC:
                continue
            mic_pos[i] = [max(0.0, float(attr[f"EnvMic{mic_id}Depth"])),
                          max(0.0, float(attr[f"EnvMic{mic_id}Width"])),
                          max(0.0, float(attr[f"EnvMic{mic_id}Height"]))]
            t60[i] = float(attr.get(f"EnvMic{mic_id}RelRT60", np.nan))
            sou_pos = np.array([float(attr["EnvSpk1Depth"]),
                                float(attr["EnvSpk1Width"]),
                                float(attr["EnvSpk1Height"])])
            room_sz = np.array([float(attr["EnvDepth"]),
                                float(attr["EnvWidth"]),
                                float(attr["EnvHeight"])])
            entries.append((i, mdir))
        return entries, mic_pos, t60, sou_pos, room_sz

    def _rooms(self):
        base = os.path.join(self.data_dir, "RIRs")
        return [r for r in self.ROOMS
                if os.path.isdir(os.path.join(base, r, "MicID01"))]

    def rir_records(self):
        for room in self._rooms():
            spk_dir = os.path.join(self.data_dir, "RIRs", room, "MicID01")
            for spk in sorted(os.listdir(spk_dir)):
                entries, mic_pos, t60, sou_pos, room_sz = \
                    self._speaker_mics(room, spk)
                chans, fs = {}, None
                for i, mdir in entries:
                    wdir = os.path.join(mdir, "RIR")
                    if not os.path.isdir(wdir):
                        continue
                    wavs = sorted(os.listdir(wdir))
                    if not wavs:
                        continue
                    sig, fs = read_wav(os.path.join(wdir, wavs[0]))
                    chans[i] = sig[:, 0]
                if len(chans) < 2:
                    continue
                idxs = sorted(chans)
                n = min(len(chans[i]) for i in idxs)
                rir = np.stack([chans[i][:n] for i in idxs], axis=1)
                yield RIRRecord(
                    room=room, array="spherical",
                    source_id=spk.split("_")[0],
                    rir=rir, fs=fs, mic_pos=mic_pos[idxs],
                    traj_pts=sou_pos[None, :, None],
                    info={"room_sz": room_sz, "T60": float(np.nanmean(t60))})

    def noise_records(self):
        for room in self._rooms():
            spk_dir = os.path.join(self.data_dir, "RIRs", room, "MicID01")
            for spk in sorted(os.listdir(spk_dir)):
                entries, mic_pos, _, _, _ = self._speaker_mics(room, spk)
                chans, fs = {}, None
                for i, mdir in entries:
                    ndir = os.path.join(mdir, "silence")
                    if not os.path.isdir(ndir):
                        continue
                    parts = []
                    for w in sorted(os.listdir(ndir)):
                        sig, fs = read_wav(os.path.join(ndir, w))
                        parts.append(sig[:, 0])
                    if parts:
                        chans[i] = np.concatenate(parts)
                if len(chans) < 2:
                    continue
                idxs = sorted(chans)
                n = min(len(chans[i]) for i in idxs)
                sig = np.stack([chans[i][:n] for i in idxs], axis=1)
                yield NoiseRecord(room=room, array="spherical",
                                  noise_type="silence", sig=sig, fs=fs,
                                  mic_pos=mic_pos[idxs],
                                  sp_tag=f"SP{spk.split('_')[0]}")


# ---------------------------------------------------------------------------
# ACE Challenge
# ---------------------------------------------------------------------------

class ACEExtractor(CorpusExtractor):
    """ACE Challenge: published array geometries, corpus CSV T60/DRR, dp-peak
    DRR/C50/ABS per pair (reference gen_real_rir.py:873-1160)."""

    name = "ACE"
    # published microphone coordinates of the ACE arrays (corpus constants)
    MIC_POS = {
        "Chromebook": np.array([[0, 0, 0], [0, 0.062, 0]]),
        "Mobile": np.array([[0.045, 0, 0], [0, 0, 0], [0, 0.0893029, 0]]),
        "Crucif": np.array([[0, 0, 0], [0.25, 0, 0], [0, 0.25, 0],
                            [-0.25, 0, 0], [0, -0.25, 0]]),
        "Lin8Ch": np.array([[0.06 * i, 0, 0] for i in range(8)]),
        "EM32": np.array((
            (0.000, 0.039, 0.015), (-0.022, 0.036, 0.000),
            (0.000, 0.039, -0.015), (0.022, 0.036, 0.000),
            (0.000, 0.022, 0.036), (-0.024, 0.024, 0.024),
            (-0.039, 0.015, 0.000), (-0.024, 0.024, -0.024),
            (0.000, 0.022, -0.036), (0.024, 0.024, -0.024),
            (0.039, 0.015, 0.000), (0.024, 0.024, 0.024),
            (-0.015, 0.000, 0.039), (-0.036, 0.000, 0.022),
            (-0.036, 0.000, -0.022), (-0.015, 0.000, -0.039),
            (0.000, -0.039, 0.015), (0.022, -0.036, 0.000),
            (0.000, -0.039, -0.015), (-0.022, -0.036, 0.000),
            (0.000, -0.022, 0.036), (0.024, -0.024, 0.024),
            (0.039, -0.015, 0.000), (0.024, -0.024, -0.024),
            (0.000, -0.022, -0.036), (-0.024, -0.024, -0.024),
            (-0.039, -0.015, 0.000), (-0.024, -0.024, 0.024),
            (0.015, 0.000, 0.039), (0.036, 0.000, 0.022),
            (0.036, 0.000, -0.022), (0.015, 0.000, -0.039))),
    }
    ROOM_SZS = {
        "Building_Lobby": np.array([4.47, 5.13, 3.18]),
        "Lecture_Room_1": np.array([6.93, 9.73, 3.0]),
        "Lecture_Room_2": np.array([13.6, 9.29, 2.94]),
        "Meeting_Room_1": np.array([6.61, 5.11, 2.95]),
        "Meeting_Room_2": np.array([10.3, 9.07, 2.63]),
        "Office_1": np.array([3.32, 4.83, 2.95]),
        "Office_2": np.array([3.22, 5.1, 2.94]),
    }
    ARRAYS = ["Chromebook", "Mobile", "Lin8Ch", "EM32"]
    ARRAY_POSITIONS = ["1", "2"]
    ANNO_CSV = "20150814T154139_Corpus_Mean_DRRs_and_T60s.csv"

    def _load_annos(self) -> Dict[str, np.ndarray]:
        """{room/array/pos: (2, nmic) [T60; DRR]} from the corpus CSV."""
        import pandas as pd

        path = os.path.join(self.data_dir, "Data", self.ANNO_CSV)
        annos: Dict[str, np.ndarray] = {}
        if not os.path.exists(path):
            return annos
        df = pd.read_csv(path, sep=", ", engine="python")
        for _, row in df.iterrows():
            array = row["Mic config:"]
            key = f"{row['Room decode:']}/{array}/{row['Room config:']}"
            if key not in annos:
                annos[key] = np.zeros((2, self.MIC_POS[array].shape[0]))
            ch = int(row["Chan:"]) - 1
            annos[key][:, ch] = [row["FB T60:"], row["FB DRR:"]]
        return annos

    def rir_records(self):
        self._annos = self._load_annos()
        base = os.path.join(self.data_dir, "RIRN")
        for room in self.ROOM_SZS:
            for array in self.ARRAYS:
                for pos in self.ARRAY_POSITIONS:
                    d = os.path.join(base, array, room, pos)
                    if not os.path.isdir(d):
                        continue
                    rir = None
                    for w in sorted(os.listdir(d)):
                        if "RIR" in w and w.endswith(".wav"):
                            rir, fs = read_wav(os.path.join(d, w))
                            break
                    if rir is None:
                        continue
                    geom = self.MIC_POS[array]
                    assert rir.shape[1] == geom.shape[0], \
                        f"ACE {array}: {rir.shape[1]} chans vs geometry"
                    key = f"{room}/{array}/{pos}"
                    anno = self._annos.get(key)
                    room_sz = self.ROOM_SZS[room]
                    info = {"room_sz": room_sz}
                    if anno is not None:
                        t60 = float(np.mean(anno[0]))
                        info["T60fromDataset"] = t60
                        info["DRRfromDataset"] = float(anno[1][0])
                        vol = float(np.prod(room_sz))
                        sur = 2 * float(room_sz[0] * room_sz[1]
                                        + room_sz[1] * room_sz[2]
                                        + room_sz[0] * room_sz[2])
                        info["ABS"] = 0.161 * vol / max(t60, EPS) / sur
                    yield RIRRecord(room=room, array=array, source_id="1",
                                    rir=rir, fs=fs, mic_pos=geom,
                                    info=info, mp_tag=pos)

    def pair_info(self, rec, rir_pair, mic_idxes):
        # per-pair dp-peak DRR/C50 at the output rate (gen_real_rir.py:1060-1092)
        return dp_window_metrics(rir_pair, self.fs)

    def noise_records(self):
        base = os.path.join(self.data_dir, "RIRN")
        for room in self.ROOM_SZS:
            for array in self.ARRAYS:
                for pos in self.ARRAY_POSITIONS:
                    d = os.path.join(base, array, room, pos)
                    if not os.path.isdir(d):
                        continue
                    geom = self.MIC_POS[array]
                    for w in sorted(os.listdir(d)):
                        if "Noise" not in w or not w.endswith(".wav"):
                            continue
                        noise_type = w.split("_")[-1].split(".")[0]
                        sig, fs = read_wav(os.path.join(d, w))
                        if sig.shape[1] != geom.shape[0]:
                            # channel mismatch: reference falls back to
                            # zeros (gen_real_rir.py:1146-1152)
                            sig = np.zeros((5 * fs, geom.shape[0]),
                                           np.float32)
                        yield NoiseRecord(room=room, array=array,
                                          noise_type=noise_type, sig=sig,
                                          fs=fs, mic_pos=geom, mp_tag=pos)


# ---------------------------------------------------------------------------
# room-level train/val splits for micsig generation
# (reference gen_sig_from_real_rir.py:350-387)
# ---------------------------------------------------------------------------

ROOM_SPLITS: Dict[str, Dict[str, Optional[List[str]]]] = {
    "DCASE": {
        "pretrain": ["bomb_shelter", "gym", "pb132", "pc226", "sa203",
                     "sc203", "tc352"],
        "preval": ["tb103", "se203"],
    },
    "BUTReverb": {
        "pretrain": ["Hotel_SkalskyDvur_ConferenceRoom2",
                     "Hotel_SkalskyDvur_Room112", "VUT_FIT_L207",
                     "VUT_FIT_L212", "VUT_FIT_L227", "VUT_FIT_Q301",
                     "VUT_FIT_C236", "VUT_FIT_D105"],
        "preval": ["VUT_FIT_E112"],
    },
    # pretrain-only corpora: no rooms held out, no preval stage
    "MIR": {"pretrain": None},
    "MeshRIR": {"pretrain": None},
    "dEchorate": {"pretrain": None},
    "ACE": {"pretrain": None},
}


def rooms_for_stage(corpus: str, stage: str) -> Optional[List[str]]:
    """Room subset for a generation stage; raises if the corpus has no rooms
    assigned to that stage (prevents train/val room leakage)."""
    splits = ROOM_SPLITS.get(corpus)
    if splits is None:
        return None
    if stage not in splits:
        raise ValueError(
            f"{corpus} has no rooms assigned to stage '{stage}' "
            f"(available: {sorted(splits)}); the reference holds "
            f"rooms out per corpus (gen_sig_from_real_rir.py:350-387)")
    return splits[stage]


EXTRACTORS = {
    "ACE": ACEExtractor,
    "BUTReverb": BUTReverbExtractor,
    "MeshRIR": MeshRIRExtractor,
    "dEchorate": DEchorateExtractor,
    "DCASE": DCASEExtractor,
    "MIR": MIRExtractor,
}
