"""Materialize GB-scale synthetic real-corpus trees for the --real-corpora
pretraining dry-run (VERDICT r2 #8).

Builds four corpora in their published layouts — RealMAN (per-channel CH*
files across scenes/speakers), AMI (8-mic array sessions), LibriCSS (7-ch
session segments), MC-WSJ-AV (per-channel array files) — with AR-colored
noise content. The point is not acoustics: it is exercising the bespoke
readers' item-table builds, probability mixing and sampling throughput at
realistic file counts and sizes (reference run_pretrain.py:118-142).

Run: python scripts/gen_synthetic_corpora.py --root data/real_corpora_synth
     [--scale 1.0]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sarssl_tpu.data.wavio import write_wav

FS = 16000


def _noise(rng, nsample, nch):
    x = (rng.standard_normal((nsample, nch)) * 0.08).astype(np.float32)
    x[1:] += 0.6 * x[:-1]
    return np.clip(x, -0.99, 0.99)


def gen_realman(root, rng, scale):
    scenes = ["LivingRoom1", "OfficeRoom1", "LivingRoom2", "OfficeRoom2"]
    nspk, nutt = int(6 * scale), int(4 * scale)
    n = 0
    for scene in scenes:
        for s in range(nspk):
            for u in range(nutt):
                sig = _noise(rng, 5 * FS, 1)  # > 4.112 s so T-probe keeps it
                for k in range(32):
                    p = os.path.join(root, "ma_speech", scene, "static",
                                     f"spk{s}", f"utt{u}.CH{k}.wav")
                    os.makedirs(os.path.dirname(p), exist_ok=True)
                    write_wav(p, np.roll(sig, k * 7, axis=0), FS)
                    n += 1
    return n


def gen_ami(root, rng, scale):
    n = 0
    for sess in [f"ES200{i}" for i in range(2, 2 + max(2, int(4 * scale)))]:
        d = os.path.join(root, "ScenarioMeetings", sess, "audio")
        os.makedirs(d, exist_ok=True)
        dur = int(240 * scale) * FS
        base = _noise(rng, dur, 1)
        for k in range(1, 9):
            write_wav(os.path.join(d, f"{sess}a.Array1-0{k}.wav"),
                      np.roll(base, k * 11, axis=0), FS)
            n += 1
    return n


def gen_libricss(root, rng, scale):
    n = 0
    for s in range(max(4, int(12 * scale))):
        d = os.path.join(
            root, "exp", "data", "7ch", "utterances",
            f"overlap_ratio_0.0_sil0.1_1.0_session{s}_actual0.0")
        os.makedirs(d, exist_ok=True)
        for seg in range(max(2, int(4 * scale))):
            write_wav(os.path.join(d, f"segment_{seg}.wav"),
                      _noise(rng, int(30 * FS), 7), FS)
            n += 1
    return n


def gen_mcwsj(root, rng, scale):
    n = 0
    for spk in range(max(4, int(10 * scale))):
        d = os.path.join(root, "MC_WSJ_AV_Dev", "audio", "stat",
                         f"T{spk}", "array1", "adap")
        os.makedirs(d, exist_ok=True)
        base = _noise(rng, int(25 * FS), 1)
        for k in range(1, 9):
            write_wav(os.path.join(d, f"spk_u{spk}-{k}_T.wav"),
                      np.roll(base, k * 13, axis=0), FS)
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="data/real_corpora_synth")
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    total = 0
    for name, fn in (("RealMAN", gen_realman), ("AMI", gen_ami),
                     ("LibriCSS", gen_libricss), ("MCWSJ", gen_mcwsj)):
        t0 = time.time()
        n = fn(os.path.join(args.root, name), rng, args.scale)
        total += n
        print(f"{name}: {n} files in {time.time() - t0:.1f} s", flush=True)
    sz = sum(os.path.getsize(os.path.join(dp, f))
             for dp, _, fs in os.walk(args.root) for f in fs)
    print(f"total {total} files, {sz / 1e9:.2f} GB under {args.root}")


if __name__ == "__main__":
    main()
