"""Microphone signals from extracted real RIRs.

Equivalent of /root/reference/code/data_generation/gen_sig_from_real_rir.py:
convolve source speech (WSJ0-style speaker tree) with extracted 2-channel
real RIRs (``SP*_MP*.npy`` trees from the corpus extractors), add matched
recorded noise when present, and write reference-compatible
``{idx}.wav`` / ``{idx}_info.npz`` trees (102,400 pretrain / 2,560 preval
per corpus in the reference, :327-330).

Usage:
  python -m sarssl_tpu.cli.gen_sig_from_real_rir --rir-dir rirs/ACE \
      --src-dir wsj0/ --save-dir out --num 102400 --stage pretrain
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .gen_simu import STAGE_SEEDS


def main(argv=None):
    p = argparse.ArgumentParser("sarssl_tpu gen_sig_from_real_rir")
    p.add_argument("--rir-dir", required=True)
    p.add_argument("--src-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--num", type=int, required=True)
    p.add_argument("--stage", default="pretrain", choices=list(STAGE_SEEDS))
    p.add_argument("--T", type=float, default=4.112)
    p.add_argument("--fs", type=int, default=16000)
    p.add_argument("--rooms", type=str, nargs="*", default=None,
                   help="restrict to room subdirs (train/val splits)")
    p.add_argument("--snr-range", type=float, nargs=2, default=[15.0, 30.0])
    args = p.parse_args(argv)

    from ..data.real_rir import NpyRIRDataset, MicSigFromRIRDataset
    from ..data.sources import SpeakerTreeDataset
    from ..data.wavio import write_wav

    rirs = NpyRIRDataset(args.rir_dir, fs=args.fs, rooms=args.rooms)
    srcs = SpeakerTreeDataset(args.src_dir, T=args.T, fs=args.fs)
    ds = MicSigFromRIRDataset(rirs, srcs, T=args.T, fs=args.fs,
                              snr_range=tuple(args.snr_range),
                              seed=STAGE_SEEDS[args.stage], length=args.num)
    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(args.num):
        sig, annos = ds[i]
        write_wav(os.path.join(args.save_dir, f"{i}.wav"), sig, args.fs)
        np.savez(os.path.join(args.save_dir, f"{i}_info.npz"), **annos)
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{args.num}")
    print(f"wrote {args.num} items to {args.save_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
