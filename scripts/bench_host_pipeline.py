"""Measure the file-backed host input pipeline: wav decode -> collate ->
(optionally) device transfer, in utterances/sec.

The device bench (bench.py) times the compute step on device-resident
waveforms; this script answers "can the host actually feed that rate?"
(VERDICT r1 weak #3). It materializes a wav tree once, then times
batch_iterator with N workers.

Run: python scripts/bench_host_pipeline.py [--num 2048] [--bs 128]
     [--workers 8] [--T 4.112] [--device]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=2048)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--T", type=float, default=4.112)
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--device", action="store_true",
                    help="also device_put each batch and sync")
    ap.add_argument("--keep-dir", type=str, default=None,
                    help="reuse/keep the wav tree at this path")
    ap.add_argument("--packed", action="store_true",
                    help="also pack the tree once and measure "
                         "PackedDataset.iter_batches (data/shards.py)")
    args = ap.parse_args()

    from sarssl_tpu.data import FixMicSigDataset, Selecting, batch_iterator
    from sarssl_tpu.data.wavio import write_wav

    nsample = int(args.T * args.fs)
    d = args.keep_dir or tempfile.mkdtemp(prefix="hostbench_")
    os.makedirs(d, exist_ok=True)
    existing = len([f for f in os.listdir(d) if f.endswith(".wav")])
    if existing < args.num:
        rng = np.random.default_rng(0)
        base = (rng.standard_normal((nsample, 2)) * 0.05).astype(np.float32)
        for i in range(existing, args.num):
            # vary content cheaply; files are full-size and unique on disk
            sig = np.roll(base, i % 997, axis=0)
            write_wav(os.path.join(d, f"{i}.wav"), sig, args.fs)
        print(f"materialized {args.num} wavs "
              f"({args.num * nsample * 8 / 1e9:.1f} GB) under {d}")

    ds = FixMicSigDataset(d, data_num=args.num,
                          transforms=[Selecting((0, nsample))])

    put = None
    if args.device:
        import jax
        import jax.numpy as jnp
        dev = jax.devices()[0]
        put = lambda b: jax.device_put(jnp.asarray(b), dev)

    for workers in sorted({0, args.workers}):
        t0 = time.perf_counter()
        n = 0
        last = None
        for batch in batch_iterator(ds, args.bs, shuffle=True, seed=1,
                                    num_workers=workers):
            if put is not None:
                last = put(batch)
            n += batch.shape[0]
        if last is not None:
            np.asarray(last)[0, 0, 0]  # sync
        dt = time.perf_counter() - t0
        rate = n / dt
        mbps = rate * nsample * 2 * 4 / 1e6
        print(f"workers={workers:2d} device={bool(put)}: "
              f"{rate:8.1f} utt/s  ({mbps:7.1f} MB/s decoded)")

    if args.packed:
        from sarssl_tpu.data import PackedDataset, pack_dataset

        pd = d + "_packed"
        if not os.path.exists(os.path.join(pd, "packed_meta.json")):
            t0 = time.perf_counter()
            pack_dataset(ds, pd)
            print(f"packed once in {time.perf_counter() - t0:.1f} s")
        pds = PackedDataset(pd, load_anno=False)
        for label, shuffle in (("sequential", False), ("shuffled", True)):
            for rep in range(2):  # rep 2 runs warm from the page cache
                t0 = time.perf_counter()
                n = 0
                last = None
                for batch in pds.iter_batches(args.bs, shuffle=shuffle, seed=1):
                    if put is not None:
                        last = put(batch)
                    n += batch.shape[0]
                if last is not None:
                    np.asarray(last)[0, 0, 0]
                dt = time.perf_counter() - t0
                rate = n / dt
                mbps = rate * nsample * 2 * 4 / 1e6
                print(f"packed {label} rep{rep} device={bool(put)}: "
                      f"{rate:8.1f} utt/s  ({mbps:7.1f} MB/s)")
        if args.keep_dir is None:
            shutil.rmtree(pd, ignore_errors=True)

    if args.keep_dir is None:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
