"""Packed-shard host pipeline (data/shards.py) and the process-pool loader:
round-trip vs the source dataset, batch streaming, pod sharding, CLI."""
import os

import numpy as np
import pytest

from sarssl_tpu.data import (PackedDataset, is_packed, pack_dataset,
                             mp_batch_iterator)


class _Toy:
    """Deterministic labeled dataset: item i = (wave_i, {'T60': i/10})."""

    def __init__(self, n=37, nsample=640, nch=2, labeled=True):
        self.n, self.nsample, self.nch, self.labeled = n, nsample, nch, labeled

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        w = rng.standard_normal((self.nsample, self.nch)).astype(np.float32)
        if not self.labeled:
            return w
        return w, {"T60": np.float32(i / 10), "TDOA": np.float32(-i)}


def test_pack_roundtrip_and_batches(tmp_path):
    src = _Toy()
    d = str(tmp_path / "packed")
    meta = pack_dataset(src, d, items_per_shard=8)
    assert is_packed(d)
    assert meta["n"] == 37 and meta["nshards"] == 5
    assert meta["anno_keys"] == ["T60", "TDOA"]

    pds = PackedDataset(d)
    assert len(pds) == 37
    # item-level round trip across shard boundaries
    for i in (0, 7, 8, 36):
        w, a = pds[i]
        w0, a0 = src[i]
        np.testing.assert_array_equal(w, w0)
        assert a["T60"] == a0["T60"] and a["TDOA"] == a0["TDOA"]

    # batch streaming covers every index exactly once (shuffled, drop_last)
    seen = []
    for w, lab in pds.iter_batches(4, shuffle=True, seed=3):
        assert w.shape == (4, 640, 2) and lab["T60"].shape == (4,)
        # labels line up with waves (T60 encodes the index)
        for j in range(4):
            idx = int(round(float(lab["T60"][j]) * 10))
            np.testing.assert_array_equal(w[j], src[idx][0])
        seen += [int(round(float(x) * 10)) for x in lab["T60"]]
    assert len(seen) == 36 and len(set(seen)) == 36

    # deterministic order per seed
    a1 = [lab["TDOA"].tolist()
          for _, lab in pds.iter_batches(4, shuffle=True, seed=3)]
    a2 = [lab["TDOA"].tolist()
          for _, lab in pds.iter_batches(4, shuffle=True, seed=3)]
    assert a1 == a2


def test_pack_unlabeled_and_pod_sharding(tmp_path):
    src = _Toy(n=32, labeled=False)
    d = str(tmp_path / "p")
    pack_dataset(src, d, items_per_shard=10)
    pds = PackedDataset(d)
    assert pds.load_anno is False

    # pod contract: 4 hosts x bs 4 -> disjoint equal shards covering 32 rows
    all_rows = []
    counts = []
    for pi in range(4):
        rows = list(pds.iter_batches(4, shuffle=True, seed=9,
                                     shard_i=pi, shard_n=4))
        counts.append(len(rows))
        for b in rows:
            assert b.shape == (4, 640, 2)
            all_rows.append(b)
    assert len(set(counts)) == 1  # equal batch counts -> no pod deadlock
    stacked = np.concatenate(all_rows)
    assert stacked.shape[0] == 32
    # all rows distinct (first-sample fingerprint)
    fps = {float(stacked[i, 0, 0]) for i in range(32)}
    assert len(fps) == 32


def test_pack_wav_tree_cli(tmp_path):
    from sarssl_tpu.cli.pack_data import main as pack_main
    from sarssl_tpu.data.wavio import write_wav

    d = tmp_path / "tree"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        write_wav(str(d / f"{i}.wav"),
                  (rng.standard_normal((800, 2)) * 0.1).astype(np.float32),
                  16000)
        np.savez(str(d / f"{i}_info.npz"), T60=np.float32(0.3 + i / 100),
                 TDOA=np.float32(1e-4 * i))
    out = str(tmp_path / "packed")
    rc = pack_main(["--data-dir", str(d), "--out", out, "--nsample", "640"])
    assert rc == 0
    pds = PackedDataset(out)
    w, a = pds[2]
    assert w.shape == (640, 2)
    assert a["T60"] == pytest.approx(0.32)


def test_mp_batch_iterator_matches_thread_loader():
    """Process-pool loader yields the same multiset of items as the
    in-process iterator for a pure per-index dataset."""
    src = _Toy(n=12, nsample=64)
    got = list(mp_batch_iterator(src, 4, shuffle=True, seed=5,
                                 num_workers=2))
    assert len(got) == 3
    tags = sorted(int(-t) for _, lab in got for t in lab["TDOA"])
    assert tags == list(range(12))
    for w, lab in got:
        for j in range(4):
            idx = int(-float(lab["TDOA"][j]))
            np.testing.assert_array_equal(w[j], src[idx][0])


def test_batch_indices_subset_restricts_universe(tmp_path):
    """--fixed-train-subset semantics: with subset=rows, every epoch's
    batches permute WITHIN those rows (low-label experiments train on a
    fixed set, not a fresh draw from the whole split each epoch)."""
    from sarssl_tpu.cli.run_downstream import fixed_train_subset

    d = str(tmp_path / "pk")
    pack_dataset(_Toy(n=32), d, items_per_shard=10)
    ds = PackedDataset(d, load_anno=True)
    rows = np.array([1, 3, 4, 7, 10, 13, 20, 31])
    seen = set()
    for epoch in range(5):
        for b in ds.batch_indices(4, shuffle=True, seed=epoch,
                                  subset=rows):
            assert len(b) == 4
            seen.update(int(i) for i in b)
    assert seen == set(rows.tolist())

    class A:
        fixed_train_subset = True
        seed = 100
    s0 = fixed_train_subset(A(), 32, 8, trial=0)
    s0b = fixed_train_subset(A(), 32, 8, trial=0)
    s1 = fixed_train_subset(A(), 32, 8, trial=1)
    np.testing.assert_array_equal(s0, s0b)     # epoch/process stable
    assert len(s0) == 8 and not np.array_equal(s0, s1)  # per-trial draw
    A.fixed_train_subset = False
    assert fixed_train_subset(A(), 32, 8, trial=0) is None
    A.fixed_train_subset = True
    assert fixed_train_subset(A(), 32, 64, trial=0) is None  # num >= n


def test_batch_indices_subset_smaller_than_batch_raises(tmp_path):
    d = str(tmp_path / "pk")
    pack_dataset(_Toy(n=16), d, items_per_shard=10)
    ds = PackedDataset(d, load_anno=True)
    import pytest
    with pytest.raises(ValueError, match="no full batch"):
        next(ds.batch_indices(8, shuffle=True, seed=0,
                              subset=np.arange(4)))


def test_all_waves_i16_roundtrip_bound(tmp_path):
    d = str(tmp_path / "pk")
    pack_dataset(_Toy(n=6), d, items_per_shard=4)
    ds = PackedDataset(d, load_anno=False)
    w = ds.all_waves()
    q, scale = ds.all_waves_i16()
    assert q.dtype == np.int16
    deq = q.astype(np.float32) * scale
    # round-to-nearest with a global scale: error <= scale/2 (plus f32
    # rounding of the dequant multiply), and the corpus peak maps to
    # exactly +/-32767
    gmax = scale * 32767
    assert np.max(np.abs(deq - w)) <= scale / 2 + 4 * np.finfo(np.float32).eps * gmax
    assert np.max(np.abs(q)) == 32767


def test_all_waves_limit(tmp_path):
    d = str(tmp_path / "pk")
    pack_dataset(_Toy(n=11), d, items_per_shard=4)
    ds = PackedDataset(d, load_anno=False)
    np.testing.assert_array_equal(ds.all_waves(limit=6), ds.all_waves()[:6])
    q_all, s_all = ds.all_waves_i16()
    q_lim, s_lim = ds.all_waves_i16(limit=11)
    np.testing.assert_array_equal(q_all, q_lim)
    assert s_all == s_lim
