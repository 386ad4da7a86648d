"""Room-subset sim downstream trials (--room-trials).

Pins the reference protocol where each sim trial trains on its own disjoint
block of nsimroom rooms from a certain-room corpus
(/root/reference/code/run_downstream.py:173-181, opt.py:205-214 + 283-290):

  1. room_block_rows: consecutive disjoint blocks in sorted-room-id order,
     full coverage, clean error when rooms run out;
  2. pack_wav_tree adds a 'room' column for R{idx}/ trees and
     packed_train_subset reproduces the file-tree blocks on packed data;
  3. e2e: a tiny certain-room corpus through the sequential grid and
     --grid-vmap produces per-trial results whose training rows come from
     disjoint room sets.
"""
import json
import os

import numpy as np
import pytest

from sarssl_tpu.cli.run_downstream import (room_block_rows,
                                           packed_train_subset)
from sarssl_tpu.data.shards import (pack_wav_tree, room_id_of_path,
                                    PackedDataset)
from sarssl_tpu.data.wavio import write_wav

FS = 16000
NSAMPLE = 2304  # matches the smoke clip length


def _make_room_tree(root, nrooms=4, per_room=4, nsample=NSAMPLE):
    rng = np.random.default_rng(0)
    for r in range(nrooms):
        d = os.path.join(root, f"R{r}")
        os.makedirs(d)
        for i in range(per_room):
            sig = rng.standard_normal((nsample, 2)).astype(np.float32) * 0.1
            write_wav(os.path.join(d, f"{i}_0.wav"), sig, FS)
            np.savez(os.path.join(d, f"{i}_0_info.npz"),
                     TDOA=np.float32(1e-4 * (r + 1)),
                     T60=np.float32(0.3 + 0.1 * r))
    return root


def test_room_block_rows_disjoint_and_covering():
    rooms_col = np.repeat([3, 7, 11, 20], 5)  # non-contiguous ids
    blocks = [room_block_rows(rooms_col, 2, t) for t in range(2)]
    assert set(blocks[0]) == set(range(10))       # rooms 3, 7
    assert set(blocks[1]) == set(range(10, 20))   # rooms 11, 20
    assert not (set(blocks[0]) & set(blocks[1]))
    with pytest.raises(AssertionError, match="trial 2 needs rooms"):
        room_block_rows(rooms_col, 2, 2)


def test_room_id_of_path():
    assert room_id_of_path("/a/b/R12/3_0.wav") == 12
    assert room_id_of_path("/a/b/train/3_0.wav") is None
    assert room_id_of_path("/a/b/ROOM2/3_0.wav") is None


def test_pack_adds_room_column_and_subsets_match(tmp_path):
    tree = _make_room_tree(str(tmp_path / "tree"))
    out = str(tmp_path / "packed")
    meta = pack_wav_tree(tree, out, items_per_shard=5)
    assert "room" in meta["anno_keys"]
    pds = PackedDataset(out)
    rc = np.asarray(pds.annos()["room"], np.int64)
    assert sorted(np.unique(rc)) == [0, 1, 2, 3]

    class A:  # minimal args
        room_trials = True
        ds_nsimroom = 2
        seed = 0

    sub0 = packed_train_subset(A(), pds, 999, 0)
    sub1 = packed_train_subset(A(), pds, 999, 1)
    assert not (set(sub0) & set(sub1))
    assert set(rc[sub0]) == {0, 1} and set(rc[sub1]) == {2, 3}
    # packed rows follow the sorted file order, so blocks match the tree's
    assert len(sub0) == len(sub1) == 8

    # --train-num below the block size is a LABEL BUDGET: a fixed,
    # per-trial draw across the WHOLE block (both rooms represented on
    # average, never a [:num] prefix of the lowest room id), stable across
    # calls so epochs reuse the exact same rows
    lo0 = packed_train_subset(A(), pds, 4, 0)
    assert len(lo0) == 4 and set(lo0) <= set(sub0)
    assert np.array_equal(lo0, packed_train_subset(A(), pds, 4, 0))
    lo1 = packed_train_subset(A(), pds, 4, 1)
    assert set(lo1) <= set(sub1) and not (set(lo0) & set(lo1))
    # not simply the first 4 rows of the block (room-0-only prefix)
    assert not np.array_equal(lo0, np.asarray(sub0)[:4])


def test_pack_plain_tree_has_no_room_column(tmp_path):
    d = str(tmp_path / "flat")
    os.makedirs(d)
    rng = np.random.default_rng(1)
    for i in range(3):
        write_wav(os.path.join(d, f"{i}.wav"),
                  rng.standard_normal((NSAMPLE, 2)).astype(np.float32), FS)
        np.savez(os.path.join(d, f"{i}_info.npz"), T60=np.float32(0.4))
    meta = pack_wav_tree(d, str(tmp_path / "p"), items_per_shard=4)
    assert "room" not in meta["anno_keys"]


def _eval_tree(root, n=6, nsample=NSAMPLE):
    rng = np.random.default_rng(7)
    os.makedirs(root)
    for i in range(n):
        write_wav(os.path.join(root, f"{i}.wav"),
                  rng.standard_normal((nsample, 2)).astype(np.float32) * 0.1,
                  FS)
        np.savez(os.path.join(root, f"{i}_info.npz"),
                 TDOA=np.float32(5e-5), T60=np.float32(0.5))
    return root


@pytest.mark.slow
@pytest.mark.parametrize("grid_vmap,packed", [(False, False), (True, False),
                                              (True, True)])
def test_room_trials_e2e(tmp_path, grid_vmap, packed):
    """Two 2-room trials over a 4-room tree — sequential grid, vmapped grid
    (streaming), and vmapped grid over a packed corpus (device-resident
    index-gather path): each runs end to end and writes per-trial cells."""
    from sarssl_tpu.cli.run_downstream import main

    tree = _make_room_tree(str(tmp_path / "tree"))
    if packed:
        pack_wav_tree(tree, str(tmp_path / "tree_packed"),
                      items_per_shard=6)
        tree = str(tmp_path / "tree_packed")
    val = _eval_tree(str(tmp_path / "val"))
    test = _eval_tree(str(tmp_path / "test"))
    exp = str(tmp_path / f"exp_{grid_vmap}_{packed}")
    argv = ["--ds-train", "--cpu", "--ds-task", "T60",
            "--ds-trainmode", "scratchlow", "--room-trials",
            "--ds-nsimroom", "2",
            "--data-dir", tree, "--val-data-dir", val,
            "--test-data-dir", test,
            "--T", str(NSAMPLE / FS),
            "--epochs", "2", "--lr-set", "0.001", "--bs-set", "2",
            "--val-num", "4", "--test-num", "4", "--workers", "0",
            "--exp-dir", exp]
    if grid_vmap:
        argv += ["--grid-vmap", "--scan-block", "1"]
    assert main(argv) in (0, None)
    res = json.load(open(os.path.join(exp, "results.json")))
    cells = res["cells"]
    assert {c["trial"] for c in cells.values()} == {0, 1}
    for c in cells.values():
        assert np.isfinite(c["val_mae"]) and np.isfinite(c["test_mae"])


def test_room_trials_requires_eval_dirs(tmp_path):
    from sarssl_tpu.cli.run_downstream import main
    tree = _make_room_tree(str(tmp_path / "tree"))
    with pytest.raises(AssertionError, match="val-data-dir"):
        main(["--ds-train", "--cpu", "--ds-task", "T60",
              "--ds-trainmode", "scratchlow", "--room-trials",
              "--data-dir", tree, "--T", str(NSAMPLE / FS),
              "--exp-dir", str(tmp_path / "e")])
