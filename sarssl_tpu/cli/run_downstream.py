"""Downstream fine-tuning / linear-eval CLI.

Equivalent of /root/reference/code/run_downstream.py: per-task regression
(TDOA/DRR/T60/C50/ABS) over an lr x bs x trial grid, loading pretrained
encoder weights (finetune/lineareval) or training from scratch (scratchlow),
with smoothed-val early stopping, the two-stage lr/10 drop, last-5-best
ensembling, and a final grid summary saved as .mat + JSON.

Usage:
  python -m sarssl_tpu.cli.run_downstream --ds-train --ds-task TDOA \
      --pretrain-ckpt DIR [--data-dir DATA | --synthetic] [...]
  python -m sarssl_tpu.cli.run_downstream --smoke
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np


def fixed_train_subset(args, n, num, trial):
    """Per-trial fixed training rows for --fixed-train-subset: a
    deterministic, epoch-independent draw of num rows from the packed
    split, disjoint-seeded per trial (so trials differ by data subset,
    the reference's rooms-per-trial semantics). None = whole split."""
    if not getattr(args, "fixed_train_subset", False) or num >= n:
        return None
    rng = np.random.default_rng(args.seed + 555_000 + trial)
    return np.sort(rng.permutation(n)[:num])


def room_block_rows(rooms_col, nsimroom, trial):
    """Row indices of trial's room block for --room-trials: the trial-th
    consecutive block of nsimroom rooms in sorted-room-id order, so trial
    room sets are disjoint — the reference's per-trial data dirs
    R{trial*nsimroom+1 .. (trial+1)*nsimroom}
    (/root/reference/code/opt.py:283-290, run_downstream.py:173-181;
    we block by the ids actually present rather than assuming 1-based
    numbering)."""
    rooms_col = np.asarray(rooms_col, np.int64)
    ids = np.unique(rooms_col)
    blk = ids[trial * nsimroom:(trial + 1) * nsimroom]
    assert len(blk) == nsimroom, (
        f"trial {trial} needs rooms [{trial * nsimroom}:"
        f"{(trial + 1) * nsimroom}) of {len(ids)} present — generate more "
        f"rooms (gen_simu_certain_room --room-num >= ntrial*nsimroom) or "
        f"lower --ntrial/--ds-nsimroom")
    return np.flatnonzero(np.isin(rooms_col, blk))


def trial_subset_draw(rows, num, seed, trial):
    """Fixed, epoch-independent draw of num of the given rows (sorted),
    disjoint-seeded per trial. Identity when num covers all rows."""
    rows = np.asarray(rows)
    if num >= len(rows):
        return rows
    rng = np.random.default_rng(seed + 555_000 + trial)
    return np.sort(rows[rng.permutation(len(rows))[:num]])


def packed_train_subset(args, pds, num, trial):
    """The train-row universe for one trial of a packed split: room-block
    rows under --room-trials, the fixed low-label draw under
    --fixed-train-subset, else the whole split.

    Under --room-trials, --train-num is a LABEL BUDGET: when it is below
    the block size the subset is a fixed per-trial draw from the block,
    never a per-epoch batch cap (a cap with per-epoch reshuffling would
    touch every block row across epochs and silently overstate low-label
    results). --fixed-train-subset is therefore subsumed in room mode."""
    if getattr(args, "room_trials", False):
        rc = pds.annos().get("room")
        assert rc is not None, (
            f"--room-trials: packed dir {pds.dir} has no 'room' column — "
            "re-pack the R{idx}/ tree with cli.pack_data (the packer "
            "records room ids automatically for certain-room trees)")
        rows = room_block_rows(rc, args.ds_nsimroom, trial)
        return trial_subset_draw(rows, num, args.seed, trial)
    return fixed_train_subset(args, pds.n, num, trial)


def build_parser():
    p = argparse.ArgumentParser("sarssl_tpu downstream")
    p.add_argument("--ds-train", action="store_true")
    p.add_argument("--ds-test", action="store_true")
    p.add_argument("--ds-test-mode", type=str, default="cal_metric",
                   choices=["cal_metric", "cal_metric_wo_info", "vis_embed"])
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint dir for --ds-test (ensemble/best model)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ds-task", type=str, default="TDOA",
                   choices=["TDOA", "DRR", "T60", "C50", "C80", "ABS", "SNR",
                            "DOA", "SUR", "VOL"])
    p.add_argument("--ds-trainmode", type=str, default="finetune",
                   choices=["finetune", "lineareval", "scratchlow"])
    p.add_argument("--ds-embed", type=str, default="spec_spat",
                   choices=["spec_spat", "spec", "spat", "noinfo"])
    p.add_argument("--pretrain-ckpt", type=str, default=None,
                   help="pretrain checkpoint dir (best_model used)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--val-data-dir", type=str, default=None)
    p.add_argument("--test-data-dir", type=str, default=None)
    p.add_argument("--rir-dir", type=str, default=None,
                   help="extracted real-RIR tree: train on-the-fly speech x "
                        "RIR (reference RandomMicSigFromRIRDataset)")
    p.add_argument("--sim-rir-dir", type=str, default=None,
                   help="simulated-RIR tree (gen_simu --mode rir): the sim "
                        "arm of the on-the-fly real/sim mixture "
                        "(reference dataset.py:287-382)")
    p.add_argument("--src-dir", type=str, default=None,
                   help="speaker-tree source corpus for --rir-dir")
    p.add_argument("--rir-cv", action="store_true",
                   help="leave-one-room-out cross-validation over the "
                        "immediate subdirectories of --rir-dir: ntrial "
                        "becomes the room count and each trial holds out "
                        "one room for test and one for val (reference "
                        "run_downstream.py:133-134,194)")
    p.add_argument("--real-sig-dir", type=str, default=None,
                   help="presaved real wav tree with train/val/test subdirs "
                        "(LOCATA-materialized); mixes with --sim-sig-dir "
                        "per --real-sim-ratio (reference "
                        "RandomMicSigDataset, dataset.py:232-285)")
    p.add_argument("--sim-sig-dir", type=str, default=None,
                   help="presaved simulated wav tree, the sim arm for "
                        "--real-sig-dir training mixes")
    p.add_argument("--real-sim-ratio", type=int, nargs=2, default=(1, 1),
                   metavar=("REAL", "SIM"),
                   help="training-arm mix: 1 0 real only, 0 1 sim only, "
                        "1 1 50/50 (reference opt.py:195-233); val/test "
                        "always use the real arm when one exists")
    p.add_argument("--real-exp", action="store_true",
                   help="use the reference real-world grids: bs 16, "
                        "lr {1e-3,1e-4}, per-task training counts "
                        "(TDOA 80,000; opt.py:216-256)")
    p.add_argument("--exp-dir", type=str, default="exp/downstream")
    p.add_argument("--ds-nsimroom", type=int, default=8)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr-set", type=float, nargs="+", default=None)
    p.add_argument("--bs-set", type=int, nargs="+", default=None)
    p.add_argument("--ntrial", type=int, default=None)
    p.add_argument("--train-num", type=int, default=None)
    p.add_argument("--T", type=float, default=None,
                   help="clip seconds (default: task standard — 1.04 for "
                        "TDOA, 4.112 otherwise)")
    p.add_argument("--val-num", type=int, default=1000)
    p.add_argument("--test-num", type=int, default=4000)
    p.add_argument("--room-trials", action="store_true",
                   help="the train data is a certain-room corpus "
                        "(gen_simu_certain_room R{idx}/ tree, raw or "
                        "packed): trial t trains on the t-th disjoint "
                        "block of ds-nsimroom rooms, so trial variance is "
                        "room-subset variance (reference "
                        "run_downstream.py:173-181 + opt.py:283-290); "
                        "val/test stay the generic held-out dirs. "
                        "--train-num below the block size is a label "
                        "budget: a fixed per-trial draw from the block "
                        "(subsumes --fixed-train-subset)")
    p.add_argument("--fixed-train-subset", action="store_true",
                   help="packed dirs: train each trial on a FIXED "
                        "train-num-row subset of the split (per-trial "
                        "deterministic draw) instead of resampling "
                        "train-num rows from the whole split every epoch. "
                        "Use for low-label experiments where the number "
                        "of distinct supervised examples is the variable "
                        "under study (reference opt.py:205-214 fixes "
                        "nsimroom*100 signals per trial)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--grid-vmap", action="store_true",
                   help="run every (trial, lr) grid cell as one lane of a "
                        "single vmapped program (train/grid.py) instead of "
                        "sequentially — same per-cell results, one compile, "
                        "MXU-sized batches (single-bs grids, nmic=2)")
    p.add_argument("--grid-chunk", type=int, default=8,
                   help="max lanes per vmapped grid program (stacked f32 "
                        "states + the device ensemble ring must fit HBM)")
    p.add_argument("--trial-set", type=int, nargs="+", default=None,
                   help="run only these trial indices of the grid (data "
                        "streams and rng chains stay keyed by the true "
                        "trial index, so results merge with a full grid's)")
    p.add_argument("--scan-block", type=int, default=25,
                   help="steps per scanned grid dispatch (train/grid.py): "
                        "amortizes the ~0.1 s/step tunnel latency+transfer "
                        "cost; pick a divisor of the train/val/test step "
                        "counts so only one scan program compiles")
    p.add_argument("--time-budget", type=float, default=0,
                   help="grid-vmap wall-clock budget in seconds (0 = off): "
                        "each chunk gets its prorated share; when exceeded "
                        "the epoch loop ends gracefully and ensembling + "
                        "test eval still run, so results.json is always "
                        "written")
    p.add_argument("--mp-loader", action="store_true",
                   help="process-pool loader for the on-the-fly RIR paths "
                        "(CPU-bound synthesis scales past the GIL; "
                        "replaces torch DataLoader workers)")
    p.add_argument("--nmic", type=int, default=2,
                   help="microphone count; > 2 builds the multi-pair "
                        "SARSSLMultiCH head (reference model.py:793-821)")
    p.add_argument("--ch-mode", type=str, default="M", choices=["M", "MM"],
                   help="mic pairing: ref-mic pairs or all pairs")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mesh", type=str, default=None,
                   help="'DxM' data x model mesh, e.g. 8x1")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu or args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    from ..config import DownstreamConfig
    from ..models import SARSSL, SARSSLConfig
    from ..ops import FeatureConfig
    from ..train import (create_train_state, make_downstream_step,
                         make_downstream_eval_step, DownstreamLearner)
    from ..train import checkpoint as ckpt
    from ..train.checkpoint import (partial_load, trainable_mask_from_loaded,
                                    load_checkpoint, best_path)
    from ..utils import MetricLogger, save_config, set_seed
    from ..data import (FixMicSigDataset, SyntheticPairs, Selecting,
                        batch_iterator)

    if args.smoke:
        args.ds_train = True
        args.synthetic = True
        args.epochs = 3
        args.lr_set = [1e-3]
        args.bs_set = [4]
        args.ntrial = 1
        args.train_num = 16
        args.val_num = 8
        args.test_num = 8

    cfg = DownstreamConfig(task=args.ds_task, train_mode=args.ds_trainmode,
                           nsimroom=args.ds_nsimroom, nepoch=args.epochs)
    if args.real_exp:
        from ..config import real_ds_setting
        rs = real_ds_setting(args.ds_task, args.ds_trainmode,
                             args.real_sim_ratio)
        lr_set = args.lr_set or rs["lr_set"]
        bs_set = args.bs_set or rs["bs_set"]
        ntrial = args.ntrial or rs["ntrial"]
        train_num = args.train_num or rs["num"]
    else:
        lr_set = args.lr_set or list(cfg.lr_set)
        bs_set = args.bs_set or list(cfg.bs_set)
        ntrial = args.ntrial or cfg.ntrial
        train_num = args.train_num or cfg.train_num

    room_ids = None
    if args.room_trials:
        assert args.data_dir and not (args.synthetic or args.rir_dir
                                      or args.sim_rir_dir or args.real_sig_dir
                                      or args.rir_cv), (
            "--room-trials reads a certain-room corpus from --data-dir and "
            "composes with no other data source")
        assert args.val_data_dir and args.test_data_dir, (
            "--room-trials: pass --val-data-dir/--test-data-dir (generic "
            "held-out corpora, reference opt.py:292-293) — evaluating on "
            "the training rooms would leak")
        from ..data import PackedDataset, is_packed
        from ..data.shards import room_id_of_path
        if is_packed(args.data_dir):
            rc = PackedDataset(args.data_dir).annos().get("room")
            assert rc is not None, (
                f"--room-trials: {args.data_dir} was packed without a "
                "'room' column — re-pack the R{idx}/ tree with cli.pack_data")
            room_ids = np.unique(np.asarray(rc, np.int64))
        else:
            import re
            room_ids = np.array(sorted(
                int(m.group(1)) for d in os.listdir(args.data_dir)
                if (m := re.fullmatch(r"R(\d+)", d))
                and os.path.isdir(os.path.join(args.data_dir, d))))
            assert room_ids.size, (
                f"--room-trials: no R{{idx}}/ room subdirs under "
                f"{args.data_dir} (generate with cli.gen_simu_certain_room)")
        max_trials = len(room_ids) // args.ds_nsimroom
        assert max_trials >= 1, (
            f"{len(room_ids)} rooms < ds-nsimroom={args.ds_nsimroom}")
        if args.ntrial is None and ntrial > max_trials:
            print(f"room-trials: {len(room_ids)} rooms support only "
                  f"{max_trials} disjoint {args.ds_nsimroom}-room trials "
                  f"(protocol ntrial {ntrial}); clamping")
            ntrial = max_trials
        assert ntrial * args.ds_nsimroom <= len(room_ids), (
            f"--ntrial {ntrial} x nsimroom {args.ds_nsimroom} needs "
            f"{ntrial * args.ds_nsimroom} rooms, found {len(room_ids)}")

    cv_splits = None
    if args.rir_cv:
        from ..utils.metrics import cross_validation_datadirs
        assert args.rir_dir, "--rir-cv needs --rir-dir"
        rooms = sorted(d for d in os.listdir(args.rir_dir)
                       if os.path.isdir(os.path.join(args.rir_dir, d)))
        assert len(rooms) >= 3, (
            f"--rir-cv needs >= 3 room subdirs under {args.rir_dir}, "
            f"found {rooms}")
        cv_splits = list(cross_validation_datadirs(rooms, with_val=True,
                                                   seed=args.seed))
        ntrial = len(cv_splits)
        print(f"cross-validation over {len(rooms)} rooms -> {ntrial} trials")

    fs = 16000
    T = args.T or cfg.T
    nsample = round(T * fs) if not args.smoke else 2304
    feat_cfg = FeatureConfig()
    nt = feat_cfg.num_frames(nsample)

    if args.data_dir and not args.smoke:
        from ..data import FixMicSigDataset as _F
        from ..data import PackedDataset, is_packed
        probe = (PackedDataset(args.data_dir, load_anno=False)[0]
                 if is_packed(args.data_dir)
                 else _F(args.data_dir, data_num=1)[0])
        assert probe.shape[0] >= nsample, (
            f"data under {args.data_dir} has {probe.shape[0]} samples but "
            f"task '{args.ds_task}' expects >= {nsample} ({T} s @ {fs} Hz); "
            f"pass --T to match the data")

    if args.smoke:
        mcfg = SARSSLConfig(dtype="float32", pretrain=False,
                            downstream_embed=args.ds_embed).tiny(
            sig_shape=(256, nt, 2, 2), patch_shape=(256, 1),
            spec_dembed=32, spat_dembed=16, pretrain=False)
    else:
        mcfg = SARSSLConfig(sig_shape=(256, nt, 2, 2), dtype=args.dtype,
                            pretrain=False, downstream_embed=args.ds_embed)
    from ..ops.pairs import num_pairs, pairwise_tdoa
    npair = num_pairs(args.nmic, args.ch_mode)
    multipair = args.nmic > 2
    dlabel = npair if (multipair and args.ds_task == "TDOA") else 1
    if multipair:
        from ..models import SARSSLMultiCH
        feat_cfg = FeatureConfig(ch_mode=args.ch_mode)
        model = SARSSLMultiCH(mcfg, nmic_pair=npair, task=args.ds_task)
    else:
        model = SARSSL(mcfg)
    root_key = set_seed(args.seed)

    x0 = jnp.zeros((bs_set[0] * npair, 2, 256, nt, 2), jnp.float32)
    init_state = create_train_state(model, jax.random.key(args.seed), x0, None)
    init_params_sd = serialization.to_state_dict(
        jax.device_get(init_state.params))

    # pretrained encoder weights (finetune/lineareval)
    pre_sd, loaded_keys = None, []
    if args.ds_trainmode in ("finetune", "lineareval"):
        # these modes are DEFINED by transferring a pretrained encoder
        # (reference run_downstream.py:253-256); a missing checkpoint must
        # not silently mislabel scratch results as transfer results
        assert args.pretrain_ckpt or args.ds_trainmode != "lineareval", (
            "--ds-trainmode lineareval requires --pretrain-ckpt (without "
            "one there is nothing to freeze and EVERY param would train)")
        if not args.pretrain_ckpt:
            print("WARNING: --ds-trainmode finetune without --pretrain-ckpt "
                  "trains from random init (scratch)")
        else:
            payload = load_checkpoint(best_path(args.pretrain_ckpt))
            pre_sd = payload["params"]
            if multipair:
                # the shared single-pair trunk lives under 'model_sch'
                pre_sd = {"model_sch": pre_sd}

    def fresh_state():
        params = serialization.from_state_dict(init_state.params, init_params_sd)
        keys = []
        if pre_sd is not None:
            params, keys = partial_load(params, pre_sd)
            assert keys, ("--pretrain-ckpt matched ZERO parameter keys — "
                          "wrong checkpoint for this model config")
        st = init_state.replace(params=params,
                                opt_state=init_state.tx.init(params))
        return st, keys

    def make_batches(split, bs, seed, trial=0):
        # pod-scale DP: every host contributes bs/process_count DISTINCT
        # rows (disjoint seeds or file shards); single-process no-ops
        pc, pi = jax.process_count(), jax.process_index()
        seed0 = seed  # host-invariant (pod paths that shard rows explicitly
        # must NOT also perturb the permutation seed per host)
        if pc > 1:
            assert bs % pc == 0, (bs, pc)
            bs = bs // pc
            seed = seed + pi * 7919
        ratio = tuple(int(r) for r in args.real_sim_ratio)
        if args.real_sig_dir:
            # presaved real/sim mixture (reference RandomMicSigDataset,
            # dataset.py:232-285): train mixes per ratio, val/test are real
            from ..data import FixMicSigDatasetLOCATA, RandomMixDataset
            num = {"train": train_num, "val": args.val_num,
                   "test": args.test_num}[split] // pc
            tr = [Selecting((0, nsample))]
            arms, weights = [], []
            if split == "train" and ratio[1]:
                assert args.sim_sig_dir, (
                    "--real-sim-ratio includes a sim arm: pass --sim-sig-dir")
                arms.append(FixMicSigDataset(args.sim_sig_dir, load_anno=True,
                                             transforms=tr))
                weights.append(ratio[1])
            if ratio[0] or split != "train":
                arms.append(FixMicSigDatasetLOCATA(
                    os.path.join(args.real_sig_dir, split), load_anno=True,
                    transforms=tr))
                weights.append(ratio[0] if split == "train" else 1)
            if len(arms) == 1 and split != "train":
                # fixed eval corpus: enumerate it (no with-replacement draws)
                arms[0].data_paths = arms[0].data_paths[:num]
                return batch_iterator(arms[0], bs, shuffle=False,
                                      num_workers=args.workers)
            # train (non-train single-arm returned above): even with one
            # arm, draws are with-replacement over the FULL corpus with
            # epoch length num — the reference's randint-per-__getitem__
            # (dataset.py:276-278); truncating to the first num sorted
            # paths would bias training to whatever sorts first
            ds = RandomMixDataset(arms, length=num, seed=seed * 13 + 5,
                                  probs=weights)
            return batch_iterator(ds, bs, shuffle=split == "train",
                                  seed=seed, num_workers=args.workers)
        if args.rir_dir or args.sim_rir_dir:
            # on-the-fly speech x RIR, real and/or simulated arms (reference
            # RandomMicSigFromRIRDataset, dataset.py:287-382)
            from ..data import (NpyRIRDataset, SimRIRDataset,
                                MicSigFromRIRDataset, SpeakerTreeDataset,
                                RandomMixDataset)
            num = {"train": train_num, "val": args.val_num,
                   "test": args.test_num}[split] // pc
            srcs = SpeakerTreeDataset(args.src_dir, T=T, fs=fs)

            def real_arm(s):
                rooms = (cv_splits[trial][split] if cv_splits is not None
                         else None)
                return MicSigFromRIRDataset(
                    NpyRIRDataset(args.rir_dir, fs=fs, rooms=rooms), srcs,
                    T=T, fs=fs, seed=s, length=num)

            def sim_arm(s):
                return MicSigFromRIRDataset(
                    SimRIRDataset(args.sim_rir_dir, fs=fs), srcs, T=T, fs=fs,
                    seed=s, length=num, noise_type="diffuse_white")

            arms, weights = [], []
            if split == "train":
                if ratio[0] and args.rir_dir:
                    arms.append(real_arm(seed * 7 + 1))
                    weights.append(ratio[0])
                if ratio[1] and args.sim_rir_dir:
                    arms.append(sim_arm(seed * 7 + 2))
                    weights.append(ratio[1])
            else:  # val/test on the real arm when it exists
                arms.append(real_arm(seed * 7 + 1) if args.rir_dir
                            else sim_arm(seed * 7 + 2))
                weights.append(1)
            assert arms, ("--real-sim-ratio excludes every provided RIR arm "
                          f"(ratio {ratio}, rir_dir={bool(args.rir_dir)}, "
                          f"sim_rir_dir={bool(args.sim_rir_dir)})")
            ds = (arms[0] if len(arms) == 1 else
                  RandomMixDataset(arms, length=num, seed=seed * 13 + 5,
                                   probs=weights))
            if args.mp_loader and args.workers > 0:
                from ..data import mp_batch_iterator
                return mp_batch_iterator(ds, bs, shuffle=split == "train",
                                         seed=seed,
                                         num_workers=args.workers)
            return batch_iterator(ds, bs, shuffle=split == "train",
                                  seed=seed, num_workers=args.workers)
        if args.synthetic:
            num = {"train": train_num, "val": args.val_num,
                   "test": args.test_num}[split] // pc
            if multipair:
                from ..data.synthetic import synth_batch_multich

                def gen_multich():
                    rng = np.random.default_rng(seed)
                    for _ in range(max(1, num // bs)):
                        wave, tdoa = synth_batch_multich(rng, bs, nsample,
                                                         nch=args.nmic)
                        yield wave, {"TDOA": tdoa / fs}
                return gen_multich()
            gen = SyntheticPairs(nsample=nsample, seed=seed)
            return gen.batches(bs, max(1, num // bs), with_labels=True)
        data_dir = {"train": args.data_dir,
                    "val": args.val_data_dir or args.data_dir,
                    "test": args.test_data_dir or args.data_dir}[split]
        from ..data import is_packed
        if is_packed(data_dir):
            import itertools
            from ..data import PackedDataset
            pds = PackedDataset(data_dir, load_anno=True)
            num = {"train": train_num, "val": args.val_num,
                   "test": args.test_num}[split]
            subset = (packed_train_subset(args, pds, num, trial)
                      if split == "train" else None)
            if subset is not None and args.room_trials:
                num = min(num, len(subset))

            def gen_packed():
                # one SHARED permutation (seed0) across hosts: shard_i/shard_n
                # hand out disjoint rows; a per-host seed would break that
                it = pds.iter_batches(bs, shuffle=split == "train",
                                      seed=seed0, shard_i=pi, shard_n=pc,
                                      subset=subset)
                for w, lab in itertools.islice(it, max(1, num // (bs * pc))):
                    yield w[:, :nsample], lab
            return gen_packed()
        num = {"train": train_num, "val": args.val_num,
               "test": args.test_num}[split]
        if args.room_trials and split == "train":
            # trial's room block, then a fixed seeded draw of num rows
            # across the WHOLE block ([:num] truncation in sorted-path
            # order would keep only the block's lowest room ids)
            from ..data.shards import room_id_of_path
            ds = FixMicSigDataset(data_dir, load_anno=True,
                                  transforms=[Selecting((0, nsample))])
            rooms = [room_id_of_path(p) for p in ds.data_paths]
            assert all(r is not None for r in rooms), (
                f"--room-trials: items outside R{{idx}}/ subdirs under "
                f"{data_dir}")
            rows = room_block_rows(rooms, args.ds_nsimroom, trial)
            rows = trial_subset_draw(rows, num, args.seed, trial)
            ds.data_paths = [ds.data_paths[i] for i in rows]
        else:
            ds = FixMicSigDataset(data_dir, load_anno=True, data_num=num,
                                  transforms=[Selecting((0, nsample))])
        if pc > 1:  # strided per-host corpus shard
            from ..parallel import shard_for_process
            ds.data_paths = shard_for_process(ds.data_paths)
        return batch_iterator(ds, bs, shuffle=split == "train", seed=seed,
                              num_workers=args.workers)

    os.makedirs(args.exp_dir, exist_ok=True)
    save_config(vars(args), os.path.join(args.exp_dir, "config.json"))

    if args.ds_test:
        return _ds_test(args, model, feat_cfg, init_state, make_batches,
                        bs_set[0])

    results = {}

    if args.grid_vmap:
        assert not multipair and len(bs_set) == 1 and not args.mesh, (
            "--grid-vmap supports single-bs, 2-mic, unmeshed grids")
        assert jax.process_count() == 1, (
            "--grid-vmap is single-process: on a pod each host would run "
            "an independent grid on its own data shard and race on "
            "results.json — use the sequential grid with --mesh")
        assert cv_splits is None, (
            "--grid-vmap shares one val/test set across lanes; --rir-cv "
            "gives each trial its own rooms — use the sequential grid")
        results = _grid_vmapped(args, model, feat_cfg, fresh_state,
                                make_batches, lr_set, bs_set[0], ntrial,
                                root_key, dlabel, nsample=nsample,
                                train_num=train_num)

    for trial, bs, lr in (() if args.grid_vmap else
                          itertools.product(range(ntrial), bs_set, lr_set)):
        cell = f"trial{trial}_bs{bs}_lr{lr:g}"
        cell_dir = os.path.join(args.exp_dir, cell)
        state, keys = fresh_state()
        tmask = None
        if args.ds_trainmode == "lineareval" and keys:
            tmask = trainable_mask_from_loaded(state.params, keys)
        b_sh = None
        if args.mesh:
            from ..parallel import (make_mesh, make_sharded_downstream_step,
                                    make_sharded_downstream_eval_step)
            d, mm = map(int, args.mesh.split("x"))
            mesh = make_mesh(n_data=d, n_model=mm)
            train_step, st_sh, b_sh = make_sharded_downstream_step(
                model, feat_cfg, mesh, state, task=args.ds_task, donate=False,
                trainable_mask=tmask, dlabel=dlabel)
            eval_step, _, _ = make_sharded_downstream_eval_step(
                model, feat_cfg, mesh, state, task=args.ds_task,
                dlabel=dlabel)
            state = jax.device_put(state, st_sh)
        else:
            train_step = make_downstream_step(
                model, feat_cfg, task=args.ds_task, donate=False,
                trainable_mask=tmask, dlabel=dlabel)
            eval_step = make_downstream_eval_step(
                model, feat_cfg, task=args.ds_task, dlabel=dlabel)

        def batch_adapter(it):
            for wave, gt in it:
                g = gt[args.ds_task] if isinstance(gt, dict) else gt
                g = np.asarray(g, np.float32)
                if multipair and args.ds_task == "TDOA":
                    # per-mic (vs mic 0) annotations -> per-pair targets
                    g = pairwise_tdoa(g.reshape(g.shape[0], -1),
                                      args.nmic, args.ch_mode)
                if b_sh is not None:
                    # multi-process: assemble host-local rows into the global
                    # batch (stay numpy until here — a jnp.asarray first
                    # would bounce device->host->device per batch);
                    # single-process this is a plain sharded put
                    from ..parallel import global_batch_from_local
                    wave = global_batch_from_local(np.asarray(wave), b_sh)
                    g = global_batch_from_local(np.asarray(g), b_sh)
                else:
                    wave = jnp.asarray(wave)
                    g = jnp.asarray(g)
                yield wave, g

        learner = DownstreamLearner(
            state=state, train_step=train_step, eval_step=eval_step,
            lr_init=lr, ckpt_dir=os.path.join(cell_dir, "ckpt"),
            patience=10 if not args.smoke else 2,
            logger=MetricLogger(os.path.join(cell_dir, "logs"),
                                use_tensorboard=False))

        for epoch in range(args.epochs):
            tkey = jax.random.fold_in(root_key,
                                      7000 + epoch + trial * 100_000)
            tm = learner.train_epoch(
                batch_adapter(make_batches(
                    "train", bs, args.seed + trial * 1000 + epoch, trial)),
                tkey)
            vm = learner.eval_epoch(
                batch_adapter(make_batches("val", bs, 1, trial)),
                split="val")
            stop = learner.end_epoch(vm["mae"])
            if stop:
                break

        # ensemble last <=5 best epochs, then final test
        ens_params = learner.ensemble(k=5)
        learner.state = learner.state.replace(params=ens_params)
        test_m = learner.eval_epoch(
            batch_adapter(make_batches("test", bs, 2, trial)), split="test")
        val_m = learner.eval_epoch(
            batch_adapter(make_batches("val", bs, 1, trial)),
            split="val_final")
        results[cell] = {"val_mae": val_m["mae"], "test_mae": test_m["mae"],
                         "lr": lr, "bs": bs, "trial": trial,
                         "epochs_run": learner.epoch}
        print(f"{cell}: val MAE {val_m['mae']:.5f} test MAE {test_m['mae']:.5f}")
        # prune per-epoch checkpoints (reference run_downstream.py:345-354)
        kept = set(learner.best_epochs[-5:])
        ckpt.remove_checkpoint_epochs(
            os.path.join(cell_dir, "ckpt"),
            [e for e in range(learner.epoch) if e not in kept])

    # grid summary: argmin mean val MAE over (bs, lr)
    by_cfg = {}
    for cell, r in results.items():
        by_cfg.setdefault((r["bs"], r["lr"]), []).append(r)
    summary = {
        f"bs{bs}_lr{lr:g}": {
            "mean_val_mae": float(np.mean([r["val_mae"] for r in rs])),
            "mean_test_mae": float(np.mean([r["test_mae"] for r in rs])),
        } for (bs, lr), rs in by_cfg.items()}
    # a diverged lane (NaN val MAE) must neither win min() by NaN-compare
    # order nor knock its config out of contention silently
    finite = {k: v for k, v in summary.items()
              if np.isfinite(v["mean_val_mae"])}
    if len(finite) < len(summary):
        print(f"WARNING: {len(summary) - len(finite)} config(s) with "
              f"non-finite mean val MAE excluded from best-config selection")
    best_cfg = min(finite or summary,
                   key=lambda k: summary[k]["mean_val_mae"])
    out = {"task": args.ds_task, "mode": args.ds_trainmode, "cells": results,
           "summary": summary, "best": best_cfg,
           "best_test_mae": summary[best_cfg]["mean_test_mae"]}
    with open(os.path.join(args.exp_dir, "results.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    try:
        from scipy.io import savemat
        savemat(os.path.join(args.exp_dir, "results.mat"),
                {"results": json.loads(json.dumps(out, default=float))})
    except Exception as e:  # .mat is a convenience artifact only
        print("savemat skipped:", e)
    print(f"BEST {best_cfg}: test MAE {out['best_test_mae']:.5f}")

    if args.smoke:
        ok = np.isfinite(out["best_test_mae"])
        print("SMOKE", "PASS" if ok else "FAIL")
        return 0 if ok else 1
    return 0


def _grid_vmapped(args, model, feat_cfg, fresh_state, make_batches, lr_set,
                  bs, ntrial, root_key, dlabel, nsample=None,
                  train_num=None):
    """All (trial, lr) cells as lanes of vmapped programs (train/grid.py),
    chunked to --grid-chunk lanes per program so the stacked f32 states +
    the on-device ensemble ring fit HBM; reproduces the sequential per-cell
    life cycle — reference run_downstream.py:115-166 made TPU-shaped."""
    import jax

    from ..train.checkpoint import trainable_mask_from_loaded
    from ..train import checkpoint as ckpt
    from ..train.grid import VmappedGridRunner, slice_state

    trial_list = (list(args.trial_set) if args.trial_set is not None
                  else list(range(ntrial)))
    all_cells = [(t, lr) for t in trial_list for lr in lr_set]

    def adapt(it):
        for wave, gt in it:
            g = gt[args.ds_task] if isinstance(gt, dict) else gt
            yield np.asarray(wave), np.asarray(g, np.float32)

    # device-resident training data for the packed single-process path:
    # the whole split stays in HBM across chunks and epochs send only
    # index batches (KBs instead of 100s of MB of h2d per epoch)
    pds_res, waves_dev = None, None
    if (args.data_dir and not args.real_sig_dir and not args.rir_dir
            and not args.sim_rir_dir and not args.synthetic
            and nsample is not None and train_num is not None
            and jax.process_count() == 1):
        from ..data import PackedDataset, is_packed
        if is_packed(args.data_dir):
            pds_res = PackedDataset(args.data_dir, load_anno=True)
            nbytes = (len(pds_res) * nsample
                      * pds_res.meta["nch"] * 4)
            budget_b = float(os.environ.get("SARSSL_RESIDENT_BUDGET_GB",
                                            "6")) * 1e9
            if nbytes > budget_b:
                # a split that would crowd out the stacked lane states +
                # ensemble ring in HBM streams instead (the 65 GB-RSS
                # host-spill failure mode is worse than per-epoch h2d)
                print(f"train split {nbytes / 1e9:.1f} GB exceeds the "
                      f"resident budget ({budget_b / 1e9:.0f} GB, "
                      "SARSSL_RESIDENT_BUDGET_GB) — streaming instead",
                      flush=True)
                pds_res = None
            else:
                waves_dev = jax.device_put(pds_res.all_waves(nsample))
                print(f"staged {len(pds_res)} train utts "
                      f"({waves_dev.nbytes / 1e6:.0f} MB) on device",
                      flush=True)

    results = {}
    nchunk = max(1, args.grid_chunk)
    starts = list(range(0, len(all_cells), nchunk))
    t_start = time.time()
    budget = getattr(args, "time_budget", 0) or 0
    for ci, lo in enumerate(starts):
        cells = all_cells[lo: lo + nchunk]
        if len(all_cells) > nchunk:
            print(f"--- grid chunk {ci + 1}: cells "
                  f"{[f'trial{t}_lr{lr:g}' for t, lr in cells]}",
                  flush=True)
        # ONE deserialize + partial_load + h2d, shared by every lane (the
        # stacked per-lane copies are made on device by stack_states)
        st0, keys = fresh_state()
        init_states = [st0] * len(cells)
        tmask = None
        if args.ds_trainmode == "lineareval" and keys:
            tmask = trainable_mask_from_loaded(init_states[0].params, keys)

        # lr cells within a trial see the same data stream (sequential
        # semantics), so transfer one data slot per trial and let lanes
        # gather their slot on device (train/grid.py lane_slots)
        trials = sorted({t for t, _ in cells})
        lane_slots = [trials.index(t) for t, _ in cells]
        runner = VmappedGridRunner(
            model, feat_cfg, init_states, cells, task=args.ds_task,
            dlabel=dlabel, trainable_mask=tmask,
            patience=10 if not args.smoke else 2,
            scan_block=max(1, args.scan_block), lane_slots=lane_slots)
        # prorated graceful deadline: results.json must exist even if the
        # grid would outlive the driver's outer timeout
        deadline = (t_start + budget * (ci + 1) / len(starts)
                    if budget else None)
        # the val set is fixed: stage it on device once per chunk
        staged_val = runner.stage_eval_blocks(adapt(make_batches("val",
                                                                bs, 1)))

        if waves_dev is not None:
            runner.stage_train_waves(waves_dev)

        budget_hit = False
        # per-trial train-row universes are epoch-independent (fixed draws
        # or room blocks); lanes step in lockstep, so the shared per-epoch
        # batch count uses the smallest universe
        trial_subs = ({t: packed_train_subset(args, pds_res, train_num, t)
                       for t in trials} if waves_dev is not None else {})
        res_num = train_num
        if trial_subs and not all(s is None for s in trial_subs.values()):
            res_num = min(train_num,
                          min(len(s) for s in trial_subs.values()
                              if s is not None))
        for epoch in range(args.epochs):
            rngs = [jax.random.fold_in(root_key, 7000 + epoch + t * 100_000)
                    for t, _ in cells]
            t0 = time.time()
            if waves_dev is not None:
                # same permutation seeds as make_batches' packed path ->
                # identical batches, but gathered on device by index
                nb = max(1, res_num // bs)
                acol = pds_res.annos()[args.ds_task]
                idx_streams = {
                    t: itertools.islice(
                        pds_res.batch_indices(
                            bs, shuffle=True,
                            seed=args.seed + t * 1000 + epoch,
                            subset=trial_subs[t]), nb)
                    for t in trials}

                def stacked_idx(idx_streams=idx_streams, acol=acol):
                    for per_trial in zip(*idx_streams.values()):
                        by_t = dict(zip(idx_streams.keys(), per_trial))
                        yield (np.stack([by_t[t] for t in trials]),
                               np.stack([np.asarray(acol[by_t[t]],
                                                    np.float32)
                                         for t in trials]))

                tm = runner.train_epoch_resident(stacked_idx(), rngs)
            else:
                streams = {t: adapt(make_batches("train", bs,
                                                 args.seed + t * 1000
                                                 + epoch, t))
                           for t in trials}

                def stacked(streams=streams):
                    for per_trial in zip(*streams.values()):
                        by_t = dict(zip(streams.keys(), per_trial))
                        yield (np.stack([by_t[t][0] for t in trials]),
                               np.stack([by_t[t][1] for t in trials]))

                tm = runner.train_epoch(stacked(), rngs)
            t1 = time.time()
            vm = runner.eval_epoch_staged(staged_val)
            t2 = time.time()
            ndone = sum(c.done for c in runner.cells)
            print(f"epoch {epoch}: mean train mae {tm['mae'].mean():.5f} "
                  f"mean val mae {vm['mae'].mean():.5f} cells done "
                  f"{ndone}/{len(cells)} [train {t1 - t0:.1f}s val "
                  f"{t2 - t1:.1f}s tot {time.time() - t_start:.0f}s]",
                  flush=True)
            if runner.end_epoch(vm["mae"]):
                break
            if deadline is not None and time.time() > deadline:
                print(f"chunk {ci + 1} hit its prorated time budget at "
                      f"epoch {epoch}; finalizing early", flush=True)
                budget_hit = True
                break

        runner.ensembled_states()
        test_m = runner.eval_epoch(adapt(make_batches("test", bs, 2)))
        val_m = runner.eval_epoch_staged(staged_val)

        for i, (t, lr) in enumerate(cells):
            cell = f"trial{t}_bs{bs}_lr{lr:g}"
            cell_dir = os.path.join(args.exp_dir, cell)
            ckpt.save_named(os.path.join(cell_dir, "ckpt"),
                            slice_state(runner.states, i), "ensemble_model",
                            epoch=-1, max_score=runner.cells[i].stopper.best)
            results[cell] = {"val_mae": float(val_m["mae"][i]),
                             "test_mae": float(test_m["mae"][i]),
                             "lr": lr, "bs": bs, "trial": t,
                             "epochs_run": runner.cells[i].epochs_run,
                             # deadline fired before this cell early-stopped:
                             # its MAE is from an unconverged ensemble
                             "truncated": bool(budget_hit
                                               and not runner.cells[i].done)}
            print(f"{cell}: val MAE {results[cell]['val_mae']:.5f} "
                  f"test MAE {results[cell]['test_mae']:.5f}", flush=True)
        # recovery artifact: chunks already finished survive a killed run
        with open(os.path.join(args.exp_dir, "results.partial.json"),
                  "w") as f:
            json.dump(results, f, indent=2, default=float)
        del runner
    return results


def _ds_test(args, model, feat_cfg, init_state, make_batches, bs):
    """--ds-test modes (reference run_downstream.py:380-534):
    cal_metric          MAE of a trained checkpoint on the test split;
    cal_metric_wo_info  predict-train-mean baseline (learner.py:655-686);
    vis_embed           t-SNE of test embeddings colored by target."""
    import jax
    import jax.numpy as jnp

    from ..train import make_downstream_eval_step
    from ..train import checkpoint as ckpt
    from ..train.learner import mae_without_training
    from ..train.steps import _target_transform

    from ..ops.pairs import pairwise_tdoa, num_pairs

    multipair = args.nmic > 2
    dlabel = (num_pairs(args.nmic, args.ch_mode)
              if (multipair and args.ds_task == "TDOA") else 1)

    def batch_adapter(it):
        for wave, gt in it:
            g = gt[args.ds_task] if isinstance(gt, dict) else gt
            g = jnp.asarray(np.asarray(g, np.float32))
            if multipair and args.ds_task == "TDOA":
                g = pairwise_tdoa(g.reshape(g.shape[0], -1),
                                  args.nmic, args.ch_mode)
            yield jnp.asarray(wave), g

    if args.ds_test_mode == "cal_metric_wo_info":
        tr = np.concatenate([np.asarray(_target_transform(args.ds_task, g))
                             for _, g in batch_adapter(
                                 make_batches("train", bs, args.seed))])
        te = np.concatenate([np.asarray(_target_transform(args.ds_task, g))
                             for _, g in batch_adapter(
                                 make_batches("test", bs, 2))])
        r = mae_without_training(tr, te)
        print(f"no-train baseline [{args.ds_task}]: "
              f"train MAE {r['mae_train']:.5f} test MAE {r['mae_test']:.5f} "
              f"(mean {r['mean']:.5f})")
        return 0

    state = init_state
    if args.ckpt:
        from ..train.checkpoint import ensemble_path, best_path, load_checkpoint, restore_state
        path = (ensemble_path(args.ckpt)
                if os.path.exists(ensemble_path(args.ckpt))
                else best_path(args.ckpt))
        state = restore_state(state, load_checkpoint(path), restore_opt=False)
        print(f"loaded {path}")

    eval_step = make_downstream_eval_step(model, feat_cfg, task=args.ds_task,
                                          dlabel=dlabel)

    if args.ds_test_mode == "vis_embed":
        from ..utils.vis import plot_tsne_embeddings
        embeds, labels = [], []
        for wave, gt in batch_adapter(make_batches("test", bs, 2)):
            m = eval_step(state, wave, gt)
            embeds.append(np.asarray(m["embed"], np.float32))
            labels.append(np.asarray(gt).ravel())
        out = plot_tsne_embeddings(np.concatenate(embeds),
                                   np.concatenate(labels),
                                   os.path.join(args.exp_dir, "tsne.png"))
        print("t-SNE saved to", out)
        return 0

    tot, tot_mae, n = 0.0, 0.0, 0
    for wave, gt in batch_adapter(make_batches("test", bs, 2)):
        m = eval_step(state, wave, gt)
        tot += float(m["loss"]); tot_mae += float(m["mae"]); n += 1
    print(f"test [{args.ds_task}]: loss {tot/max(n,1):.5f} "
          f"MAE {tot_mae/max(n,1):.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
