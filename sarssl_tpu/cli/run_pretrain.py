"""Pretext pre-training CLI.

Equivalent of /root/reference/code/run_pretrain.py: masked cross-channel
reconstruction pretraining of the dual-encoder MC-Conformer on simulated
mic-pair signals, with cosine lr, early stopping, per-epoch checkpoints and
TensorBoard/JSONL metrics.

Usage:
  python -m sarssl_tpu.cli.run_pretrain --pretrain --data-dir DATA [...]
  python -m sarssl_tpu.cli.run_pretrain --pretrain --synthetic  # file-free
  python -m sarssl_tpu.cli.run_pretrain --smoke                 # tiny e2e run
  python -m sarssl_tpu.cli.run_pretrain --test --exp-dir DIR --data-dir DATA
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("sarssl_tpu pretrain")
    p.add_argument("--pretrain", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny synthetic end-to-end run (CI)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the file-free synthetic pair generator (host)")
    p.add_argument("--device-synth", action="store_true",
                   help="fully device-resident on-the-fly synthesis "
                        "(image-model mic pairs, zero host preprocessing)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--val-data-dir", type=str, default=None)
    p.add_argument("--exp-dir", type=str, default="exp/pretrain")
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup-epochs", type=int, default=0)
    p.add_argument("--fused-attention", action="store_true",
                   help="Pallas fused attention kernel (TPU)")
    p.add_argument("--mel-bins", type=int, default=0,
                   help="> 0: mel-scale features with this many bands "
                        "(reference mel_scale option, learner.py:507-514)")
    p.add_argument("--train-num", type=int, default=512000)
    p.add_argument("--val-num", type=int, default=4000)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--parity", action="store_true",
                   help="reference quirks: fresh Adam each epoch")
    p.add_argument("--pretrain-frozen-encoder", action="store_true",
                   help="freeze encoders, retrain decoder on the "
                        "kept-channel-only pretext (run_pretrain.py:315-402)")
    p.add_argument("--init-ckpt", type=str, default=None,
                   help="checkpoint dir to initialize from (best_model)")
    p.add_argument("--real-data-dirs", type=str, nargs="+", default=None,
                   help="real corpora dirs for prob-mixed pretraining "
                        "(generic CorpusSpec readers)")
    p.add_argument("--real-corpora", type=str, nargs="+", default=None,
                   help="bespoke corpus readers as NAME=DIR (NAME in "
                        "RealMAN/LOCATA/MCWSJ/LibriCSS/AMI/AISHELL4/M2MeT/"
                        "CHiME3); mixed with --real-data-dirs")
    p.add_argument("--real-data-probs", type=float, nargs="+", default=None)
    p.add_argument("--remove-spkoverlap", action="store_true",
                   help="TextGrid speaker-overlap removal for AISHELL4/M2MeT")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume-from-best", action="store_true",
                   help="resume from best_model instead of latest "
                        "(reference run_pretrain.py:213-223)")
    p.add_argument("--extra-val-dirs", type=str, nargs="+", default=None,
                   help="extra wav trees evaluated per epoch as separate "
                        "splits (reference LOCATA/ACE test loaders, "
                        "run_pretrain.py:256-265)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--mesh", type=str, default=None,
                   help="'DxM' data x model mesh, e.g. 8x1")
    p.add_argument("--resident", action="store_true",
                   help="stage the packed train/val splits in device memory "
                        "once and feed epochs by on-device index gathers "
                        "(~KBs of h2d per epoch instead of the whole corpus; "
                        "single-process, packed --data-dir only)")
    p.add_argument("--resident-dtype", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="staging dtype for --resident: int16 halves the "
                        "HBM footprint (globally-scaled, ~-90 dB "
                        "quantization at the sim corpora's 0.9-peak norm; "
                        "dequantized on device inside the gather)")
    p.add_argument("--resident-num", type=int, default=None,
                   help="stage only the first N rows of the train split "
                        "(HBM fallback for corpora that don't fit; the "
                        "epoch index universe is restricted to match)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    from ..config import AcousticSetting
    from ..models import SARSSL, SARSSLConfig
    from ..ops import FeatureConfig, gen_patch_mask
    from ..train import (create_train_state, make_pretrain_step,
                         make_pretrain_eval_step, cosine_schedule,
                         PretrainLearner)
    from ..train import checkpoint as ckpt
    from ..utils import MetricLogger, save_config, count_params, set_seed
    from ..data import (FixMicSigDataset, SyntheticPairs, batch_iterator,
                        Selecting)

    if args.smoke:
        args.pretrain = True
        # an explicit data source still wins under --smoke (tiny-model
        # drives of the packed/device-synth paths); an explicit
        # --synthetic wins over everything
        args.synthetic = (args.synthetic
                          or not (args.data_dir or args.device_synth))
        args.epochs = min(args.epochs, 2)
        args.bs = 4
        args.train_num = 16
        args.val_num = 8
        args.cpu = True
        jax.config.update("jax_platforms", "cpu")

    ac = AcousticSetting()
    nsample = ac.nsample if not args.smoke else 2304
    feat_cfg = FeatureConfig(mel_bins=args.mel_bins)
    nt = feat_cfg.num_frames(nsample)
    nf = feat_cfg.nf_used  # 256 linear bins, or mel_bins on the mel scale

    if args.smoke:
        mcfg = SARSSLConfig(dtype="float32").tiny(
            sig_shape=(nf, nt, 2, 2), patch_shape=(nf, 1),
            spec_dembed=32, spat_dembed=16)
    else:
        mcfg = SARSSLConfig(
            sig_shape=(nf, nt, 2, 2), patch_shape=(nf, 1), dtype=args.dtype,
            fused_attention=args.fused_attention,
            frozen_encoder_pretext=args.pretrain_frozen_encoder)

    model = SARSSL(mcfg)
    root_key = set_seed(args.seed)

    x0 = jnp.zeros((args.bs, 2, nf, nt, 2), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), args.bs, mcfg.npatch,
                        mcfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(args.seed), x0, m0,
                               lr=args.lr)
    print("# Parameters (M):", count_params(
        state.params, ["spec_encoder", "spat_encoder", "decoder"]))

    ckpt_dir = os.path.join(args.exp_dir, "checkpoints")
    log_dir = os.path.join(args.exp_dir, "logs")
    os.makedirs(ckpt_dir, exist_ok=True)
    # --test runs point --exp-dir at an existing pretrain experiment; write
    # their config beside it instead of clobbering the training run's record.
    cfg_name = "config_test.json" if args.test else "config.json"
    save_config(vars(args), os.path.join(args.exp_dir, cfg_name))

    if args.test:
        return _pretext_test(args, model, mcfg, feat_cfg, state, nsample)

    trainable_mask = None
    if args.init_ckpt:
        payload = ckpt.load_checkpoint(ckpt.best_path(args.init_ckpt))
        from ..train.checkpoint import partial_load, trainable_mask_from_loaded
        params, loaded = partial_load(state.params, payload["params"],
                                      verbose=True)
        state = state.replace(params=params,
                              opt_state=state.tx.init(params))
        if args.pretrain_frozen_encoder:
            # freeze everything that was loaded except the decoder
            enc_keys = [k for k in loaded if not k.startswith("decoder")]
            trainable_mask = trainable_mask_from_loaded(state.params, enc_keys)

    mesh = None
    if args.mesh:
        from ..parallel import (make_mesh, make_sharded_pretrain_step,
                                make_sharded_pretrain_eval_step)
        d, m = map(int, args.mesh.split("x"))
        mesh = make_mesh(n_data=d, n_model=m)
        train_step, st_sh, b_sh = make_sharded_pretrain_step(
            model, feat_cfg, mesh, state, trainable_mask=trainable_mask)
        eval_step, _, _ = make_sharded_pretrain_eval_step(
            model, feat_cfg, mesh, state)
        state = jax.device_put(state, st_sh)
    else:
        train_step = make_pretrain_step(model, feat_cfg,
                                        trainable_mask=trainable_mask)
        eval_step = make_pretrain_eval_step(model, feat_cfg)

    learner = PretrainLearner(
        state=state, train_step=train_step, eval_step=eval_step,
        lr_schedule=cosine_schedule(args.epochs, args.lr,
                                    warmup_steps=args.warmup_epochs),
        ckpt_dir=ckpt_dir, patience=100,
        fresh_opt_each_epoch=args.parity,
        logger=MetricLogger(log_dir))

    resume_path = (ckpt.best_path(ckpt_dir) if args.resume_from_best
                   else ckpt.latest_path(ckpt_dir))
    if (args.resume or args.resume_from_best) and os.path.exists(resume_path):
        payload = ckpt.load_checkpoint(resume_path)
        learner.state = ckpt.restore_state(
            learner.state, payload, restore_opt=not args.resume_from_best)
        learner.epoch = payload["meta"]["epoch"] + 1
        # restore the early-stop high-water mark too, else the first resumed
        # epoch is unconditionally a "new best" and can clobber best_model
        # with a worse checkpoint
        learner.stopper.best = payload["meta"].get(
            "max_score", learner.stopper.best)
        print(f"resumed from epoch {payload['meta']['epoch']} "
              f"({os.path.basename(resume_path)})")

    # real-corpus mixture is built ONCE (item tables use header-only
    # duration probes); epochs only reseed the sampling
    real_mix = None
    if args.real_corpora or args.real_data_dirs:
        from ..data import (RealMicSigDataset, RandomRealDataset, CorpusSpec,
                            REAL_CORPORA)
        sets = []
        for entry in (args.real_corpora or []):
            name, _, d = entry.partition("=")
            assert _ == "=", f"--real-corpora entries are NAME=DIR: {entry}"
            sets.append(REAL_CORPORA[name](
                d, T=nsample / 16000, fs=16000, stage="train",
                seed=args.seed, remove_spkoverlap=args.remove_spkoverlap))
        for d in (args.real_data_dirs or []):
            sets.append(RealMicSigDataset(d, CorpusSpec(os.path.basename(d)),
                                          T=nsample / 16000, fs=16000,
                                          seed=args.seed))
        real_mix = RandomRealDataset(sets, probs=args.real_data_probs,
                                     seed=args.seed)

    # pod-scale DP: every host contributes bs/process_count DISTINCT rows
    # (disjoint seeds or file shards); single-process: pc=1, pi=0 no-ops
    pc, pi = jax.process_count(), jax.process_index()
    assert args.bs % pc == 0, (args.bs, pc)
    local_bs = args.bs // pc

    # --resident: the whole packed split lives in HBM; epochs send only
    # int32 index batches. Repeated-epoch streaming through the axon
    # tunnel grows the client's h2d staging footprint until the host
    # thrashes (measured: scripts/README.md, train/grid.py does the same
    # for downstream grids).
    resident_waves = None
    if args.resident:
        from ..data import PackedDataset, is_packed
        assert pc == 1 and not args.mesh, \
            "--resident is a single-process, unsharded path"
        assert not (args.device_synth or args.synthetic or real_mix), \
            "--resident needs a packed --data-dir corpus"
        assert args.data_dir and is_packed(args.data_dir), \
            f"--resident needs a packed --data-dir (cli/pack_data.py): " \
            f"{args.data_dir}"
        assert args.resident_num is None or args.resident_num > 0, \
            args.resident_num
        vdir = args.val_data_dir or args.data_dir
        assert is_packed(vdir), f"--resident val dir is not packed: {vdir}"
        pds_t = PackedDataset(args.data_dir, load_anno=False)
        pds_v = (pds_t
                 if os.path.realpath(vdir) == os.path.realpath(args.data_dir)
                 else PackedDataset(vdir, load_anno=False))

        def stage(pds, limit=None):
            n = pds.n if limit is None else min(limit, pds.n)
            nbytes = n * nsample * pds.meta["nch"] * (
                2 if args.resident_dtype == "int16" else 4)
            budget = float(os.environ.get("SARSSL_RESIDENT_BUDGET_GB",
                                          "8")) * 1e9
            assert nbytes <= budget, (
                f"--resident would stage {nbytes / 1e9:.1f} GB "
                f"({n} rows, {args.resident_dtype}) — over the "
                f"{budget / 1e9:.0f} GB budget (SARSSL_RESIDENT_BUDGET_GB)."
                " Use --resident-dtype int16, --resident-num, or stream")
            if args.resident_dtype == "int16":
                q, scale = pds.all_waves_i16(nsample, limit=limit)
                return pds, jax.device_put(q), scale
            return pds, jax.device_put(
                pds.all_waves(nsample, limit=limit)), None

        # val is read with shuffle=False through islice: only the first
        # val_rows rows are ever gathered — stage no more than that, and
        # reuse the train staging when it already covers them
        val_rows = max(1, args.val_num // args.bs) * args.bs
        resident_waves = {"train": stage(pds_t, args.resident_num)}
        train_rows = resident_waves["train"][1].shape[0]
        resident_waves["val"] = (resident_waves["train"]
                                 if pds_v is pds_t and train_rows >= min(
                                     val_rows, pds_v.n)
                                 else stage(pds_v, val_rows))

        gather_f = jax.jit(lambda w, i: w[i])
        gather_q = jax.jit(lambda w, i, s: w[i].astype(jnp.float32) * s)

        def gather(w, i, scale):
            return (gather_f(w, i) if scale is None
                    else gather_q(w, i, scale))

    def make_batches(split, epoch):
        if resident_waves is not None:
            import itertools
            pds, waves, scale = resident_waves["train" if split == "train"
                                               else "val"]
            num = args.train_num if split == "train" else args.val_num
            # the EXACT batches the streaming packed path below would draw
            # (same batch_indices stream; parity pinned by test)
            subset = (np.arange(waves.shape[0])
                      if split == "train" and args.resident_num else None)
            it = pds.batch_indices(local_bs, shuffle=split == "train",
                                   seed=args.seed + epoch, subset=subset)
            it = itertools.islice(it, max(1, num // args.bs))
            return (gather(waves, jnp.asarray(i), scale) for i in it)
        if args.device_synth:
            assert pc == 1, ("--device-synth is single-process; use the "
                             "file/synthetic pipelines for pod runs")
            from ..data import DeviceSynthConfig, synth_batch_device
            dcfg = DeviceSynthConfig(nsample=nsample)
            num = args.train_num if split == "train" else args.val_num
            # val uses a FIXED sample set across epochs (the reference's
            # preval split is fixed): comparable early-stopping scores
            base = jax.random.fold_in(
                root_key, epoch if split == "train" else 1_000_000)

            def gen():
                for i in range(max(1, num // args.bs)):
                    wave, _ = synth_batch_device(
                        jax.random.fold_in(base, i), args.bs, dcfg)
                    yield wave
            return gen()
        if real_mix is not None:
            # prob-mixed real corpora (reference run_pretrain.py:118-142);
            # built ONCE — per-epoch only the sampling keys change
            num = (args.train_num if split == "train" else args.val_num) // pc
            base = (args.seed, 0, epoch, pi) if split == "train" \
                else (args.seed, 1, pi)  # fixed val set across epochs

            class _EpochView:
                def __len__(self):
                    return num

                def __getitem__(self, i):
                    # per-index generator: deterministic and thread-safe
                    return real_mix.sample(np.random.default_rng(base + (i,)))

            return batch_iterator(_EpochView(), local_bs, shuffle=False,
                                  num_workers=args.workers)
        if args.synthetic:
            num = args.train_num if split == "train" else args.val_num
            gen = SyntheticPairs(nsample=nsample,
                                 seed=(args.seed + epoch
                                       if split == "train" else 1)
                                 + pi * 7919)
            return gen.batches(local_bs, max(1, num // args.bs))
        data_dir = args.data_dir if split == "train" else (
            args.val_data_dir or args.data_dir)
        from ..data import is_packed
        if is_packed(data_dir):
            # packed shards (cli/pack_data.py): one memmap gather per batch
            # sustains chip rate on a single host core (data/shards.py)
            import itertools
            from ..data import PackedDataset
            pds = PackedDataset(data_dir, load_anno=False)
            num = args.train_num if split == "train" else args.val_num
            it = pds.iter_batches(local_bs, shuffle=split == "train",
                                  seed=args.seed + epoch,
                                  shard_i=pi, shard_n=pc)
            it = itertools.islice(it, max(1, num // args.bs))
            # crop like every other path's Selecting((0, nsample)): packed
            # rows keep their native length
            return (w[:, :nsample] for w in it)
        ds = FixMicSigDataset(data_dir, data_num=args.train_num
                              if split == "train" else args.val_num,
                              transforms=[Selecting((0, nsample))])
        if pc > 1:
            # every host reads its strided shard of the corpus
            from ..parallel import shard_for_process
            ds.data_paths = shard_for_process(ds.data_paths)
        return batch_iterator(ds, local_bs, shuffle=split == "train",
                              seed=args.seed + epoch, num_workers=args.workers)

    from ..data import device_prefetch
    b_shard = b_sh if args.mesh else None

    def prefetched(split, epoch):
        it = make_batches(split, epoch)
        if args.device_synth or resident_waves is not None:
            return it  # already device-resident
        if b_shard is not None and jax.process_count() > 1:
            from ..parallel import host_batch_iterator
            return host_batch_iterator(it, b_shard)
        return device_prefetch(it, size=2, sharding=b_shard)

    for epoch in range(learner.epoch, args.epochs):
        tkey = jax.random.fold_in(root_key, epoch)
        tm = learner.train_epoch(prefetched("train", epoch), tkey)
        vm = learner.eval_epoch(prefetched("val", epoch),
                                jax.random.fold_in(root_key, 10_000 + epoch))
        if args.extra_val_dirs:
            for d in args.extra_val_dirs:
                ds = FixMicSigDataset(d, data_num=args.val_num,
                                      transforms=[Selecting((0, nsample))])
                if pc > 1:
                    from ..parallel import shard_for_process
                    ds.data_paths = shard_for_process(ds.data_paths)
                it = batch_iterator(ds, local_bs, shuffle=False,
                                    num_workers=args.workers)
                if b_shard is not None:
                    # route through the same sharded-batch assembly as the
                    # main loop (mesh/pod safety)
                    from ..parallel import host_batch_iterator
                    it = host_batch_iterator(it, b_shard)
                em = learner.eval_epoch(
                    it, jax.random.fold_in(root_key, 20_000 + epoch),
                    split=f"val_{os.path.basename(d.rstrip('/'))}")
                print(f"  extra val [{os.path.basename(d.rstrip('/'))}]: "
                      f"loss {em['loss']:.5f}")
        learner.end_epoch(vm["loss"])
        print(f"epoch {epoch}: train loss {tm['loss']:.5f} "
              f"val loss {vm['loss']:.5f} diff {vm['diff']:.5f} "
              f"lr {tm['lr']:.2e} {tm['utt_per_sec']:.1f} utt/s")
        if learner.should_stop:
            print("early stopping")
            break

    if args.smoke:
        h = learner.history
        if not h["train_loss"]:  # e.g. --resume with no epochs left to run
            print("SMOKE PASS (no epochs left to run)")
            return 0
        ok = (len(h["train_loss"]) < 2
              or h["train_loss"][-1] < h["train_loss"][0])
        print("SMOKE", "PASS" if ok else "FAIL",
              f"(loss {h['train_loss'][0]:.4f} -> {h['train_loss'][-1]:.4f})")
        return 0 if ok else 1
    return 0


def _pretext_test(args, model, mcfg, feat_cfg, state, nsample):
    """--test: reconstruction metrics + wav/plot dumps on held-out data
    (reference run_pretrain.py:404-483 'all'/'ins' modes)."""
    import jax
    import jax.numpy as jnp

    from ..ops import stft_features, gen_patch_mask
    from ..train import checkpoint as ckpt
    from ..train.pretext_eval import pretext_metrics
    from ..utils.vis import plot_tf_reconstruction
    from ..data import (FixMicSigDataset, SyntheticPairs, Selecting,
                        batch_iterator, write_wav)

    ckpt_dir = os.path.join(args.exp_dir, "checkpoints")
    payload = ckpt.load_checkpoint(ckpt.best_path(ckpt_dir))
    state = ckpt.restore_state(state, payload, restore_opt=False)
    print(f"loaded best checkpoint (epoch {payload['meta']['epoch']})")

    if args.synthetic:
        batches = SyntheticPairs(nsample=nsample, seed=1).batches(
            args.bs, max(1, args.val_num // args.bs))
    else:
        ds = FixMicSigDataset(args.data_dir, data_num=args.val_num,
                              transforms=[Selecting((0, nsample))])
        batches = batch_iterator(ds, args.bs, shuffle=False,
                                 num_workers=args.workers)

    out_dir = os.path.join(args.exp_dir, "test_dumps")
    os.makedirs(out_dir, exist_ok=True)
    mses, mse_masks, pesqs, pesq_mask_chs = [], [], [], []
    key = jax.random.key(123)
    for bi, wave in enumerate(batches):
        key, sub = jax.random.split(key)
        feats = stft_features(jnp.asarray(wave), feat_cfg)
        mask = gen_patch_mask(sub, feats.shape[0], mcfg.npatch,
                              mcfg.effective_nmasked())
        _, _, aux = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, mask, False)
        m = pretext_metrics(aux, mcfg.sig_shape, mcfg.patch_shape,
                            compute_pesq=True)
        mses.append(m["mse"])
        mse_masks.append(m["mse_mask"])
        pesqs.append(m["pesq"])
        pesq_mask_chs.append(m["pesq_mask_ch"])
        if bi == 0:  # per-instance dumps, reference 'ins' mode
            # (run_pretrain.py:462-483: mask/pred/tar/pesq .mat bundles)
            pred_tf, tar_tf = m["pred_tf"], m["tar_tf"]
            plot_tf_reconstruction(pred_tf[0], tar_tf[0], None,
                                   os.path.join(out_dir, "recon_tf.png"))
            write_wav(os.path.join(out_dir, "pred0.wav"),
                      m["sig_pred"][0], 16000)
            write_wav(os.path.join(out_dir, "tar0.wav"),
                      m["sig_tar"][0], 16000)
            try:
                from scipy.io import savemat
                for i in range(min(pred_tf.shape[0], 32)):
                    savemat(os.path.join(out_dir, f"ins_{i}.mat"),
                            {"mask": m["mask_dense"][i],
                             "pred": pred_tf[i], "tar": tar_tf[i],
                             "pesq": m["pesq"][i]})
            except Exception as e:  # .mat is a convenience artifact only
                print("savemat skipped:", e)
    pesq_all = np.concatenate(pesqs)
    pesq_mc = np.concatenate(pesq_mask_chs)
    summary = {"mse": float(np.mean(mses)),
               "mse_mask": float(np.mean(mse_masks)),
               "pesq": float(np.nanmean(pesq_all)),
               "pesq_mask_ch": float(np.nanmean(pesq_mc))}
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        import json
        json.dump(summary, f, indent=2)
    print(f"pretext test: mse {summary['mse']:.6f} "
          f"masked mse {summary['mse_mask']:.6f} "
          f"pesq {summary['pesq']:.3f} "
          f"pesq[masked ch] {summary['pesq_mask_ch']:.3f} "
          f"(dumps in {out_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
