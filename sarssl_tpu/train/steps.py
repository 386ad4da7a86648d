"""Jitted train/eval steps.

One step = STFT features -> mask sampling -> forward -> loss -> grads ->
optimizer update, all fused under a single ``jax.jit``. This replaces the
reference hot loop (learner.py:76-131 calling model.py:519-601) where
preprocessing, masking and the gather loss each made separate passes with
host-side Python loops.

The raw waveform batch is the step input; everything else happens on device.
Steps take ``lr`` as a traced scalar so per-epoch schedules don't recompile.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.features import FeatureConfig, stft_features
from ..ops.mask import gen_patch_mask


def pretrain_step_body(model, feat_cfg: FeatureConfig, mask_mode: str = "T",
                       trainable_mask=None):
    """Un-jitted step body (reused by parallel.steps with shardings).

    trainable_mask: optional bool pytree; False leaves get zero updates
    (frozen-encoder pretext stage, reference run_pretrain.py:315-402)."""
    cfg = model.cfg
    nmasked = cfg.effective_nmasked()

    def step(state, wave_batch, lr, rng):
        """wave_batch: (nb, nsample, nch) float32. Returns (state, metrics)."""
        feats = stft_features(wave_batch, feat_cfg)  # (nb', 2, nf, nt, 2)
        nb = feats.shape[0]
        rng_mask, rng_drop = jax.random.split(rng)
        mask = gen_patch_mask(rng_mask, nb, cfg.npatch, nmasked,
                              nmic=2, mode=mask_mode)

        def loss_fn(params):
            (loss, diff, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, mask, True,
                rngs={"dropout": rng_drop}, mutable=["batch_stats"],
            )
            return loss, (diff, mut)

        (loss, (diff, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable_mask)
        new_state = state.apply_gradients(grads, lr=lr).replace(
            batch_stats=mut["batch_stats"])
        if trainable_mask is not None:
            # restore frozen leaves outright: zeroed grads alone would still
            # let decoupled weight decay (adamw) move them
            new_state = new_state.replace(params=jax.tree.map(
                lambda n, o, m: n if m else o,
                new_state.params, state.params, trainable_mask))
        return new_state, {"loss": loss, "diff": diff}

    return step


def make_pretrain_step(model, feat_cfg: FeatureConfig, mask_mode: str = "T",
                       donate: bool = True, trainable_mask=None):
    return jax.jit(pretrain_step_body(model, feat_cfg, mask_mode,
                                      trainable_mask),
                   donate_argnums=(0,) if donate else ())


def pretrain_eval_body(model, feat_cfg: FeatureConfig, mask_mode: str = "T"):
    """Un-jitted eval body (reused by parallel.steps with shardings)."""
    cfg = model.cfg
    nmasked = cfg.effective_nmasked()

    def step(state, wave_batch, rng):
        feats = stft_features(wave_batch, feat_cfg)
        nb = feats.shape[0]
        mask = gen_patch_mask(rng, nb, cfg.npatch, nmasked, nmic=2, mode=mask_mode)
        loss, diff, aux = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, mask, False)
        return {"loss": loss, "diff": diff}

    return step


def make_pretrain_eval_step(model, feat_cfg: FeatureConfig, mask_mode: str = "T"):
    return jax.jit(pretrain_eval_body(model, feat_cfg, mask_mode))


def _target_transform(task: str, gt, dlabel: int = 1):
    """Reference get_tar_batch semantics (learner.py:620-631; v1 extras at
    code_v1/learner.py:724-762): TDOA in samples (x fs); SUR/VOL in log10;
    DRR/T60/C50/C80/ABS/SNR/DOA identity. dlabel > 1 keeps vector targets
    (multi-pair TDOA heads, reference model.py:793-821)."""
    gt = gt.reshape(gt.shape[0], -1)[:, :dlabel]
    if task == "TDOA":
        return gt * 16000.0
    if task in ("SUR", "VOL"):
        return jnp.log10(gt)
    return gt


def downstream_step_body(model, feat_cfg: FeatureConfig, task: str = "TDOA",
                         trainable_mask=None, dlabel: int = 1):
    """Un-jitted step body. trainable_mask: optional pytree of bools matching
    params; False leaves get zero updates (lineareval freezing, reference
    learner.py:427-446)."""

    def step(state, wave_batch, gt_batch, lr, rng):
        feats = stft_features(wave_batch, feat_cfg)
        tar = _target_transform(task, gt_batch, dlabel)

        def loss_fn(params):
            (pred, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, None, True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            loss = jnp.mean((pred - jax.lax.stop_gradient(tar)) ** 2)
            return loss, (pred, mut)

        (loss, (pred, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable_mask)
        new_state = state.apply_gradients(grads, lr=lr).replace(
            batch_stats=mut["batch_stats"])
        if trainable_mask is not None:
            # restore frozen leaves outright (see pretrain step note)
            new_state = new_state.replace(params=jax.tree.map(
                lambda n, o, m: n if m else o,
                new_state.params, state.params, trainable_mask))
        mae = jnp.mean(jnp.abs(pred - tar))
        return new_state, {"loss": loss, "mae": mae}

    return step


def make_downstream_step(model, feat_cfg: FeatureConfig, task: str = "TDOA",
                         donate: bool = True, trainable_mask=None,
                         dlabel: int = 1):
    return jax.jit(downstream_step_body(model, feat_cfg, task, trainable_mask,
                                        dlabel),
                   donate_argnums=(0,) if donate else ())


def downstream_eval_body(model, feat_cfg: FeatureConfig, task: str = "TDOA",
                         dlabel: int = 1):
    """Un-jitted eval body (reused by parallel.steps with shardings)."""

    def step(state, wave_batch, gt_batch):
        feats = stft_features(wave_batch, feat_cfg)
        tar = _target_transform(task, gt_batch, dlabel)
        pred, embed = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, None, False)
        out = {"loss": jnp.mean((pred - tar) ** 2),
               "mae": jnp.mean(jnp.abs(pred - tar)),
               "pred": pred, "embed": embed}
        if dlabel > 1:  # per-pair MAEs for multi-pair heads
            out["mae_dims"] = jnp.mean(jnp.abs(pred - tar), axis=0)
        return out

    return step


def make_downstream_eval_step(model, feat_cfg: FeatureConfig, task: str = "TDOA",
                              dlabel: int = 1):
    return jax.jit(downstream_eval_body(model, feat_cfg, task, dlabel))
