"""Vmapped downstream grid: every (trial, lr) cell as one lane of one program.

The reference runs its downstream lr x bs x trial grid strictly sequentially
(/root/reference/code/run_downstream.py:115-166) — up to 64 separate bs=8
training runs whose tiny matmuls leave the accelerator mostly idle. Here the
independent cells become lanes of a single jax.vmap'ed train step: params,
optimizer moments, BatchNorm stats and the per-cell learning rate all gain a
leading cell axis, so one step multiplies (ncell x bs)-row batches into the
MXU instead of bs-row slivers. Per-cell early stopping and the two-stage
lr/10 drop run on the host; last-5-best full-state ensembling stays ON
DEVICE (a k-epoch ring of stacked params + per-cell window-average
candidates folded when a cell's best improves) so no multi-hundred-MB
param snapshots cross the host link per epoch. Finished cells are frozen
with lr=0 lanes (Adam's update is identically zero there) until every cell
has stopped.

A cell's lane reproduces the sequential run exactly: same init, same data
stream (keyed by trial), same dropout key chain (keyed by trial/epoch) —
pinned by tests/test_grid_vmap.py against DownstreamLearner.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .learner import EarlyStopping, smooth_data
from .steps import downstream_step_body, downstream_eval_body
from ..ops.features import FeatureConfig


def stack_states(states: Sequence):
    """Stack N identical-structure TrainStates along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def slice_state(stacked, i: int):
    return jax.tree.map(lambda x: x[i], stacked)


def make_vmapped_downstream_steps(model, feat_cfg: FeatureConfig,
                                  task: str = "TDOA", trainable_mask=None,
                                  dlabel: int = 1):
    """(train, eval) steps vmapped over the leading cell axis.

    train(states, waves (N,bs,ns,nch), gts (N,bs[,d]), lrs (N,), rngs (N,))
    eval(states, wave (bs,ns,nch), gt (bs[,d])) — one shared eval batch,
    evaluated by every cell."""
    tbody = downstream_step_body(model, feat_cfg, task,
                                 trainable_mask=trainable_mask, dlabel=dlabel)
    ebody = downstream_eval_body(model, feat_cfg, task, dlabel=dlabel)
    # donate the stacked state: without it the old and new states (params +
    # two Adam moments x ncell, f32) coexist across every step and the
    # full-dims 16-cell grid exhausts HBM
    train = jax.jit(jax.vmap(tbody), donate_argnums=(0,))
    evalf = jax.jit(jax.vmap(ebody, in_axes=(0, None, None)))
    return train, evalf


def make_scanned_downstream_steps(model, feat_cfg: FeatureConfig,
                                  task: str = "TDOA", trainable_mask=None,
                                  dlabel: int = 1, lane_slots=None):
    """Block-scanned variants of the vmapped steps: one dispatch runs k
    steps via lax.scan, so per-step tunnel latency, h2d transfer setup and
    the host-side PRNG-split ops (all measured at ~0.1 s/step through the
    axon tunnel — ~2 min of a 2.3-min grid epoch) amortize k-fold.

    train_block(states, rngs, waves (k,S,bs,ns,nch), gts (k,S,bs[,d]),
                lrs (N,)) -> (states, rngs, loss_sums (N,), mae_sums (N,))
    eval_block(states, waves (k,bs,ns,nch), gts (k,bs[,d]))
                -> (loss_sums (N,), mae_sums (N,))

    S is the number of data SLOTS: with lane_slots=None, S == ncell and
    slot i feeds lane i; otherwise lane j reads slot lane_slots[j], so lr
    cells sharing a trial transfer their (identical) data stream once —
    a 4x h2d cut for the reference's 4-lr grid."""
    tbody = downstream_step_body(model, feat_cfg, task,
                                 trainable_mask=trainable_mask, dlabel=dlabel)
    ebody = downstream_eval_body(model, feat_cfg, task, dlabel=dlabel)
    vtrain = jax.vmap(tbody)
    veval = jax.vmap(ebody, in_axes=(0, None, None))
    slots = (None if lane_slots is None
             else jnp.asarray(lane_slots, jnp.int32))

    def train_block(states, rngs, waves, gts, lrs):
        def step(carry, xt):
            st, r = carry
            w, g = xt
            if slots is not None:
                w = jnp.take(w, slots, axis=0)
                g = jnp.take(g, slots, axis=0)
            split = jax.vmap(jax.random.split)(r)
            r2, subs = split[:, 0], split[:, 1]
            st, m = vtrain(st, w, g, lrs, subs)
            return (st, r2), (m["loss"], m["mae"])

        (states, rngs), (losses, maes) = jax.lax.scan(
            step, (states, rngs), (waves, gts))
        return states, rngs, losses.sum(0), maes.sum(0)

    def eval_block(states, waves, gts):
        def step(_, xt):
            w, g = xt
            m = veval(states, w, g)
            return None, (m["loss"], m["mae"])

        _, (losses, maes) = jax.lax.scan(step, None, (waves, gts))
        return losses.sum(0), maes.sum(0)

    def train_block_resident(states, rngs, waves_all, idx, gts, lrs):
        """Like train_block, but the waveforms live on device for the
        whole run (waves_all (ndata, ns, nch)) and the scan consumes only
        (k, S, bs) int32 index batches — per-epoch h2d drops from
        hundreds of MB to KB, which also sidesteps the axon client's
        staging-buffer growth that thrashed >130-epoch runs."""
        def step(carry, xt):
            st, r = carry
            ib, g = xt
            w = jnp.take(waves_all, ib.reshape(-1), axis=0)
            w = w.reshape(ib.shape + waves_all.shape[1:])
            if slots is not None:
                w = jnp.take(w, slots, axis=0)
                g = jnp.take(g, slots, axis=0)
            split = jax.vmap(jax.random.split)(r)
            r2, subs = split[:, 0], split[:, 1]
            st, m = vtrain(st, w, g, lrs, subs)
            return (st, r2), (m["loss"], m["mae"])

        (states, rngs), (losses, maes) = jax.lax.scan(
            step, (states, rngs), (idx, gts))
        return states, rngs, losses.sum(0), maes.sum(0)

    return (jax.jit(train_block, donate_argnums=(0,)),
            jax.jit(eval_block),
            jax.jit(train_block_resident, donate_argnums=(0,)))


def _blocks(batches: Iterable, k: int):
    """Group a stream of per-step (waves, gts) into (k',*) step-axis stacks
    (k' == k except possibly the last block). Each distinct k' compiles its
    own scan program — callers pick step counts divisible by k."""
    buf = []
    for item in batches:
        buf.append(item)
        if len(buf) == k:
            yield (np.stack([w for w, _ in buf]),
                   np.stack([g for _, g in buf]))
            buf = []
    if buf:
        yield (np.stack([w for w, _ in buf]),
               np.stack([g for _, g in buf]))


@dataclass
class _Cell:
    lr: float
    trial: int
    name: str
    patience: int
    lr_drops: int = 0
    done: bool = False
    val_raw: List[float] = field(default_factory=list)
    best_epochs: List[int] = field(default_factory=list)
    epochs_run: int = 0
    stopper: EarlyStopping = None

    def __post_init__(self):
        self.stopper = EarlyStopping(self.patience)


class VmappedGridRunner:
    """Drives the stacked cells through the DownstreamLearner life cycle."""

    def __init__(self, model, feat_cfg: FeatureConfig, init_states: Sequence,
                 cells: Sequence[Tuple[int, float]], task: str = "TDOA",
                 dlabel: int = 1, trainable_mask=None, patience: int = 10,
                 smooth_alpha: float = 0.6, ensemble_k: int = 5,
                 scan_block: int = 25, lane_slots=None):
        self.scan_block = scan_block
        self.lane_slots = lane_slots
        (self.train_block, self.eval_block,
         self.train_block_resident) = make_scanned_downstream_steps(
            model, feat_cfg, task, trainable_mask, dlabel,
            lane_slots=lane_slots)
        self.resident_waves = None
        self.states = stack_states(list(init_states))
        self.cells = [
            _Cell(lr=lr, trial=t, name=f"trial{t}_lr{lr:g}",
                  patience=patience) for t, lr in cells]
        self.smooth_alpha = smooth_alpha
        self.k = ensemble_k
        self.epoch = 0
        # DEVICE-side ensembling (no per-epoch host transfers, which would
        # ship ~0.8 GB/epoch of stacked params through the TPU tunnel):
        # a ring of the last k epochs' stacked (params, batch_stats), plus
        # per-cell window-average "candidates". A cell's best can only
        # improve at the CURRENT epoch, so its reference window
        # [best-k+1 .. best] is exactly the ring at that moment — fold the
        # average into the candidate lane right then and discard nothing.
        from collections import deque
        self._ring = deque(maxlen=ensemble_k)
        self._cand_p = jax.tree.map(jnp.zeros_like, self.states.params)
        self._cand_b = jax.tree.map(jnp.zeros_like, self.states.batch_stats)
        # single-dispatch end-of-epoch device ops (per-leaf eager tree_maps
        # would issue hundreds of tiny tunnel dispatches per epoch)
        self._snap = jax.jit(lambda p, b: (jax.tree.map(jnp.copy, p),
                                           jax.tree.map(jnp.copy, b)))

        def _fold_masked(cand_p, cand_b, mask, weights, *ring):
            """cand[lane] <- weighted sum over k ring snapshots of that
            lane where mask[lane], else unchanged — every lane in ONE
            program. ring is always 2k trees (k params + k batch_stats),
            padded by the caller, so exactly one variant compiles;
            weights carries 1/n_valid for live snapshots, 0 for padding."""
            ps, bs = ring[:ensemble_k], ring[ensemble_k:]

            def fold(cand, *snaps):
                win = sum(w * s for w, s in zip(weights, snaps))
                m = mask.reshape((-1,) + (1,) * (cand.ndim - 1))
                return jnp.where(m, win.astype(cand.dtype), cand)

            return (jax.tree.map(lambda c, *s: fold(c, *s), cand_p, *ps),
                    jax.tree.map(lambda c, *s: fold(c, *s), cand_b, *bs))

        self._fold_masked = jax.jit(_fold_masked)

    @property
    def ncell(self) -> int:
        return len(self.cells)

    @property
    def all_done(self) -> bool:
        return all(c.done for c in self.cells)

    def _lrs(self) -> jnp.ndarray:
        return jnp.asarray([0.0 if c.done else c.lr for c in self.cells],
                           jnp.float32)

    def train_epoch(self, stacked_batches: Iterable,
                    epoch_rngs: Sequence) -> Dict[str, np.ndarray]:
        """stacked_batches yields per-step (waves (S,bs,ns,nch),
        gts (S,bs[,d])) where S = ncell (lane_slots=None) or the slot
        count; epoch_rngs: one base PRNG key per cell (the sequential
        learner's per-epoch tkey), split once per step like
        learner.train_epoch — the split now runs inside the scanned
        program, same key chain."""
        rngs = jnp.stack(list(epoch_rngs))
        lrs = self._lrs()
        losses, maes, n = [], [], 0
        for waves, gts in _blocks(stacked_batches, self.scan_block):
            self.states, rngs, ls, ms = self.train_block(
                self.states, rngs, waves, gts, lrs)
            losses.append(ls)
            maes.append(ms)
            n += waves.shape[0]
        loss = np.sum([np.asarray(x) for x in losses], axis=0) / max(n, 1)
        mae = np.sum([np.asarray(x) for x in maes], axis=0) / max(n, 1)
        return {"loss": loss, "mae": mae}

    def stage_train_waves(self, waves_all) -> None:
        """device_put the whole train split once (accepts an already
        device-resident array so chunks can share one staging);
        train_epoch_resident then consumes only index batches."""
        self.resident_waves = (
            waves_all if isinstance(waves_all, jax.Array)
            else jax.device_put(np.asarray(waves_all, np.float32)))

    def train_epoch_resident(self, idx_batches: Iterable,
                             epoch_rngs: Sequence) -> Dict[str, np.ndarray]:
        """idx_batches yields per-step (idx (S,bs) int32, gts (S,bs[,d]));
        rows gather from the staged split on device. Same key chain and
        metrics as train_epoch."""
        assert self.resident_waves is not None, "call stage_train_waves"
        rngs = jnp.stack(list(epoch_rngs))
        lrs = self._lrs()
        losses, maes, n = [], [], 0
        for idx, gts in _blocks(idx_batches, self.scan_block):
            self.states, rngs, ls, ms = self.train_block_resident(
                self.states, rngs, self.resident_waves,
                idx.astype(np.int32), gts, lrs)
            losses.append(ls)
            maes.append(ms)
            n += idx.shape[0]
        loss = np.sum([np.asarray(x) for x in losses], axis=0) / max(n, 1)
        mae = np.sum([np.asarray(x) for x in maes], axis=0) / max(n, 1)
        return {"loss": loss, "mae": mae}

    def eval_epoch(self, batches: Iterable) -> Dict[str, np.ndarray]:
        # scanned blocks: one dispatch + one h2d per k shared batches, one
        # host fetch per epoch (per-batch np.asarray would sync every step
        # and stall async dispatch)
        losses, maes, n = [], [], 0
        for waves, gts in _blocks(batches, self.scan_block):
            ls, ms = self.eval_block(self.states, waves, gts)
            losses.append(ls)
            maes.append(ms)
            n += waves.shape[0]
        tot_loss = np.sum([np.asarray(x) for x in losses], axis=0)
        tot_mae = np.sum([np.asarray(x) for x in maes], axis=0)
        return {"loss": tot_loss / max(n, 1), "mae": tot_mae / max(n, 1)}

    def stage_eval_blocks(self, batches: Iterable):
        """device_put a fixed eval stream once; reuse every epoch. The val
        set never changes across epochs, so re-transferring it (~133 MB at
        70-120 MB/s tunnel h2d per epoch, ~40% of a late grid epoch) is
        pure waste."""
        return [(jax.device_put(w), jax.device_put(g))
                for w, g in _blocks(batches, self.scan_block)]

    def eval_epoch_staged(self, staged) -> Dict[str, np.ndarray]:
        losses, maes, n = [], [], 0
        for waves, gts in staged:
            ls, ms = self.eval_block(self.states, waves, gts)
            losses.append(ls)
            maes.append(ms)
            n += waves.shape[0]
        tot_loss = np.sum([np.asarray(x) for x in losses], axis=0)
        tot_mae = np.sum([np.asarray(x) for x in maes], axis=0)
        return {"loss": tot_loss / max(n, 1), "mae": tot_mae / max(n, 1)}

    def end_epoch(self, val_maes: np.ndarray) -> bool:
        """Per-cell smoothed early stopping + lr/10 + on-device ensemble
        bookkeeping. Returns True when every cell has stopped."""
        # ring entries must be COPIES: the next train step DONATES the
        # live state's buffers, which would invalidate aliased snapshots.
        # One jitted dispatch (per-leaf eager jnp.copy would be ~2 x nleaf
        # tunnel dispatches per epoch).
        self._ring.append(self._snap(self.states.params,
                                     self.states.batch_stats))
        improved = np.zeros((self.ncell,), bool)
        for i, c in enumerate(self.cells):
            if c.done:
                continue
            c.val_raw.append(float(val_maes[i]))
            smoothed = smooth_data(c.val_raw, self.smooth_alpha)[-1]
            if c.stopper.update(-smoothed):
                c.best_epochs.append(self.epoch)
                improved[i] = True
            c.epochs_run = self.epoch + 1
            if c.stopper.stopped:
                if c.lr_drops == 0:
                    c.lr /= 10.0
                    c.lr_drops = 1
                    c.stopper.reset_counter()
                else:
                    c.done = True
        if improved.any():
            # every improving cell's reference window [best-k+1 .. best]
            # is the ring right now — fold them all in one dispatch,
            # padded to k entries (weight 0) so one program serves every
            # ring fill level
            ring = list(self._ring)
            entries = ring + [ring[-1]] * (self.k - len(ring))
            w = np.zeros((self.k,), np.float32)
            w[: len(ring)] = 1.0 / len(ring)
            self._cand_p, self._cand_b = self._fold_masked(
                self._cand_p, self._cand_b, jnp.asarray(improved),
                jnp.asarray(w),
                *[p for p, _ in entries], *[b for _, b in entries])
        self.epoch += 1
        return self.all_done

    def finalize(self) -> None:
        for c in self.cells:
            c.done = True

    def ensembled_states(self):
        """Install each cell's window-averaged params AND batch stats (like
        DownstreamLearner.ensemble) into the stacked state. Candidates were
        folded on device at each cell's best epochs — the final fold is the
        window ending at the final best, the reference's
        [best-k+1 .. best]."""
        self.finalize()
        # A lane that never improved (e.g. diverged to NaN val MAE from
        # epoch 0) has no folded candidate — fall back to its live final
        # state instead of poisoning the healthy lanes' results (the
        # sequential learner's `best = ... else current epoch` fallback).
        has_best = np.array([bool(c.best_epochs) for c in self.cells])
        # misuse (end_epoch never called) stays loud; a chunk whose every
        # lane diverged to NaN from epoch 0 legitimately has no bests and
        # must still produce (live-state) results, not crash the grid
        assert self.epoch > 0, "end_epoch was never called (epochs=0?)"
        if has_best.all():
            cand_p, cand_b = self._cand_p, self._cand_b
        else:
            # ONE jitted program: per-leaf eager tree_maps would issue
            # hundreds of tiny tunnel dispatches (see _snap/_fold_masked)
            @jax.jit
            def sel_tree(m, cand, live):
                return jax.tree.map(
                    lambda c, lv: jnp.where(
                        m.reshape((-1,) + (1,) * (c.ndim - 1)), c, lv),
                    cand, live)
            m = jnp.asarray(has_best)
            cand_p = sel_tree(m, self._cand_p, self.states.params)
            cand_b = sel_tree(m, self._cand_b, self.states.batch_stats)
        self.states = self.states.replace(params=cand_p,
                                          batch_stats=cand_b)
        return self.states
