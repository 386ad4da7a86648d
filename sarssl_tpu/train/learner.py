"""High-level training drivers: epoch loops, early stopping, ensembling.

Functional equivalent of the reference ``Learner``/``STFTLearner`` runtime
(/root/reference/code/learner.py:13-486): per-epoch train/val loops with an
externally scheduled learning rate, optional fresh-optimizer-per-epoch parity
mode (learner.py:83), score smoothing (learner.py:271-281), early stopping
(learner.py:283-300), checkpoint management and uniform ensembling.

Device semantics: batches are host numpy arrays; each step ships one batch to
HBM and runs a single fused jitted step. Multi-device data parallelism comes
from `sarssl_tpu.parallel` shardings on the same step functions.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from . import checkpoint as ckpt
from ..utils.logging import MetricLogger


def smooth_data(values: List[float], alpha: float = 0.6) -> List[float]:
    """EMA smoothing used on validation metrics (reference learner.py:271-281)."""
    out = []
    s = values[0] if values else 0.0
    for i, v in enumerate(values):
        s = v if i == 0 else alpha * s + (1 - alpha) * v
        out.append(s)
    return out


@dataclass
class EarlyStopping:
    """Max-score early stopping (reference learner.py:283-300)."""

    patience: int = 10
    best: float = -np.inf
    counter: int = 0
    stopped: bool = False

    def update(self, score: float) -> bool:
        """Returns True if this score is a new best (ties count as best,
        reference learner.py:287)."""
        if score >= self.best:
            self.best = score
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.stopped = True
        return False

    def reset_counter(self):
        self.counter = 0
        self.stopped = False


@dataclass
class PretrainLearner:
    """Pretext-task epoch driver."""

    state: object
    train_step: Callable
    eval_step: Callable
    lr_schedule: Callable[[int], float]
    ckpt_dir: Optional[str] = None
    patience: int = 100
    fresh_opt_each_epoch: bool = False  # parity with reference learner.py:83
    logger: Optional[MetricLogger] = None
    stopper: EarlyStopping = field(default_factory=lambda: EarlyStopping(100))

    def __post_init__(self):
        self.stopper.patience = self.patience
        self.epoch = 0
        self.history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}

    def train_epoch(self, batches: Iterable[np.ndarray], rng) -> Dict[str, float]:
        if self.fresh_opt_each_epoch:
            self.state = self.state.reset_optimizer()
        lr = self.lr_schedule(self.epoch)
        losses, diffs, n, t0 = [], [], 0, time.time()
        nutt = 0
        for wave in batches:
            rng, sub = jax.random.split(rng)
            self.state, m = self.train_step(self.state, wave, lr, sub)
            # keep metrics on device: a float() here would sync every step
            # and stall the async dispatch pipeline
            losses.append(m["loss"])
            diffs.append(m["diff"])
            n += 1
            nutt += wave.shape[0]
        tot = float(np.sum([float(x) for x in losses]))
        tot_diff = float(np.sum([float(x) for x in diffs]))
        dt = time.time() - t0
        metrics = {"loss": tot / max(n, 1), "diff": tot_diff / max(n, 1),
                   "lr": lr, "utt_per_sec": nutt / max(dt, 1e-9)}
        self.history["train_loss"].append(metrics["loss"])
        if self.logger:
            self.logger.log("train", self.epoch, metrics)
        return metrics

    def eval_epoch(self, batches: Iterable[np.ndarray], rng,
                   split: str = "val") -> Dict[str, float]:
        tot, tot_diff, n = 0.0, 0.0, 0
        for wave in batches:
            rng, sub = jax.random.split(rng)
            m = self.eval_step(self.state, wave, sub)
            tot += float(m["loss"])
            tot_diff += float(m["diff"])
            n += 1
        metrics = {"loss": tot / max(n, 1), "diff": tot_diff / max(n, 1)}
        if split == "val":
            self.history["val_loss"].append(metrics["loss"])
        if self.logger:
            self.logger.log(split, self.epoch, metrics)
        return metrics

    def end_epoch(self, val_loss: float) -> bool:
        """Checkpoint + early stopping; returns True on new best."""
        is_best = self.stopper.update(-val_loss)
        if self.ckpt_dir:
            ckpt.save_checkpoint(self.ckpt_dir, self.state, self.epoch,
                                 self.stopper.best, is_best=is_best)
        self.epoch += 1
        return is_best

    @property
    def should_stop(self) -> bool:
        return self.stopper.stopped


@dataclass
class DownstreamLearner:
    """Fine-tune/lineareval driver with smoothed-val early stopping and the
    reference's two-stage lr/10 schedule (run_downstream.py:287-316)."""

    state: object
    train_step: Callable
    eval_step: Callable
    lr_init: float
    ckpt_dir: Optional[str] = None
    patience: int = 10
    smooth_alpha: float = 0.6
    logger: Optional[MetricLogger] = None

    def __post_init__(self):
        self.epoch = 0
        self.lr = self.lr_init
        self.lr_drops = 0
        self.stopper = EarlyStopping(self.patience)
        self.val_raw: List[float] = []
        self.best_epochs: List[int] = []

    def train_epoch(self, batches, rng) -> Dict[str, float]:
        losses, maes, n = [], [], 0
        for wave, gt in batches:
            rng, sub = jax.random.split(rng)
            self.state, m = self.train_step(self.state, wave, gt, self.lr, sub)
            losses.append(m["loss"]); maes.append(m["mae"]); n += 1
        tot = float(np.sum([float(x) for x in losses]))
        tot_mae = float(np.sum([float(x) for x in maes]))
        metrics = {"loss": tot / max(n, 1), "mae": tot_mae / max(n, 1), "lr": self.lr}
        if self.logger:
            self.logger.log("train", self.epoch, metrics)
        return metrics

    def eval_epoch(self, batches, split="val") -> Dict[str, float]:
        tot, tot_mae, n = 0.0, 0.0, 0
        tot_dims = None
        for wave, gt in batches:
            m = self.eval_step(self.state, wave, gt)
            tot += float(m["loss"]); tot_mae += float(m["mae"]); n += 1
            if "mae_dims" in m:
                d = np.asarray(m["mae_dims"], np.float64)
                tot_dims = d if tot_dims is None else tot_dims + d
        metrics = {"loss": tot / max(n, 1), "mae": tot_mae / max(n, 1)}
        if tot_dims is not None:
            for k, v in enumerate(tot_dims / max(n, 1)):
                metrics[f"mae_pair{k}"] = float(v)
        if self.logger:
            self.logger.log(split, self.epoch, metrics)
        return metrics

    def end_epoch(self, val_metric: float) -> bool:
        """Smoothed early stopping; on first stop lr/=10, on second stop for
        real. Returns True when training should halt."""
        self.val_raw.append(val_metric)
        smoothed = smooth_data(self.val_raw, self.smooth_alpha)[-1]
        is_best = self.stopper.update(-smoothed)
        if is_best:
            self.best_epochs.append(self.epoch)
        if self.ckpt_dir:
            ckpt.save_checkpoint(self.ckpt_dir, self.state, self.epoch,
                                 self.stopper.best, is_best=is_best)
        self.epoch += 1
        if self.stopper.stopped:
            if self.lr_drops == 0:
                self.lr /= 10.0
                self.lr_drops = 1
                self.stopper.reset_counter()
                return False
            return True
        return False

    def ensemble(self, k: int = 5):
        """Uniform-average the last k best-epoch checkpoints over the FULL
        model state — params and BatchNorm running stats alike, like the
        reference's whole-state-dict average (learner.py:302-331). Returns
        ensembled params and installs the averaged batch_stats on
        ``self.state``."""
        assert self.ckpt_dir, "ensembling needs a checkpoint dir"
        import os

        from flax import serialization

        # CONSECUTIVE epochs ending at the best one (reference
        # run_downstream.py:321-324: [max(1, best-k+1) .. best]), not the
        # sparse set of improving epochs
        best = self.best_epochs[-1] if self.best_epochs else self.epoch - 1
        epochs = [e for e in range(max(0, best - k + 1), best + 1)
                  if os.path.exists(ckpt.epoch_path(self.ckpt_dir, e))]
        plist, blist = [], []
        for e in epochs:
            payload = ckpt.load_checkpoint(ckpt.epoch_path(self.ckpt_dir, e))
            plist.append(serialization.from_state_dict(
                jax.device_get(self.state.params), payload["params"]))
            blist.append(serialization.from_state_dict(
                jax.device_get(self.state.batch_stats),
                payload["batch_stats"]))
        if not plist:
            return self.state.params
        avg = ckpt.ensemble_params(plist)
        avg_bs = ckpt.ensemble_params(blist)
        self.state = self.state.replace(batch_stats=avg_bs)
        ckpt.save_named(self.ckpt_dir,
                        self.state.replace(params=avg, batch_stats=avg_bs),
                        "ensemble_model", epoch=-1,
                        max_score=self.stopper.best)
        return avg


def mae_without_training(train_targets: np.ndarray,
                         test_targets: np.ndarray) -> Dict[str, float]:
    """Predict-the-train-mean MAE baseline (reference ``mae_wotrain``,
    learner.py:655-686): the floor any learned model must beat."""
    train_targets = np.asarray(train_targets, np.float64).ravel()
    test_targets = np.asarray(test_targets, np.float64).ravel()
    mean = float(train_targets.mean())
    return {
        "mean": mean,
        "mae_train": float(np.mean(np.abs(train_targets - mean))),
        "mae_test": float(np.mean(np.abs(test_targets - mean))),
        "min_train": float(train_targets.min()),
        "max_train": float(train_targets.max()),
        "min_test": float(test_targets.min()),
        "max_test": float(test_targets.max()),
    }
