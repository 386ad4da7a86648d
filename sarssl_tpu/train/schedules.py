"""Learning-rate schedules.

Same semantics as reference ``create_learning_rate_schedule``
(/root/reference/code/common/utils.py:108-139): warmup ramp multiplied onto a
cosine/linear decay over *epochs* (the reference feeds the epoch index and
re-creates the optimizer each epoch with the scheduled value).
"""
from __future__ import annotations

import numpy as np


def _progress(step, total_steps, warmup_steps):
    p = (step - warmup_steps) / float(max(total_steps - warmup_steps, 1))
    return float(np.clip(p, 0.0, 1.0))


def cosine_schedule(total_steps: int, base: float, warmup_steps: int = 0,
                    linear_end: float = 1e-5):
    def fn(step):
        lr = base * 0.5 * (1.0 + np.cos(np.pi * _progress(step, total_steps, warmup_steps)))
        if warmup_steps:
            lr *= min(1.0, step / warmup_steps)
        return float(lr)
    return fn


def linear_schedule(total_steps: int, base: float, warmup_steps: int = 0,
                    linear_end: float = 1e-5):
    def fn(step):
        p = _progress(step, total_steps, warmup_steps)
        lr = linear_end + (base - linear_end) * (1.0 - p)
        if warmup_steps:
            lr *= min(1.0, step / warmup_steps)
        return float(lr)
    return fn


def exp_decay(lr_init: float, step_size: float, gamma: float):
    """lr = lr_init * gamma^(epoch/step_size) (reference utils.py:100-104)."""
    def fn(epoch):
        return float(lr_init * gamma ** (epoch / step_size))
    return fn
