"""Train state: params + batch_stats + optimizer state in one pytree.

Replaces the reference Learner's scattered model/optimizer/scaler attributes
(/root/reference/code/learner.py:13-131) with a single functional state that
jitted steps thread through. The learning rate is a runtime input (the
reference re-creates Adam with a per-epoch lr, learner.py:83), implemented
here with ``optax.inject_hyperparams`` so changing lr does NOT recompile.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr=None):
        opt_state = self.opt_state
        if lr is not None:
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": jnp.asarray(lr)}
            )
        updates, new_opt_state = self.tx.update(grads, opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def reset_optimizer(self):
        """Fresh optimizer moments (parity with reference learner.py:83,
        which constructs a new Adam every epoch)."""
        return self.replace(opt_state=self.tx.init(self.params))


def make_adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
              weight_decay: float = 0.0, grad_clip: Optional[float] = None):
    """Adam(W) with injectable learning rate (no recompile on lr change)."""
    def _make(learning_rate):
        chain = []
        if grad_clip:
            chain.append(optax.clip_by_global_norm(grad_clip))
        if weight_decay:
            chain.append(optax.adamw(learning_rate, b1=b1, b2=b2,
                                     weight_decay=weight_decay))
        else:
            chain.append(optax.adam(learning_rate, b1=b1, b2=b2))
        return optax.chain(*chain)
    return optax.inject_hyperparams(_make)(learning_rate=lr)


def create_train_state(model, rng, example_input, example_mask=None,
                       tx: Optional[optax.GradientTransformation] = None,
                       lr: float = 1e-3) -> TrainState:
    if tx is None:
        tx = make_adam(lr)
    variables = model.init({"params": rng}, example_input, example_mask, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)
