"""Train state: a single donated pytree threaded through the jitted step.

Replaces the reference's Lightning module/optimizer/trainer object state with
a functional pytree (params + BN batch_stats + optimizer state + step) so the
whole update is one XLA program with donated buffers (no per-step host sync).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn: Callable, params: Any, batch_stats: Any,
               tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)

    def apply_gradients(self, grads: Any,
                        new_batch_stats: Optional[Any] = None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def param_count(params: Any) -> int:
    """Trainable-parameter count (reference utils/train_summary.py:335-342)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
