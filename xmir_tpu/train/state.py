"""Train state: params + batch_stats + optimizer state, pure-pytree.

The reference trains with torch Adam + grad-clip 5.0 (train.py:98-101) and
DDP; here the state is a pytree moved through a jitted/pjitted step function,
with gradients reduced by XLA-inserted collectives when the batch is sharded.
"""
from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def create_train_state(
    model,
    rng,
    example_input,
    tx: optax.GradientTransformation,
    variables: Optional[dict] = None,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    if variables is None:
        variables = jax.jit(
            lambda r, x: model.init(r, x, **(init_kwargs or {"train": True}))
        )(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
