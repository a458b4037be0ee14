"""Optimizers matching the reference's torch training semantics.

The reference trains both models with ``torch.optim.RMSprop(lr=1e-4)``
(train_unidirectional_vad.py:124, train_bidirectional_model.py:104).  Torch's
RMSprop adds eps OUTSIDE the square root (update = g / (sqrt(avg) + eps)),
which differs from optax's default; this custom transform matches torch's
formula exactly so training trajectories are comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def torch_rmsprop(learning_rate: float, alpha: float = 0.99,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.RMSprop (no momentum, not centered):

    sq = alpha * sq + (1 - alpha) * g^2 ;  p -= lr * g / (sqrt(sq) + eps)
    """

    def init_fn(params):
        return {"sq": jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        del params
        sq = jax.tree.map(
            lambda s, g: alpha * s + (1.0 - alpha) * jnp.square(g),
            state["sq"], updates,
        )
        new_updates = jax.tree.map(
            lambda g, s: -learning_rate * g / (jnp.sqrt(s) + eps),
            updates, sq,
        )
        return new_updates, {"sq": sq}

    return optax.GradientTransformation(init_fn, update_fn)
