"""Decoder trainer: full-sequence BPTT on complete trials.

Parity target: reference train_bidirectional_model.py:125-191 — RMSprop
lr=1e-4, MSE loss, one optimizer update per trial (full backprop through the
whole bidirectional sequence), dropout 0.5, best checkpoint by validation
loss, per-epoch synthesis of fixed test/train subsets.

TPU design: one jitted update step per (padded) length bucket; optional
batched data parallelism over trials with masked MSE — the reference's
batch-size-1 loop generalizes to [B, T, .] without semantic change because
the loss normalizes per valid element.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoder import BidirectionalSpeechSynthesisModel
from .optim import torch_rmsprop


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
               ) -> jnp.ndarray:
    """Mean squared error over valid elements. pred/target [B, T, F],
    mask [B, T]."""
    se = jnp.square(pred - target) * mask[..., None]
    denom = jnp.maximum(jnp.sum(mask) * pred.shape[-1], 1.0)
    return jnp.sum(se) / denom


class DecoderTrainer:
    def __init__(self, model: BidirectionalSpeechSynthesisModel,
                 learning_rate: float = 1e-4, length_multiple: int = 50):
        self.model = model
        self.length_multiple = length_multiple
        self.optimizer = torch_rmsprop(learning_rate)

    def init(self, key: jax.Array):
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, params, opt_state, x, y, mask, dropout_rng):
        """One full-BPTT update. x [B, T, E], y [B, T, F], mask [B, T]."""

        def loss_fn(p):
            pred, _ = self.model.apply(
                p, x, None, train=True, dropout_rng=dropout_rng, mask=mask
            )
            return masked_mse(pred, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.jit, static_argnames=("self",))
    def evaluate(self, params, x, y, mask) -> jnp.ndarray:
        pred, _ = self.model.apply(params, x, None, mask=mask)
        return masked_mse(pred, y, mask)

    @partial(jax.jit, static_argnames=("self",))
    def predict(self, params, x, mask=None):
        """Inference on [B, T, E] -> [B, T, F] (fresh zero state, matching
        the online unit's per-segment state reset)."""
        pred, _ = self.model.apply(params, x, None, mask=mask)
        return pred

    def pad_trial(self, x: np.ndarray, y: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        T = len(x)
        Tp = -(-T // self.length_multiple) * self.length_multiple
        xp = np.zeros((1, Tp, x.shape[1]), np.float32)
        yp = np.zeros((1, Tp, y.shape[1]), np.float32)
        m = np.zeros((1, Tp), np.float32)
        xp[0, :T] = x
        yp[0, :T] = y
        m[0, :T] = 1.0
        return xp, yp, m
