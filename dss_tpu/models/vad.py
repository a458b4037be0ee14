"""Unidirectional neural voice-activity detector.

Parity target: reference local/models.py:11-33 — 2-layer unidirectional LSTM
(deployed config: 150 hidden, 64 inputs; library defaults 512/128) followed
by a Linear(H -> 2) classifier, with an explicit carried (h, c) state API for
streaming inference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .lstm import (
    LstmState,
    linear_apply,
    linear_init,
    lstm_apply,
    lstm_init,
    zeros_state,
)


class UnidirectionalVoiceActivityDetector:
    """Functional model: hyperparameters live on the object, parameters are
    an explicit pytree passed to ``apply`` (jit/grad/vmap-friendly)."""

    def __init__(self, nb_layer: int = 2, nb_hidden_units: int = 512,
                 nb_electrodes: int = 128, dropout: float = 0.0):
        self.nb_layer = nb_layer
        self.nb_hidden_units = nb_hidden_units
        self.nb_electrodes = nb_electrodes
        self.dropout = dropout

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return {
            "lstm": lstm_init(k1, self.nb_electrodes, self.nb_hidden_units,
                              self.nb_layer, bidirectional=False),
            "classifier": linear_init(k2, self.nb_hidden_units, 2),
        }

    def create_new_initial_state(self, batch_size: int, dtype=jnp.float32
                                 ) -> LstmState:
        return zeros_state(self.nb_layer, 1, batch_size,
                           self.nb_hidden_units, dtype)

    def apply(
        self,
        params,
        x: jnp.ndarray,
        state: Optional[LstmState] = None,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, LstmState]:
        """x: [B, T, E] -> (logits [B, T, 2], new state)."""
        if state is None:
            state = self.create_new_initial_state(x.shape[0], x.dtype)
        y, new_state = lstm_apply(params["lstm"], x, state,
                                  dropout=self.dropout if train else 0.0,
                                  dropout_rng=dropout_rng, train=train,
                                  mask=mask)
        return linear_apply(params["classifier"], y), new_state

    def __call__(self, params, x, state=None, **kw):
        return self.apply(params, x, state, **kw)
