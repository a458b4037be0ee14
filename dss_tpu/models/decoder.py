"""Bidirectional speech-synthesis decoding model.

Parity target: reference local/models.py:36-58 — 2-layer bidirectional LSTM
(deployed config: 100 hidden) followed by a Linear(2H -> 20) regressor
producing LPCNet-style acoustic features for a complete speech segment.
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


class BidirectionalSpeechSynthesisModel:
    """Functional model: parameters are an explicit pytree (see vad.py)."""

    def __init__(self, nb_layer: int = 2, nb_hidden_units: int = 100,
                 nb_electrodes: int = 128, dropout: float = 0.0,
                 nb_outputs: int = 20):
        self.nb_layer = nb_layer
        self.nb_hidden_units = nb_hidden_units
        self.nb_electrodes = nb_electrodes
        self.dropout = dropout
        self.nb_outputs = nb_outputs

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return {
            "lstm": lstm_init(k1, self.nb_electrodes, self.nb_hidden_units,
                              self.nb_layer, bidirectional=True),
            "regressor": linear_init(k2, 2 * self.nb_hidden_units,
                                     self.nb_outputs),
        }

    def create_new_initial_state(self, batch_size: int, dtype=jnp.float32
                                 ) -> LstmState:
        return zeros_state(self.nb_layer, 2, batch_size,
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
        """x: [B, T, E] -> (features [B, T, nb_outputs], new state)."""
        if state is None:
            state = self.create_new_initial_state(x.shape[0], x.dtype)
        y, new_state = lstm_apply(params["lstm"], x, state,
                                  dropout=self.dropout if train else 0.0,
                                  dropout_rng=dropout_rng, train=train,
                                  mask=mask)
        return linear_apply(params["regressor"], y), new_state

    def __call__(self, params, x, state=None, **kw):
        return self.apply(params, x, state, **kw)
