"""nVAD trainer: truncated backpropagation through time, fully on device.

Parity target: reference train_unidirectional_vad.py:135-222 — RMSprop
lr=1e-4, CrossEntropy loss, TBPTT with k1=k2=50 (one optimizer update per
50-frame chunk, LSTM state carried and detached between chunks), dropout 0.5,
best checkpoint by validation accuracy.

TPU design: a whole trial's TBPTT is ONE compiled program — ``lax.scan`` over
50-frame chunks whose body computes the chunk gradient and applies the
optimizer update; trials are padded to a multiple of the chunk length and
masked, so only a handful of shape buckets ever compile.  Batched variants
(B > 1) data-parallelize trials and shard over a mesh via
dss_tpu.parallel.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vad import UnidirectionalVoiceActivityDetector
from .optim import torch_rmsprop


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over valid frames. logits [..., 2], labels/mask [...]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(ce * mask) / denom


class VadTrainer:
    def __init__(self, model: UnidirectionalVoiceActivityDetector,
                 learning_rate: float = 1e-4, chunk: int = 50):
        self.model = model
        self.chunk = chunk
        self.optimizer = torch_rmsprop(learning_rate)

    def init(self, key: jax.Array):
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    @partial(jax.jit, static_argnames=("self",))
    def tbptt_trial(self, params, opt_state, x, y, mask, dropout_rng):
        """One trial of TBPTT. x [B, T, E], y [B, T], mask [B, T]; T must be
        a multiple of the chunk length.  Returns (params, opt_state,
        mean chunk loss)."""
        B, T, E = x.shape
        n_chunks = T // self.chunk
        xc = x.reshape(B, n_chunks, self.chunk, E).swapaxes(0, 1)
        yc = y.reshape(B, n_chunks, self.chunk).swapaxes(0, 1)
        mc = mask.reshape(B, n_chunks, self.chunk).swapaxes(0, 1)
        state0 = self.model.create_new_initial_state(B)
        rngs = jax.random.split(dropout_rng, n_chunks)

        def loss_fn(p, x_chunk, y_chunk, m_chunk, state, rng):
            logits, new_state = self.model.apply(
                p, x_chunk, state, train=True, dropout_rng=rng
            )
            return masked_cross_entropy(logits, y_chunk, m_chunk), new_state

        def chunk_step(carry, inp):
            p, opt, state = carry
            x_chunk, y_chunk, m_chunk, rng = inp
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p, x_chunk, y_chunk, m_chunk, state, rng)
            # Skip the update for all-padding chunks (keeps the optimizer
            # trajectory identical to the reference's unpadded loop).
            has_data = jnp.sum(m_chunk) > 0
            updates, new_opt = self.optimizer.update(grads, opt, p)
            new_p = optax.apply_updates(p, updates)
            p = jax.tree.map(lambda a, b: jnp.where(has_data, a, b), new_p, p)
            opt = jax.tree.map(
                lambda a, b: jnp.where(has_data, a, b), new_opt, opt
            )
            # State is carried (and implicitly detached by the scan carry).
            return (p, opt, new_state), loss

        (params, opt_state, _), losses = jax.lax.scan(
            chunk_step, (params, opt_state, state0), (xc, yc, mc, rngs)
        )
        return params, opt_state, jnp.mean(losses)

    @partial(jax.jit, static_argnames=("self",))
    def evaluate(self, params, x, y, mask) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                    jnp.ndarray, jnp.ndarray]:
        """Full-sequence eval: returns (loss, correct, total, probs)."""
        state = self.model.create_new_initial_state(x.shape[0])
        logits, _ = self.model.apply(params, x, state)
        loss = masked_cross_entropy(logits, y, mask)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == y.astype(jnp.int32)) * mask)
        probs = jax.nn.softmax(logits, axis=-1)[..., 1]
        return loss, correct, jnp.sum(mask), probs

    def pad_trial(self, x: np.ndarray, y: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pad one trial ([T, E], [T]) to a chunk multiple with a mask."""
        T = len(x)
        Tp = -(-T // self.chunk) * self.chunk
        xp = np.zeros((1, Tp, x.shape[1]), np.float32)
        yp = np.zeros((1, Tp), np.float32)
        m = np.zeros((1, Tp), np.float32)
        xp[0, :T] = x
        yp[0, :T] = y.reshape(T)
        m[0, :T] = 1.0
        return xp, yp, m
