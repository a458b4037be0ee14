"""8-bit mu-law companding for the autoregressive sample domain.

The sample-rate network predicts a distribution over 256 mu-law levels of
the excitation signal (the same discretization the LPCNet C vocoder uses for
its output/exc/pred embeddings).
"""

from __future__ import annotations

import jax.numpy as jnp

MULAW_LEVELS = 256
_MU = 255.0


def mulaw_encode(x: jnp.ndarray) -> jnp.ndarray:
    """Float signal in [-1, 1] -> integer level in [0, 255]."""
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(_MU * jnp.abs(x)) / jnp.log1p(_MU)
    return jnp.clip(
        jnp.round((y + 1.0) * 0.5 * (MULAW_LEVELS - 1)), 0, MULAW_LEVELS - 1
    ).astype(jnp.int32)


def mulaw_decode(idx: jnp.ndarray) -> jnp.ndarray:
    """Integer level in [0, 255] -> float signal in [-1, 1]."""
    y = idx.astype(jnp.float32) / (MULAW_LEVELS - 1) * 2.0 - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + _MU, jnp.abs(y)) - 1.0) / _MU
