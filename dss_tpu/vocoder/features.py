"""Acoustic feature encoder: 16 kHz PCM -> 20-dim vocoder features.

Parity target (API + feature semantics): reference
extensions/lpcnet/LPCNet.pyx:43-87 (``LPCFeatureEncoder``): consumes int16
PCM in 160-sample frames and emits float32 [N, 20] features — 18 Bark-scale
cepstra + pitch period + pitch correlation.  The C library's exact numerics
are not reproducible (not vendored); this encoder defines the framework's
own self-consistent scaling:

    features[18] = (pitch_period - 100) / 50        (period in samples)
    features[19] = pitch_correlation - 0.5          (in [-0.5, 0.5])

TPU design: all frames of a buffer are encoded in one jitted, vmapped
program — windowed rFFTs and the pitch cross-correlation are expressed as
batched matmuls/gathers on static shapes.  A carried history buffer makes
chunked streaming equal to offline encoding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .lpc import (
    FRAME_SIZE,
    NB_FEATURES,
    PREEMPH,
    WINDOW_SIZE,
    band_energies,
    cepstrum_from_bands,
)

PITCH_MIN = 32     # 500 Hz
PITCH_MAX = 256    # 62.5 Hz
_HISTORY = WINDOW_SIZE - FRAME_SIZE + PITCH_MAX  # look-back needed per frame

_WINDOW = np.hanning(WINDOW_SIZE)


def pitch_feature_encode(period: jnp.ndarray, corr: jnp.ndarray):
    return (period - 100.0) / 50.0, corr - 0.5


def pitch_feature_decode(f18: jnp.ndarray, f19: jnp.ndarray):
    period = jnp.clip(jnp.round(f18 * 50.0 + 100.0), PITCH_MIN, PITCH_MAX)
    corr = jnp.clip(f19 + 0.5, 0.0, 1.0)
    return period, corr


def _frame_features(segment: jnp.ndarray) -> jnp.ndarray:
    """Features for one frame given its [HISTORY + FRAME_SIZE] context.

    The analysis window is the trailing WINDOW_SIZE samples; the pitch search
    correlates that window against up to PITCH_MAX samples of look-back.
    """
    window = segment[-WINDOW_SIZE:]
    spec = jnp.fft.rfft(window * jnp.asarray(_WINDOW, segment.dtype))
    bands = band_energies(jnp.abs(spec) ** 2 / WINDOW_SIZE)
    cepstrum = cepstrum_from_bands(bands)

    # Pitch: normalized cross-correlation of the window against lagged copies.
    n = segment.shape[0]
    base = n - WINDOW_SIZE
    lags = jnp.arange(PITCH_MIN, PITCH_MAX + 1)
    idx = (base - lags)[:, None] + jnp.arange(WINDOW_SIZE)[None, :]
    lagged = segment[idx]                              # [L, W]
    num = lagged @ window                              # [L]
    e0 = window @ window
    e_lag = jnp.sum(lagged * lagged, axis=1)
    corr = num / jnp.sqrt(e0 * e_lag + 1e-9)

    best = jnp.argmax(corr)
    best_corr = corr[best]
    period = (PITCH_MIN + best).astype(jnp.float32)

    # Octave-error check: prefer half the period when nearly as correlated.
    half_idx = jnp.clip((period / 2.0).astype(jnp.int32) - PITCH_MIN, 0, None)
    half_ok = (period / 2.0 >= PITCH_MIN) & (corr[half_idx] > 0.85 * best_corr)
    period = jnp.where(half_ok, jnp.round(period / 2.0), period)
    best_corr = jnp.where(half_ok, corr[half_idx], best_corr)
    best_corr = jnp.clip(best_corr, 0.0, 1.0)

    f18, f19 = pitch_feature_encode(period, best_corr)
    return jnp.concatenate([cepstrum, jnp.stack([f18, f19])])


@partial(jax.jit, static_argnames=("num_frames",))
def _encode_buffer(history_and_audio: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """[HISTORY + num_frames*FRAME_SIZE] float signal -> [num_frames, 20]."""
    starts = np.arange(num_frames) * FRAME_SIZE
    idx = starts[:, None] + np.arange(_HISTORY + FRAME_SIZE)[None, :]
    segments = history_and_audio[idx]
    return jax.vmap(_frame_features)(segments)


class LPCFeatureEncoder:
    """Stateful encoder with the reference's ``compute_LPC_features`` API."""

    NB_FEATURES = NB_FEATURES
    LPCNET_FRAME_SIZE = FRAME_SIZE

    def __init__(self):
        self.reset_encoder()

    def reset_encoder(self) -> None:
        self._history = np.zeros(_HISTORY, dtype=np.float32)
        self._preemph_mem = 0.0

    def compute_LPC_features(self, audio_samples: np.ndarray) -> np.ndarray:
        """int16 (or float in [-1,1]) PCM -> float32 [N, 20] features.

        N = len(audio) // 160; trailing partial frames are ignored, matching
        the reference binding.
        """
        audio = np.asarray(audio_samples)
        if np.issubdtype(audio.dtype, np.integer):
            audio = audio.astype(np.float32) / 32768.0
        else:
            audio = audio.astype(np.float32)

        num_frames = len(audio) // FRAME_SIZE
        if num_frames == 0:
            return np.zeros((0, NB_FEATURES), dtype=np.float32)
        audio = audio[: num_frames * FRAME_SIZE]

        # Pre-emphasis with carried filter memory.
        shifted = np.concatenate([[self._preemph_mem], audio[:-1]])
        emphasized = audio - PREEMPH * shifted
        self._preemph_mem = audio[-1]

        buf = np.concatenate([self._history, emphasized]).astype(np.float32)
        feats = np.asarray(_encode_buffer(jnp.asarray(buf), num_frames))
        self._history = buf[-_HISTORY:]
        return feats
