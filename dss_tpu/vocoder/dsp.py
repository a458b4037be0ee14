"""Deterministic source-filter LPC vocoder backend.

Synthesizes 160 samples of 16 kHz audio per 20-dim feature frame with no
trained weights: the cepstral features define a spectral envelope (and via
Levinson-Durbin a 16-tap all-pole filter); the excitation is a classic
mixed pulse-train/noise source driven by the pitch features.  Serves as the
always-available vocoder backend, the golden reference for vocoder tests,
and the fallback when no neural weights are configured.

The per-sample synthesis filter is a ``lax.scan`` with a carried
[LPC_ORDER] state; frames batch over streams with vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import pitch_feature_decode
from .lpc import FRAME_SIZE, LPC_ORDER, NB_BANDS, PREEMPH, WINDOW_SIZE, \
    bands_from_cepstrum, lpc_from_bands


class DspVocoderState(NamedTuple):
    """Carried synthesis state (a pytree; vmap-able over streams)."""

    sig_mem: jnp.ndarray      # [LPC_ORDER] recent output (pre-deemphasis)
    pitch_phase: jnp.ndarray  # scalar int32, samples until next pulse
    deemph_mem: jnp.ndarray   # scalar float32
    rng: jax.Array            # PRNG key for the noise source


def dsp_vocoder_init(seed: int = 0) -> DspVocoderState:
    return DspVocoderState(
        sig_mem=jnp.zeros(LPC_ORDER, jnp.float32),
        pitch_phase=jnp.zeros((), jnp.int32),
        deemph_mem=jnp.zeros((), jnp.float32),
        rng=jax.random.PRNGKey(seed),
    )


@jax.jit
def dsp_frame_synthesize(state: DspVocoderState, features: jnp.ndarray):
    """One frame: features [20] -> (pcm float [-1, 1] [160], new state)."""
    cepstrum = features[:NB_BANDS]
    period, corr = pitch_feature_decode(features[NB_BANDS], features[NB_BANDS + 1])
    period = period.astype(jnp.int32)

    bands = bands_from_cepstrum(cepstrum)
    lpc, res_energy = lpc_from_bands(bands)

    # Excitation energy per sample so that the synthesized frame's power
    # matches the envelope's residual energy (band energies are of the
    # windowed, pre-emphasized signal; WINDOW energy -> per-sample).
    gain = jnp.sqrt(jnp.maximum(res_energy, 1e-12) / WINDOW_SIZE * 2.0)

    voiced = corr > 0.3
    v_mix = jnp.clip((corr - 0.3) / 0.5, 0.0, 1.0)

    rng, noise_key = jax.random.split(state.rng)
    noise = jax.random.normal(noise_key, (FRAME_SIZE,), jnp.float32)

    def sample_step(carry, n_t):
        sig_mem, phase = carry
        pulse_now = phase <= 0
        pulse = jnp.where(
            pulse_now & voiced,
            jnp.sqrt(period.astype(jnp.float32)),
            0.0,
        )
        phase = jnp.where(pulse_now, period, phase) - 1
        e = gain * (v_mix * pulse + (1.0 - v_mix) * n_t +
                    v_mix * 0.25 * n_t)
        # All-pole synthesis: s[n] = e[n] - sum_k a[k] s[n-k]
        # (lpc convention: pred[n] = -sum_k a[k] x[n-k], see lpc.levinson)
        s = e - sig_mem @ lpc
        sig_mem = jnp.concatenate([s[None], sig_mem[:-1]])
        return (sig_mem, phase), s

    (sig_mem, phase), sig = jax.lax.scan(
        sample_step, (state.sig_mem, state.pitch_phase), noise
    )

    # De-emphasis: y[n] = s[n] + PREEMPH * y[n-1]
    def deemph_step(y_prev, s_t):
        y = s_t + PREEMPH * y_prev
        return y, y

    deemph_mem, pcm = jax.lax.scan(deemph_step, state.deemph_mem, sig)

    new_state = DspVocoderState(
        sig_mem=sig_mem, pitch_phase=phase, deemph_mem=deemph_mem, rng=rng
    )
    return jnp.clip(pcm, -1.0, 1.0), new_state


@partial(jax.jit, static_argnames=())
def dsp_synthesize_frames(state: DspVocoderState, features: jnp.ndarray):
    """Multi-frame synthesis: features [T, 20] -> (pcm [T*160], state)."""
    new_state, pcm = jax.lax.scan(
        lambda s, f: tuple(reversed(dsp_frame_synthesize(s, f))), state, features
    )
    return pcm.reshape(-1), new_state


class LPCVocoder:
    """Stateful host wrapper matching the LPCNet ``synthesize`` contract."""

    def __init__(self, seed: int = 0):
        self._seed = seed
        self.reset_decoder()

    def reset_decoder(self) -> None:
        self._state = dsp_vocoder_init(self._seed)

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """features [20] float32 -> int16 [160] (10 ms @ 16 kHz)."""
        pcm, self._state = dsp_frame_synthesize(
            self._state, jnp.asarray(features, jnp.float32)
        )
        return np.asarray(
            np.clip(np.asarray(pcm) * 32767.0, -32768, 32767), dtype=np.int16
        )

    def synthesize_frames(self, features: np.ndarray) -> np.ndarray:
        """features [T, 20] -> int16 [T*160] in one jitted call."""
        pcm, self._state = dsp_synthesize_frames(
            self._state, jnp.asarray(features, jnp.float32)
        )
        return np.asarray(
            np.clip(np.asarray(pcm) * 32767.0, -32768, 32767), dtype=np.int16
        )
