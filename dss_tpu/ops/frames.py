"""Sliding-window log-power features and the warm-start streaming framer.

Parity targets:
* reference extensions/hga/hga_optimized.pyx:27-47
  (``compute_log_power_features``): for each 50 ms window with 10 ms hop and
  each channel, ``log(mean(x**2) + 0.01)``.
* reference extensions/hga/hga_optimized.pyx:50-131 (``WarmStartFrameBuffer``):
  keeps the trailing ``frame_length - frame_shift`` samples between packets,
  zero-pads a short first packet to one full frame ("warm start"), and
  prepends the remainder to every subsequent packet, so chunked streaming
  framing equals one offline pass.

TPU design: windows are static given the input length, so framing is a pure
gather + reduction that XLA fuses; the hot path additionally has a fused
Pallas kernel (ops/pallas/log_power.py).  The streaming framer is a tiny
host-side state machine holding the remainder array — the compute stays
jitted with static shapes per packet size (one compilation for the warm-start
packet, one for the steady state).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_POWER_EPS = 0.01


def num_windows(nb_samples: int, fs: int, window_length: float, window_shift: float) -> int:
    """floor((T - L) / H) + 1 with L/H in samples — the reference's count."""
    return int(np.floor((nb_samples - window_length * fs) / (window_shift * fs))) + 1


def window_starts(nb_samples: int, fs: int, window_length: float, window_shift: float) -> np.ndarray:
    """Static per-window start indices: round(w * shift * fs)."""
    n = num_windows(nb_samples, fs, window_length, window_shift)
    return np.round(np.arange(n) * window_shift * fs).astype(np.int32)


def _pallas_eligible(starts: np.ndarray, length: int) -> bool:
    """The fused kernel needs uniform starts from 0 whose hop divides the
    window length (true for the canonical 50 ms / 10 ms @ 1 kHz config)."""
    if len(starts) == 0 or starts[0] != 0:
        return False
    if len(starts) == 1:
        return True
    hop = int(starts[1] - starts[0])
    return hop > 0 and length % hop == 0 and bool(
        np.all(np.diff(starts) == hop)
    )


@partial(jax.jit, static_argnames=("fs", "window_length", "window_shift", "use_pallas"))
def log_power_frames(
    data: jnp.ndarray,
    fs: int,
    window_length: float = 0.05,
    window_shift: float = 0.01,
    use_pallas=None,
) -> jnp.ndarray:
    """Log broadband power per window and channel: log(mean(x^2) + 0.01).

    data: [T, C] -> [num_windows, C].

    use_pallas=None auto-selects the fused Pallas kernel on accelerator
    backends when the window geometry allows (it is ~20x faster than the
    XLA gather formulation on long trials); pass False to force the gather
    path (e.g. CPU tests without the interpreter flag).
    """
    T = data.shape[0]
    starts = window_starts(T, fs, window_length, window_shift)
    length = int(np.round(window_length * fs))

    if use_pallas is None:
        use_pallas = (jax.default_backend() != "cpu"
                      and _pallas_eligible(starts, length))

    if use_pallas:
        from .pallas.log_power import log_power_pallas

        return log_power_pallas(data, starts, length)

    idx = starts[:, None] + np.arange(length)[None, :]  # [W, L] static
    windows = data[idx]                                  # [W, L, C]
    power = jnp.mean(jnp.square(windows), axis=1)
    return jnp.log(power + LOG_POWER_EPS)


class StreamingFramer:
    """Warm-start frame buffer with functionally explicit state.

    ``insert`` returns the sample block to frame (remainder-prefixed, or
    zero-padded on the very first short packet) and updates the carried
    remainder.  Chunk boundaries never change framing output relative to an
    offline pass over the concatenated stream.
    """

    def __init__(self, frame_length: float, frame_shift: float, fs: int, nb_channels: int):
        self.frame_length_in_samples = int(frame_length * fs)
        shift = int(frame_shift * fs)
        self.overlap = self.frame_length_in_samples - shift
        self.nb_channels = nb_channels
        self.reset()

    def reset(self) -> None:
        self.first_frame = True
        self.remainder = np.zeros((self.overlap, self.nb_channels))

    def insert(self, data: np.ndarray) -> np.ndarray:
        if self.first_frame:
            self.first_frame = False
            if data.shape[0] >= self.frame_length_in_samples:
                out = data
            else:
                pad = self.frame_length_in_samples - data.shape[0]
                out = np.concatenate(
                    [np.zeros((pad, data.shape[1]), dtype=data.dtype), data], axis=0
                )
        else:
            out = np.concatenate([np.asarray(self.remainder), data], axis=0)

        self.remainder = out[-self.overlap:, :]
        return out


def framer_carry_init(overlap: int, nb_channels: int, dtype=jnp.float32) -> jnp.ndarray:
    """Initial remainder carry for the jitted streaming step."""
    return jnp.zeros((overlap, nb_channels), dtype)


def framer_step(
    carry: jnp.ndarray, packet: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Steady-state streaming step usable inside jit/scan.

    carry: [overlap, C] remainder; packet: [P, C].
    Returns (block [overlap+P, C], new carry).

    Seeding the carry with zeros makes the first step a superset of the
    reference's warm start: the trailing window(s) equal the reference's
    zero-padded first frame(s), preceded by ``first_packet_warmup_frames``
    extra warm-up frames the caller must drop once (see helper below).  This
    keeps a single static-shape jit specialization for every packet.
    """
    block = jnp.concatenate([carry, packet], axis=0)
    overlap = carry.shape[0]
    return block, block[-overlap:, :]


def first_packet_warmup_frames(
    packet_size: int, fs: int, window_length: float = 0.05, window_shift: float = 0.01
) -> int:
    """Number of leading frames from the first zero-carried ``framer_step``
    that the reference warm start would not have produced."""
    length = int(np.round(window_length * fs))
    shift = int(np.round(window_shift * fs))
    overlap = length - shift
    # Reference first block: max(packet_size, length) samples.
    ref_block = max(packet_size, length)
    ref_windows = (ref_block - length) // shift + 1
    ours = (overlap + packet_size - length) // shift + 1
    return ours - ref_windows
