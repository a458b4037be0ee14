"""High-gamma feature front-end: filter cascade + framing + log power.

Parity target: reference local/units.py:97-161 (``HighGammaExtractor``):
pre-transforms -> IIR butter order-8 band-pass 70-170 Hz -> band-stop
118-122 Hz (both with carried per-channel state) -> warm-start framing ->
log-power features -> post-transforms.

TPU design: the two filters compose into one 16-section cascade executed as
a ``lax.scan`` (online packets) or ``lax.associative_scan`` (offline trials);
framing + log power is a static gather + reduction (or the fused Pallas
kernel); the whole packet step jits into a single XLA program with an
explicit (filter state, framer remainder) carry pytree.

Initial filter state matches the reference: each filter seeded with scipy's
``sosfilt_zi`` tiled over channels, concatenated along the section axis
(NOT ``sosfilt_zi`` of the combined cascade — the reference runs the two
filters back-to-back with independently initialized states).
"""

from __future__ import annotations

import logging
from functools import partial, reduce
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .filters import (
    design_bandpass,
    design_bandstop,
    sosfilt_parallel,
    sosfilt_scan,
    sosfilt_zi,
)
from .frames import (
    StreamingFramer,
    first_packet_warmup_frames,
    log_power_frames,
)

logger = logging.getLogger("dss_tpu.ops.hga")

Transforms = Optional[List[Callable]]


def _compose(functions: Optional[List[Callable]]) -> Optional[Callable]:
    if not functions:
        return None
    return reduce(lambda f, g: lambda x: g(f(x)), functions, lambda x: x)


class FrontendState(NamedTuple):
    """Carried streaming state: IIR section states + framer remainder."""

    zi: jnp.ndarray         # [S, 2, C]
    remainder: jnp.ndarray  # [overlap, C]


class HighGammaExtractor:
    """Stateful front-end with the reference's ``extract_features`` contract.

    Also exposes pure jitted building blocks (``init_state`` /
    ``packet_step`` / ``offline_features``) for the streaming runtime and
    for sharded batch processing.
    """

    def __init__(
        self,
        fs: int,
        nb_electrodes: int,
        window_length: float = 0.05,
        window_shift: float = 0.01,
        l_freq: int = 70,
        h_freq: int = 170,
        pre_transforms: Transforms = None,
        post_transforms: Transforms = None,
        dtype=jnp.float32,
        parallel_filter: bool = False,
    ):
        self.fs = fs
        self.nb_electrodes = nb_electrodes
        self.window_length = window_length
        self.window_shift = window_shift
        self.dtype = dtype
        self.parallel_filter = parallel_filter
        self.pre_transform = _compose(pre_transforms)
        self.post_transform = _compose(post_transforms)

        if not ((60 < l_freq < 120) or (120 < h_freq < 180)):
            logger.warning(
                "band edges (%s-%s Hz) fall outside the usual high-gamma range",
                l_freq, h_freq)

        bp = design_bandpass(fs, l_freq, h_freq, order=8)
        bs = design_bandstop(fs, 118, 122, order=8)
        self.sos = np.concatenate([bp, bs], axis=0)
        self._zi0 = np.concatenate(
            [sosfilt_zi(bp, nb_electrodes), sosfilt_zi(bs, nb_electrodes)], axis=0
        )

        self.framebuffer = StreamingFramer(
            frame_length=window_length, frame_shift=window_shift, fs=fs,
            nb_channels=nb_electrodes,
        )
        self.reset()

    # ------------------------------------------------------------------
    # Reference-compatible stateful API
    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.zi = jnp.asarray(self._zi0, self.dtype)
        self.framebuffer.reset()

    def extract_features(self, data: np.ndarray) -> np.ndarray:
        """Streaming/offline feature extraction with carried state.

        data: [T, raw_channels]. Returns [num_windows, features].
        """
        if self.pre_transform is not None:
            data = self.pre_transform(data)
        data = jnp.asarray(data, self.dtype)

        if self.parallel_filter and data.shape[0] > 256:
            filtered, self.zi = sosfilt_parallel(self.sos, data, self.zi)
        else:
            filtered, self.zi = sosfilt_scan(
                jnp.asarray(self.sos, self.dtype), data, self.zi
            )

        if self.framebuffer.first_frame and \
                data.shape[0] >= self.framebuffer.frame_length_in_samples:
            # Warm-start case 1: the framed block IS the filtered signal —
            # keep everything on device (the host round trip through the
            # framer dominates long-trial extraction otherwise).
            self.framebuffer.first_frame = False
            self.framebuffer.remainder = np.asarray(
                filtered[-self.framebuffer.overlap:, :]
            )
            block = filtered
        else:
            block = jnp.asarray(
                self.framebuffer.insert(np.asarray(filtered)), self.dtype
            )
        features = log_power_frames(
            block, self.fs, self.window_length, self.window_shift,
        )

        if self.post_transform is not None:
            features = self.post_transform(features)
        return np.asarray(features)

    # ------------------------------------------------------------------
    # Pure jitted API for the online runtime
    # ------------------------------------------------------------------
    def init_state(self) -> FrontendState:
        return FrontendState(
            zi=jnp.asarray(self._zi0, self.dtype),
            remainder=jnp.zeros(
                (self.framebuffer.overlap, self.nb_electrodes), self.dtype
            ),
        )

    def warmup_frames(self, packet_size: int) -> int:
        """Leading frames to drop from the first ``packet_step`` output."""
        return first_packet_warmup_frames(
            packet_size, self.fs, self.window_length, self.window_shift
        )

    @partial(jax.jit, static_argnames=("self",))
    def packet_step(self, state: FrontendState, packet: jnp.ndarray):
        """One fully-jitted streaming step: packet [P, raw_ch] -> features.

        Returns (features [W, F], new FrontendState). The first call's
        output contains ``warmup_frames(P)`` extra leading frames.
        """
        data = packet.astype(self.dtype)
        if self.pre_transform is not None:
            data = self.pre_transform(data)
        filtered, zi = sosfilt_scan(jnp.asarray(self.sos, self.dtype), data, state.zi)
        block = jnp.concatenate([state.remainder, filtered], axis=0)
        features = log_power_frames(block, self.fs, self.window_length, self.window_shift)
        if self.post_transform is not None:
            features = self.post_transform(features)
        overlap = state.remainder.shape[0]
        return features, FrontendState(zi=zi, remainder=block[-overlap:, :])

    def __hash__(self):  # allow use as a static jit argument
        return id(self)

    def __eq__(self, other):
        return self is other
