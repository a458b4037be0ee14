"""Streaming VAD label smoothing and speech-segment assembly.

Parity targets:
* reference local/common.py:106-153 (``VoiceActivityDetectionSmoothing``):
  ring buffer of ``2*context + 1`` frames; each incoming (frame, label) pair
  is written at the write pointer, the output label is the majority vote
  (ratio >= threshold) over the whole buffer, and the output frame is read
  ``2*context`` positions behind — i.e. the data stream is delayed by
  ``2*context`` frames so labels align with a symmetric future/past window.
* reference local/common.py:156-215 (``SpeechSegmentHistory``): ring buffer
  accumulating frames; once ``context`` consecutive non-speech frames follow
  a run of speech, the segment spanning ``2*context + n_speech`` frames is
  emitted.

These are O(frames) pointer machines on tiny arrays; they run on the host in
the online graph (the heavy math sits in the jitted feature/model steps).  A
jit-compatible ``smooth_labels_scan`` is provided for batched offline
evaluation inside compiled training loops.
"""

from __future__ import annotations

from math import floor
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VoiceActivityDetectionSmoothing:
    """Majority-vote smoothing with aligned data delay."""

    def __init__(self, nb_features: int, context_frames: int,
                 proportion_threshold: float = 0.6, shift: float = 0.01):
        self.frameshift = shift
        self.nb_features = nb_features
        self.vad_context_frames = context_frames
        self.vad_proportion_threshold = proportion_threshold
        self.buffer_size = 2 * context_frames + 1
        self.buffer = np.zeros((self.buffer_size, nb_features), dtype=np.float32)
        self.labels = np.zeros(self.buffer_size, dtype=bool)
        self.write_pointer = 2 * context_frames
        self.read_pointer = 0

    def insert(self, data: np.ndarray, speech_labels: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized per-packet update, equivalent to inserting one frame at
        a time.

        Unrolling the ring into write order (oldest surviving entry first)
        turns the sequential pointer machine into sliding-window sums: after
        the i-th insert the buffer holds timeline slots ``[i+1, i+W]``, the
        majority vote is a prefix-sum difference over that span, and the
        delayed read (``2*context`` behind the write) is timeline slot
        ``i+1``.  This sits on the per-packet critical path of the online
        graph, so no per-frame Python loop.
        """
        n = len(speech_labels)
        w = self.buffer_size
        order = (self.write_pointer + np.arange(w)) % w

        timeline_labels = np.concatenate(
            [self.labels[order], np.asarray(speech_labels, dtype=bool)])
        timeline_data = np.concatenate(
            [self.buffer[order], np.asarray(data, dtype=np.float32)], axis=0)

        prefix = np.concatenate([[0], np.cumsum(timeline_labels)])
        counts = prefix[w + 1 + np.arange(n)] - prefix[1 + np.arange(n)]
        out_labels = counts / w >= self.vad_proportion_threshold
        out_data = timeline_data[1:n + 1].copy()

        self.write_pointer = (self.write_pointer + n) % w
        self.read_pointer = (self.read_pointer + n) % w
        restore = (self.write_pointer + np.arange(w)) % w
        self.labels[restore] = timeline_labels[n:n + w]
        self.buffer[restore] = timeline_data[n:n + w]
        return out_data, out_labels

    def __repr__(self) -> str:
        delay_s = floor(self.buffer_size / 2) * self.frameshift
        return (
            f"VoiceActivityDetectionSmoothing(window={self.buffer_size} frames"
            f" / {self.buffer_size * self.frameshift:.02f} s, label delay"
            f" ~{delay_s} s, majority>={self.vad_proportion_threshold:.02f})"
        )


def smooth_labels_scan(labels: jnp.ndarray, context_frames: int,
                       proportion_threshold: float = 0.6) -> jnp.ndarray:
    """Jit-compatible equivalent of the smoothing label stream.

    Produces, for each t, whether at least ``threshold`` of the window
    ``labels[t-2c : t+1]`` (zero-padded on the left) is speech — identical to
    feeding frames through ``VoiceActivityDetectionSmoothing`` one at a time.
    """
    window = 2 * context_frames + 1
    lab = jnp.asarray(labels, jnp.float32)
    padded = jnp.concatenate([jnp.zeros(window - 1, jnp.float32), lab])
    kernel = jnp.ones(window, jnp.float32)
    counts = jnp.convolve(padded, kernel, mode="valid")
    return counts / window >= proportion_threshold


class SpeechSegmentHistory:
    """Assemble completed speech segments from a smoothed label stream."""

    def __init__(self, nb_features: int, buffer_size: int, context: int = 0):
        self.buffer = np.zeros((buffer_size, nb_features), dtype=np.float32)
        self.write_pointer = 0
        self.context = context
        self.speech_frame_counter = 0
        self.future_frame_counter = 0

    def insert(self, data: np.ndarray, speech_labels: np.ndarray
               ) -> List[np.ndarray]:
        size = len(self.buffer)
        result: List[np.ndarray] = []
        for i in range(len(speech_labels)):
            self.buffer[self.write_pointer, :] = data[i]
            self.write_pointer = (self.write_pointer + 1) % size

            if speech_labels[i]:
                self.speech_frame_counter += 1
                # NB: the trailing-context countdown is intentionally NOT
                # reset here — the reference counts all non-speech frames
                # observed since the segment started, not consecutive ones
                # (local/common.py:197-204).
                continue

            if self.speech_frame_counter > 0:
                self.future_frame_counter += 1
                if self.future_frame_counter >= self.context:
                    stop = self.write_pointer if self.context > 0 \
                        else (self.write_pointer - 1) % size
                    length = 2 * self.context + self.speech_frame_counter
                    start = (stop - length) % size
                    idx = (start + np.arange(length)) % size
                    result.append(self.buffer[idx].copy())
                    self.speech_frame_counter = 0
                    self.future_frame_counter = 0
        return result
