"""Ring-buffer semantics tests: smoothing delay/majority vote, segment
assembly, and jax-scan equivalence."""

import numpy as np

from dss_tpu.ops.ringbuffer import (
    SpeechSegmentHistory,
    VoiceActivityDetectionSmoothing,
    smooth_labels_scan,
)


def test_smoothing_majority_and_delay():
    c = 5
    sm = VoiceActivityDetectionSmoothing(nb_features=2, context_frames=c)
    n = 40
    labels = np.zeros(n, dtype=bool)
    labels[10:30] = True
    data = np.arange(n, dtype=np.float32)[:, None].repeat(2, axis=1)

    out_data, out_labels = sm.insert(data, labels)

    # Data is delayed by 2*context frames (buffer pre-filled with zeros).
    delay = 2 * c
    np.testing.assert_array_equal(out_data[delay:], data[:-delay])
    np.testing.assert_array_equal(out_data[:delay], 0)

    # Label t is majority over labels[t-2c : t+1] with >= 0.6 of 11 frames.
    window = 2 * c + 1
    want = np.zeros(n, dtype=bool)
    padded = np.concatenate([np.zeros(window - 1), labels])
    for t in range(n):
        want[t] = padded[t:t + window].sum() / window >= 0.6
    np.testing.assert_array_equal(out_labels, want)


def test_smoothing_incremental_equals_batch(rng):
    sm1 = VoiceActivityDetectionSmoothing(nb_features=3, context_frames=5)
    sm2 = VoiceActivityDetectionSmoothing(nb_features=3, context_frames=5)
    labels = rng.random(57) > 0.5
    data = rng.normal(size=(57, 3)).astype(np.float32)

    d1, l1 = sm1.insert(data, labels)
    d2, l2 = [], []
    for i in range(0, 57, 4):
        d, l = sm2.insert(data[i:i + 4], labels[i:i + 4])
        d2.append(d)
        l2.append(l)
    np.testing.assert_array_equal(np.concatenate(d2), d1)
    np.testing.assert_array_equal(np.concatenate(l2), l1)


def test_smooth_labels_scan_matches_stateful(rng):
    labels = rng.random(80) > 0.6
    sm = VoiceActivityDetectionSmoothing(nb_features=1, context_frames=5)
    _, want = sm.insert(np.zeros((80, 1), np.float32), labels)
    got = np.asarray(smooth_labels_scan(labels, context_frames=5))
    np.testing.assert_array_equal(got, want)


def test_segment_history_emits_complete_segment():
    ctx = 3
    hist = SpeechSegmentHistory(nb_features=1, buffer_size=100, context=ctx)
    labels = np.zeros(30, dtype=bool)
    labels[5:12] = True  # 7 speech frames
    data = np.arange(30, dtype=np.float32)[:, None]

    segments = []
    for i in range(30):
        segments.extend(hist.insert(data[i:i + 1], labels[i:i + 1]))

    assert len(segments) == 1
    seg = segments[0]
    # Segment spans 2*context + n_speech frames ending at the emit point.
    assert len(seg) == 2 * ctx + 7
    # Emission happens after `ctx` non-speech frames at t=14; window is the
    # last 13 frames written: data[2..14].
    np.testing.assert_array_equal(seg[:, 0], np.arange(2, 15))


def test_segment_history_wraps_ringbuffer():
    ctx = 2
    hist = SpeechSegmentHistory(nb_features=1, buffer_size=12, context=ctx)
    labels = np.zeros(40, dtype=bool)
    labels[20:25] = True
    data = np.arange(40, dtype=np.float32)[:, None]
    segments = []
    for i in range(40):
        segments.extend(hist.insert(data[i:i + 1], labels[i:i + 1]))
    assert len(segments) == 1
    assert len(segments[0]) == 2 * ctx + 5
    np.testing.assert_array_equal(segments[0][:, 0], np.arange(18, 27))


def test_segment_history_counts_nonconsecutive_silence():
    """The trailing-context counter accumulates across interleaved speech
    (reference local/common.py:197-204 keeps counting)."""
    ctx = 4
    hist = SpeechSegmentHistory(nb_features=1, buffer_size=64, context=ctx)
    labels = np.array([1, 0, 0, 1, 0, 0, 0, 0, 0], dtype=bool)
    data = np.arange(9, dtype=np.float32)[:, None]
    segments = []
    for i in range(9):
        segments.extend(hist.insert(data[i:i + 1], labels[i:i + 1]))
    # Non-speech count reaches ctx=4 at t=5 despite the speech frame at t=3.
    assert len(segments) == 1
    assert len(segments[0]) == 2 * ctx + 2
