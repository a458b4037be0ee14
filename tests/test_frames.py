"""Framing + log-power tests against a straightforward numpy oracle built
from the reference formula (hga_optimized.pyx:27-47) and warm-start streaming
semantics (hga_optimized.pyx:50-131)."""

import numpy as np
import pytest

from dss_tpu.ops import (
    StreamingFramer,
    first_packet_warmup_frames,
    log_power_frames,
    num_windows,
)

FS = 1000
WL = 0.05
WS = 0.01


def oracle_log_power(data, fs=FS, wl=WL, ws=WS):
    """Direct transcription of the documented formula (numpy, float64)."""
    n = int(np.floor((data.shape[0] - wl * fs) / (ws * fs))) + 1
    out = np.zeros((n, data.shape[1]))
    for w in range(n):
        start = int(round(w * ws * fs))
        stop = int(round(start + wl * fs))
        seg = data[start:stop]
        out[w] = np.log(np.mean(seg ** 2, axis=0) + 0.01)
    return out


def test_log_power_matches_oracle(rng):
    data = rng.normal(size=(437, 8)).astype(np.float32)
    got = np.asarray(log_power_frames(data, FS, WL, WS))
    want = oracle_log_power(data.astype(np.float64))
    assert got.shape == (num_windows(437, FS, WL, WS), 8)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_streaming_framer_equals_offline(rng):
    """Framing chunked data with the warm-start buffer must produce the same
    feature stream as framing the concatenated signal (after the warm-start
    zero prefix)."""
    C = 4
    data = rng.normal(size=(400, C))
    framer = StreamingFramer(WL, WS, FS, C)

    streamed = []
    for start in range(0, 400, 40):
        block = framer.insert(data[start:start + 40])
        streamed.append(oracle_log_power(block))
    streamed = np.concatenate(streamed)

    # Offline equivalent: first packet (40 samples) is zero-padded to one
    # 50-sample frame -> prepend 10 zeros to the full stream.
    padded = np.concatenate([np.zeros((10, C)), data])
    offline = oracle_log_power(padded)
    np.testing.assert_allclose(streamed, offline, atol=1e-12)


def test_streaming_framer_large_first_chunk(rng):
    """First chunk >= frame length passes through unpadded (case 1)."""
    C = 3
    data = rng.normal(size=(120, C))
    framer = StreamingFramer(WL, WS, FS, C)
    block = framer.insert(data[:70])
    np.testing.assert_array_equal(block, data[:70])
    block2 = framer.insert(data[70:])
    # Remainder is the trailing 40 samples of the first block.
    np.testing.assert_array_equal(block2[:40], data[30:70])
    np.testing.assert_array_equal(block2[40:], data[70:])


@pytest.mark.parametrize("packet", [20, 40, 60, 100])
def test_warmup_frame_count(packet, rng):
    """Zero-carried jitted framer step == reference warm start after dropping
    the computed number of warm-up frames."""
    C = 2
    data = rng.normal(size=(packet, C))

    framer = StreamingFramer(WL, WS, FS, C)
    ref_block = framer.insert(data)
    ref_feats = oracle_log_power(ref_block)

    zero_carry_block = np.concatenate([np.zeros((40, C)), data])
    our_feats = oracle_log_power(zero_carry_block)
    k = first_packet_warmup_frames(packet, FS, WL, WS)
    np.testing.assert_allclose(our_feats[k:], ref_feats, atol=1e-12)
    # Remainders agree too.
    np.testing.assert_array_equal(zero_carry_block[-40:], ref_block[-40:])
