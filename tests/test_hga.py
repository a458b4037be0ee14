"""End-to-end front-end tests: HighGammaExtractor vs a scipy oracle, and
streaming (packet) vs offline equivalence."""

import numpy as np
import scipy.signal as sig

from dss_tpu.ops import HighGammaExtractor
from dss_tpu.ops.filters import design_bandpass, design_bandstop, sosfilt_zi

FS = 1000


def scipy_oracle(data, nb_channels):
    """Reference pipeline in float64 scipy: two sosfilt passes + framing."""
    bp = design_bandpass(FS, 70, 170)
    bs = design_bandstop(FS, 118, 122)
    y, _ = sig.sosfilt(bp, data, axis=0, zi=sosfilt_zi(bp, nb_channels))
    y, _ = sig.sosfilt(bs, y, axis=0, zi=sosfilt_zi(bs, nb_channels))
    n = int(np.floor((y.shape[0] - 50) / 10)) + 1
    feats = np.zeros((n, nb_channels))
    for w in range(n):
        feats[w] = np.log(np.mean(y[w * 10:w * 10 + 50] ** 2, axis=0) + 0.01)
    return feats


def test_extractor_matches_scipy(rng):
    C = 8
    data = rng.normal(size=(1000, C)).astype(np.float64)
    ex = HighGammaExtractor(fs=FS, nb_electrodes=C)
    got = ex.extract_features(data)
    want = scipy_oracle(data, C)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_extractor_parallel_filter_path(rng):
    C = 4
    data = rng.normal(size=(800, C))
    ex_seq = HighGammaExtractor(fs=FS, nb_electrodes=C, parallel_filter=False)
    ex_par = HighGammaExtractor(fs=FS, nb_electrodes=C, parallel_filter=True)
    np.testing.assert_allclose(
        ex_par.extract_features(data), ex_seq.extract_features(data), atol=1e-3
    )


def test_extractor_streaming_equals_offline(rng):
    """40-sample packets with carried state == the offline pipeline where
    the *filtered* signal gets the warm-start zero prefix (the framer pads
    filtered data, not raw data — reference local/units.py:151-156)."""
    C = 4
    data = rng.normal(size=(400, C))

    # Oracle: filter the raw stream (scipy f64, same zi), then frame the
    # zero-prefixed filtered signal.
    bp = design_bandpass(FS, 70, 170)
    bs = design_bandstop(FS, 118, 122)
    y, _ = sig.sosfilt(bp, data, axis=0, zi=sosfilt_zi(bp, C))
    y, _ = sig.sosfilt(bs, y, axis=0, zi=sosfilt_zi(bs, C))
    y = np.concatenate([np.zeros((10, C)), y])  # warm-start prefix
    n = int(np.floor((y.shape[0] - 50) / 10)) + 1
    want = np.zeros((n, C))
    for w in range(n):
        want[w] = np.log(np.mean(y[w * 10:w * 10 + 50] ** 2, axis=0) + 0.01)

    streaming = HighGammaExtractor(fs=FS, nb_electrodes=C)
    chunks = [
        streaming.extract_features(data[s:s + 40]) for s in range(0, 400, 40)
    ]
    got = np.concatenate(chunks)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_extractor_chunk_size_invariance(rng):
    """Different packet sizes must produce the same feature stream once the
    warm-start frames are aligned."""
    C = 3
    data = rng.normal(size=(400, C))

    s40 = HighGammaExtractor(fs=FS, nb_electrodes=C)
    got40 = np.concatenate(
        [s40.extract_features(data[s:s + 40]) for s in range(0, 400, 40)]
    )
    s80 = HighGammaExtractor(fs=FS, nb_electrodes=C)
    got80 = np.concatenate(
        [s80.extract_features(data[s:s + 80]) for s in range(0, 400, 80)]
    )
    # A >=50-sample first packet is NOT zero-padded (case 1), so the
    # 80-packet stream's frame j covers filtered[10j : 10j+50], while the
    # 40-packet stream's warm start shifts everything by one frame:
    # its frame k (k >= 1) covers filtered[10(k-1) : 10(k-1)+50].
    n = min(len(got40) - 1, len(got80))
    np.testing.assert_allclose(got40[1:1 + n], got80[:n], atol=1e-3)


def test_jitted_packet_step_matches_stateful(rng):
    """The pure jitted packet_step (with warm-up dropping) reproduces the
    stateful extract_features stream."""
    C = 4
    P = 40
    data = rng.normal(size=(240, C)).astype(np.float32)

    stateful = HighGammaExtractor(fs=FS, nb_electrodes=C)
    want = np.concatenate(
        [stateful.extract_features(data[s:s + P]) for s in range(0, 240, P)]
    )

    pure = HighGammaExtractor(fs=FS, nb_electrodes=C)
    state = pure.init_state()
    outs = []
    for i, s in enumerate(range(0, 240, P)):
        feats, state = pure.packet_step(state, data[s:s + P])
        feats = np.asarray(feats)
        if i == 0:
            feats = feats[pure.warmup_frames(P):]
        outs.append(feats)
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extractor_with_transforms(rng):
    """Pre/post transforms compose in order."""
    C = 4
    data = rng.normal(size=(300, 2 * C))
    take_even = lambda x: x[..., ::2]
    scale = lambda x: x * 2.0
    ex = HighGammaExtractor(
        fs=FS, nb_electrodes=C, pre_transforms=[take_even],
        post_transforms=[scale],
    )
    got = ex.extract_features(data)

    plain = HighGammaExtractor(fs=FS, nb_electrodes=C)
    want = 2.0 * plain.extract_features(data[:, ::2])
    np.testing.assert_allclose(got, want, atol=1e-5)
