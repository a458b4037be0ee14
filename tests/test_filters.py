"""IIR filter tests: scipy ground truth, streaming==offline equivalence,
and the parallel associative-scan path."""

import numpy as np
import scipy.signal as sig

from dss_tpu.ops import (
    design_bandpass,
    design_bandstop,
    design_hga_cascade,
    sosfilt_parallel,
    sosfilt_scan,
    sosfilt_zi,
    zero_zi,
)

FS = 1000


def _signal(rng, T=400, C=4):
    return rng.normal(size=(T, C)).astype(np.float32)


def test_design_matches_scipy_butter():
    sos = design_bandpass(FS, 70, 170, order=8)
    ref = sig.butter(8, [70, 170], btype="bandpass", fs=FS, output="sos")
    np.testing.assert_allclose(sos, ref)
    assert sos.shape == (8, 6)
    sos = design_bandstop(FS, 118, 122, order=8)
    assert sos.shape == (8, 6)
    cascade = design_hga_cascade(FS)
    assert cascade.shape == (16, 6)


def test_scan_matches_scipy_sosfilt(rng):
    x = _signal(rng)
    sos = design_bandpass(FS, 70, 170)
    zi = sosfilt_zi(sos, x.shape[1])
    y_ref, zf_ref = sig.sosfilt(sos, x.astype(np.float64), axis=0, zi=zi)
    y, zf = sosfilt_scan(sos, x, zi.astype(np.float32))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(zf), zf_ref, atol=2e-4)


def test_parallel_matches_scan(rng):
    x = _signal(rng, T=333)
    sos = design_hga_cascade(FS)
    zi = zero_zi(sos, x.shape[1]).astype(np.float32)
    y_scan, zf_scan = sosfilt_scan(sos, x, zi)
    y_par, zf_par = sosfilt_parallel(sos, x, zi)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_scan), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zf_par), np.asarray(zf_scan), atol=2e-5)


def test_streaming_equals_offline(rng):
    """Chunked filtering with carried state == one offline pass."""
    x = _signal(rng, T=200)
    sos = design_hga_cascade(FS)
    zi = np.concatenate(
        [sosfilt_zi(design_bandpass(FS, 70, 170), x.shape[1]),
         sosfilt_zi(design_bandstop(FS, 118, 122), x.shape[1])], axis=0
    ).astype(np.float32)

    y_full, _ = sosfilt_scan(sos, x, zi)

    chunks = []
    state = zi
    for start in range(0, 200, 40):
        y, state = sosfilt_scan(sos, x[start:start + 40], state)
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(chunks), np.asarray(y_full), atol=1e-5
    )


def test_cascade_equals_two_pass(rng):
    """Concatenated SOS cascade == band-pass then band-stop applied in series
    with independent states (the reference's formulation)."""
    x = _signal(rng, T=150, C=3).astype(np.float64)
    bp = design_bandpass(FS, 70, 170)
    bs = design_bandstop(FS, 118, 122)
    zbp = sosfilt_zi(bp, 3)
    zbs = sosfilt_zi(bs, 3)

    y1, _ = sig.sosfilt(bp, x, axis=0, zi=zbp)
    y2, _ = sig.sosfilt(bs, y1, axis=0, zi=zbs)

    cascade = np.concatenate([bp, bs], axis=0)
    zi = np.concatenate([zbp, zbs], axis=0)
    y_casc, _ = sig.sosfilt(cascade, x, axis=0, zi=zi)
    np.testing.assert_allclose(y_casc, y2, atol=1e-12)
