"""Vocoder quality metric: identity, discrimination, and the DSP-vocoder
round-trip regression bound (the framework's substitute for the reference's
listening-based quality checks)."""

import numpy as np
import pytest

from dss_tpu.eval.quality import (
    band_level_snr,
    cepstral_distance,
    score,
    score_roundtrip,
)
from dss_tpu.vocoder.dsp import LPCVocoder

FS = 16000


def _speechlike(seconds=1.0, f0=125.0, seed=0):
    """Pitched harmonic stack with a slow spectral-envelope sweep."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    sig = np.zeros_like(t)
    for k in range(1, 24):
        f = k * f0
        if f > 6000:
            break
        env = np.exp(-f / (1500.0 + 1000.0 * np.sin(2 * np.pi * 1.3 * t)))
        sig += env * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig *= 0.25 / np.max(np.abs(sig))
    return sig.astype(np.float32)


def test_identity_is_zero():
    x = _speechlike()
    assert cepstral_distance(x, x) == pytest.approx(0.0, abs=1e-5)
    assert band_level_snr(x, x) > 60.0


def test_discriminates_noise_from_perturbation():
    x = _speechlike()
    rng = np.random.default_rng(1)
    slight = x + 0.002 * rng.normal(size=x.shape).astype(np.float32)
    noise = (0.25 * rng.normal(size=x.shape)).astype(np.float32)
    d_slight = cepstral_distance(x, slight)
    d_noise = cepstral_distance(x, noise)
    # Empirical: ~1.2 dB vs ~25 dB.
    assert d_slight < d_noise / 4, (d_slight, d_noise)


def test_dsp_vocoder_roundtrip_bound():
    """Standing regression: the deterministic backend must reconstruct the
    envelope of a speech-like signal far better than degenerate outputs."""
    x = _speechlike(seconds=1.0)
    report = score_roundtrip(x, LPCVocoder())
    assert report.num_frames >= 90
    # Empirical reference point: ~18.4 dB on this spectrally sparse signal
    # (the pulse-train excitation fills between-harmonic bands); the bound
    # catches gross regressions — silence scores ~60 dB, noise ~25 dB.
    assert report.cepstral_distance_db < 22.0, report
    d_silence = score(x, np.zeros_like(x)).cepstral_distance_db
    assert report.cepstral_distance_db < d_silence / 2, (report, d_silence)


def test_short_input_raises():
    x = _speechlike(seconds=0.02)  # 320 samples -> 2 frames
    with pytest.raises(ValueError):
        cepstral_distance(x, x)
