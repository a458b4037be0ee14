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


def _word(f0, formants, seconds=0.45, seed=0):
    """Synthetic 'keyword': pitched stack under a two-formant envelope."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    sig = np.zeros_like(t)
    for k in range(1, 60):
        f = k * f0
        if f > 7000:
            break
        env = sum(np.exp(-0.5 * ((f - fm) / 250.0) ** 2)
                  for fm in formants) + 0.01
        sig += env * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig *= 0.25 / np.max(np.abs(sig))
    return sig.astype(np.float32)


def test_stoi_identity_and_noise():
    from dss_tpu.eval.quality import stoi

    x = _speechlike(seconds=1.0)
    assert stoi(x, x) > 0.99
    rng = np.random.default_rng(3)
    noise = (0.25 * rng.normal(size=x.shape)).astype(np.float32)
    assert stoi(x, noise) < 0.35
    # Mild distortion sits between the two.
    mild = x + 0.02 * rng.normal(size=x.shape).astype(np.float32)
    assert stoi(x, noise) < stoi(x, mild) <= 1.0


def test_dtw_cepstral_distance_alignment():
    from dss_tpu.eval.quality import dtw_cepstral_distance

    a = _word(120.0, (400, 1800))
    # Same word, slightly time-stretched (DTW should absorb the warp).
    stretched = np.interp(
        np.linspace(0, len(a) - 1, int(len(a) * 1.15)),
        np.arange(len(a)), a).astype(np.float32)
    other = _word(150.0, (800, 3000), seed=5)
    d_same = dtw_cepstral_distance(a, stretched)
    d_diff = dtw_cepstral_distance(a, other)
    assert d_same < d_diff / 2, (d_same, d_diff)


def test_keyword_id_accuracy():
    from dss_tpu.eval.quality import keyword_id_accuracy

    words = {
        "left": _word(110.0, (300, 2200), seed=1),
        "right": _word(130.0, (700, 1100), seed=2),
        "up": _word(150.0, (450, 3400), seed=3),
    }
    rng = np.random.default_rng(7)
    resyn = {w: (v + 0.004 * rng.normal(size=v.shape)).astype(np.float32)
             for w, v in words.items()}
    assert keyword_id_accuracy(words, resyn) == 1.0
    # Degenerate resyntheses cannot beat chance systematically: noise for
    # every word maps them all to whichever original is nearest.
    noise = {w: (0.2 * rng.normal(size=v.shape)).astype(np.float32)
             for w, v in words.items()}
    assert keyword_id_accuracy(words, noise) <= 2.0 / 3.0


def test_keyword_id_report_unknown_word_counts_as_error():
    """A resynthesis keyed by a word absent from the originals (e.g. a
    typo'd --syn-dir entry) must be scored as an error, not crash the
    confusion-matrix accounting (advisor r3)."""
    from dss_tpu.eval.quality import keyword_id_report

    words = {
        "left": _word(110.0, (300, 2200), seed=1),
        "right": _word(130.0, (700, 1100), seed=2),
    }
    resyn = dict(words)
    resyn["mystery"] = _word(150.0, (450, 3400), seed=3)
    rep = keyword_id_report(words, resyn)
    assert rep["accuracy"] == 2.0 / 3.0
    assert sum(rep["confusion"]["mystery"].values()) == 1
    m = next(r for r in rep["margins"] if r["word"] == "mystery")
    assert np.isnan(m["own_d"])
