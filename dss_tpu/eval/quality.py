"""Vocoder audio-quality regression metrics.

The reference ships no objective audio metric — vocoder quality is judged
by listening tests and the paper's correlation analyses.  For automated
regression we need a number: this module scores synthesized audio against
a reference waveform in the vocoder's own analysis domain (18 Bark-scale
cepstra from :mod:`dss_tpu.vocoder.features`), so the metric is sensitive
to exactly the envelope information the vocoder is supposed to carry and
insensitive to phase, which no LPC vocoder preserves.

Metrics
-------
``cepstral_distance``     Mean log-spectral distance in dB over the 18
                          Bark bands, framewise over aligned 10 ms frames.
                          Band energies are floored at -20 dB below each
                          frame's peak band so empty bands (where log
                          energy is numerical noise) don't dominate.
``band_level_snr``        SNR of per-frame floored log band energies (dB)
                          — a coarser, more interpretable envelope match.
``score_roundtrip``       Encode -> synthesize -> score, the standing
                          regression check for a vocoder backend.

Both accept int16 or float [-1, 1] PCM at 16 kHz.  Framewise comparison
assumes equal length (synthesis output of the same features guarantees
this); no DTW is applied, by design — vocoder regression compares
time-aligned signals.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from ..vocoder.features import LPCFeatureEncoder
from ..vocoder.lpc import DCT_MATRIX, NB_BANDS

# Bands more than this far below the frame's peak band are floored before
# the distance is taken (they carry no perceptual envelope information, and
# their log energies are numerically unstable for spectrally sparse audio).
_FLOOR_DB = 20.0


def _to_float(audio: np.ndarray) -> np.ndarray:
    audio = np.asarray(audio)
    if np.issubdtype(audio.dtype, np.integer):
        return audio.astype(np.float32) / 32768.0
    return audio.astype(np.float32)


def _log_bands(audio: np.ndarray) -> np.ndarray:
    """[T] PCM -> [N, 18] floored log10 band energies via the encoder.

    The encoder emits cepstra (DCT of log10 band energies,
    dss_tpu/vocoder/lpc.py:109); the DCT is inverted here and a per-frame
    dynamic floor applied.
    """
    enc = LPCFeatureEncoder()
    feats = enc.compute_LPC_features(_to_float(audio))
    log_e = feats[:, :NB_BANDS] @ DCT_MATRIX  # invert the orthonormal DCT
    peak = np.max(log_e, axis=1, keepdims=True)
    return np.maximum(log_e, peak - _FLOOR_DB / 10.0)


class QualityReport(NamedTuple):
    cepstral_distance_db: float   # mean MCD over frames (lower is better)
    band_level_snr_db: float      # envelope SNR (higher is better)
    num_frames: int


def _aligned_log_bands(reference, synthesized, skip_frames):
    lb_ref = _log_bands(reference)
    lb_syn = _log_bands(synthesized)
    n = min(len(lb_ref), len(lb_syn))
    if n <= skip_frames:
        raise ValueError(f"need more than {skip_frames} frames, got {n}")
    return lb_ref[skip_frames:n], lb_syn[skip_frames:n]


def cepstral_distance(reference: np.ndarray, synthesized: np.ndarray,
                      skip_frames: int = 2) -> float:
    """Mean log-spectral distance (dB) over Bark bands between waveforms.

    Per frame: ``sqrt(mean_b (10 * dlog10 E_b)^2)``, then averaged over
    frames.  ``skip_frames`` leading frames are excluded: the synthesis
    filter and the encoder history both start from silence, so the first
    frames compare transients, not steady-state quality.
    """
    lb_ref, lb_syn = _aligned_log_bands(reference, synthesized, skip_frames)
    d_db = 10.0 * (lb_ref - lb_syn)
    return float(np.mean(np.sqrt(np.mean(d_db * d_db, axis=1))))


def band_level_snr(reference: np.ndarray, synthesized: np.ndarray,
                   skip_frames: int = 2) -> float:
    """SNR (dB) of floored log band energies (mean-removed per signal)."""
    lb_ref, lb_syn = _aligned_log_bands(reference, synthesized, skip_frames)
    sig = lb_ref - lb_ref.mean()
    err = lb_ref - lb_syn
    return 10.0 * math.log10(
        max(float(np.sum(sig * sig)), 1e-12)
        / max(float(np.sum(err * err)), 1e-12)
    )


def score(reference: np.ndarray, synthesized: np.ndarray,
          skip_frames: int = 2) -> QualityReport:
    lb_ref, lb_syn = _aligned_log_bands(reference, synthesized, skip_frames)
    d_db = 10.0 * (lb_ref - lb_syn)
    lsd = float(np.mean(np.sqrt(np.mean(d_db * d_db, axis=1))))
    sig = lb_ref - lb_ref.mean()
    err = lb_ref - lb_syn
    snr = 10.0 * math.log10(
        max(float(np.sum(sig * sig)), 1e-12)
        / max(float(np.sum(err * err)), 1e-12)
    )
    return QualityReport(cepstral_distance_db=lsd, band_level_snr_db=snr,
                         num_frames=len(lb_ref))


def score_roundtrip(audio: np.ndarray, vocoder) -> QualityReport:
    """Encode ``audio``, synthesize with ``vocoder``, score against input.

    ``vocoder`` is any object with the LPCNet ``synthesize_frames`` (or
    per-frame ``synthesize``) contract: [T, 20] float32 -> int16 [T*160].
    """
    enc = LPCFeatureEncoder()
    feats = enc.compute_LPC_features(_to_float(audio))
    if hasattr(vocoder, "synthesize_frames"):
        pcm = vocoder.synthesize_frames(feats)
    else:
        pcm = np.concatenate([vocoder.synthesize(f) for f in feats])
    n = min(len(pcm), len(_to_float(audio)))
    return score(_to_float(audio)[:n], pcm[:n])
