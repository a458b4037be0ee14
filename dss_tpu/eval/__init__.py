"""Evaluation-layer core logic (figure scripts live in eval/ at the repo
root; the analysis math lives here so it is importable and testable)."""

from .contamination import (
    analyze_day,
    band_spectrogram,
    detect_artifacts,
    lagged_correlation_measure,
    surrogate_measures,
)
from .quality import (
    QualityReport,
    band_level_snr,
    cepstral_distance,
    dtw_cepstral_distance,
    keyword_id_accuracy,
    score,
    score_roundtrip,
    stoi,
)

__all__ = [
    "analyze_day",
    "band_spectrogram",
    "detect_artifacts",
    "lagged_correlation_measure",
    "surrogate_measures",
    "QualityReport",
    "band_level_snr",
    "cepstral_distance",
    "dtw_cepstral_distance",
    "keyword_id_accuracy",
    "score",
    "score_roundtrip",
    "stoi",
]
