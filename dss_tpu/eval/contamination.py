"""Acoustic-contamination analysis core — Python/JAX re-expression of the
reference's MATLAB stage (eval/contamination/run_contamination_analysis.m,
which drives the Roussel et al. 2020 toolbox).  Replaces MATLAB entirely:
the permutation test's 10,000 surrogates run as one vectorized device
computation instead of a serial loop.

Pipeline per day (parameters match the reference's call):
1. artifact detection — detrend with a 0.5 s moving average; a sample is an
   artifact when >= 1/10 of channels exceed 5x their MAD; +-0.5 s safety
   margin around detections;
2. spectrograms of audio and every ECoG channel — 200 ms windows at a 50 Hz
   spectrogram rate, 70-170 Hz band;
3. spectrogram correlations (audio x channel, per frequency bin) on
   artifact-free frames;
4. cross-correlations over +-0.5 s lags;
5. statistical criterion P: the dataset measure is the mean over (channel,
   frequency) of the maximum absolute lagged correlation; surrogates repeat
   the measure with the audio spectrogram circularly shifted by random
   offsets; P = fraction of surrogates >= dataset measure.

Outputs ``{day}_contamination_result.mat`` with
``out.surrogate_measures / out.dataset_measure / out.criterion_value`` —
exactly what gen_contamination_report.py consumes.
"""

import logging
import os
from pathlib import Path

import numpy as np
from scipy.io import loadmat, savemat

logger = logging.getLogger("dss_tpu.eval.contamination")

MOVING_AVERAGE_SPAN = 0.5
ARTIFACT_THRESHOLD_FACTOR = 5.0
ARTIFACT_CHANNEL_RATIO = 1.0 / 10.0
ARTIFACT_SAFETY_PERIOD = 0.5
WINDOW_DURATION = 200e-3
SPG_FS = 50
FREQ_BOUNDS = (70.0, 170.0)
MAX_TIME_LAG = 0.5
NB_SURROGATES = 10_000


def moving_average_detrend(x: np.ndarray, fs: float,
                           span: float = MOVING_AVERAGE_SPAN) -> np.ndarray:
    win = max(int(span * fs), 1)
    kernel = np.ones(win) / win
    trend = np.apply_along_axis(
        lambda c: np.convolve(c, kernel, mode="same"), 0, x
    )
    return x - trend


def detect_artifacts(ecog: np.ndarray, fs: float) -> np.ndarray:
    """Boolean per-sample artifact mask (True = artifact)."""
    detrended = moving_average_detrend(ecog, fs)
    mad = np.median(np.abs(detrended - np.median(detrended, axis=0)), axis=0)
    over = np.abs(detrended) > ARTIFACT_THRESHOLD_FACTOR * np.maximum(mad, 1e-12)
    ratio = over.mean(axis=1)
    artifact = ratio >= ARTIFACT_CHANNEL_RATIO

    # Safety margin: dilate by +-safety seconds.
    margin = int(ARTIFACT_SAFETY_PERIOD * fs)
    if margin > 0 and artifact.any():
        idx = np.flatnonzero(artifact)
        mask = np.zeros(len(artifact), dtype=bool)
        for i in idx:
            mask[max(0, i - margin):i + margin + 1] = True
        artifact = mask
    return artifact


def band_spectrogram(x: np.ndarray, fs: float):
    """Spectrogram frames at SPG_FS within FREQ_BOUNDS.

    Returns (frames [n_frames, n_freqs], freqs, frame_sample_indices)."""
    from scipy.signal import spectrogram as _spec

    nperseg = int(WINDOW_DURATION * fs)
    hop = int(fs / SPG_FS)
    f, t, Sxx = _spec(x, fs=fs, window="hann", nperseg=nperseg,
                      noverlap=nperseg - hop, axis=0, mode="magnitude")
    sel = (f >= FREQ_BOUNDS[0]) & (f <= FREQ_BOUNDS[1])
    Sxx = Sxx[sel]
    # Sxx: [freq, time] (1-D input) or [freq, channels, time] (2-D input)
    # -> time-leading: [time, freq] / [time, channels, freq].
    Sxx = np.moveaxis(Sxx, -1, 0)
    Sxx = np.moveaxis(Sxx, -1, 1) if Sxx.ndim == 3 else Sxx
    frame_centers = (t * fs).astype(int)
    return Sxx, f[sel], frame_centers


def _zscore(x: np.ndarray, axis=0) -> np.ndarray:
    mu = x.mean(axis=axis, keepdims=True)
    sd = x.std(axis=axis, keepdims=True)
    return (x - mu) / np.maximum(sd, 1e-12)


def lagged_correlation_measure(audio_spec: np.ndarray, brain_spec: np.ndarray,
                               max_lag_frames: int) -> float:
    """Mean over (channel, freq) of max |corr| over lags.

    audio_spec [T, F]; brain_spec [T, C, F].
    """
    T = audio_spec.shape[0]
    a = _zscore(audio_spec)
    b = _zscore(brain_spec)
    best = np.zeros(brain_spec.shape[1:])  # [C, F]
    for lag in range(-max_lag_frames, max_lag_frames + 1):
        if lag >= 0:
            aa = a[lag:]
            bb = b[:T - lag]
        else:
            aa = a[:T + lag]
            bb = b[-lag:]
        corr = np.abs(np.einsum("tf,tcf->cf", aa, bb) / max(len(aa), 1))
        best = np.maximum(best, corr)
    return float(best.mean()), best


def surrogate_measures(audio_spec: np.ndarray, brain_spec: np.ndarray,
                       max_lag_frames: int, n_surrogates: int,
                       seed: int = 0) -> np.ndarray:
    """Permutation distribution: circularly shift the audio spectrogram by
    random offsets (beyond the lag window) and recompute the measure.

    Vectorized on device via JAX when available; falls back to numpy.
    """
    T = audio_spec.shape[0]
    rng = np.random.default_rng(seed)
    min_shift = 2 * max_lag_frames + 1
    shifts = rng.integers(min_shift, T - min_shift, size=n_surrogates)

    try:
        import jax
        import jax.numpy as jnp

        a = jnp.asarray(_zscore(audio_spec), jnp.float32)
        b = jnp.asarray(_zscore(brain_spec), jnp.float32)

        def one(shift):
            a_s = jnp.roll(a, shift, axis=0)
            best = jnp.zeros(b.shape[1:], jnp.float32)
            for lag in range(-max_lag_frames, max_lag_frames + 1):
                if lag >= 0:
                    aa, bb = a_s[lag:], b[:T - lag]
                else:
                    aa, bb = a_s[:T + lag], b[-lag:]
                corr = jnp.abs(jnp.einsum("tf,tcf->cf", aa, bb) / aa.shape[0])
                best = jnp.maximum(best, corr)
            return best.mean()

        batched = jax.jit(jax.vmap(one))
        out = []
        for i in range(0, n_surrogates, 256):
            out.append(np.asarray(batched(jnp.asarray(shifts[i:i + 256]))))
        return np.concatenate(out)
    except Exception:
        logger.exception("JAX path failed; falling back to numpy surrogates")
        out = np.zeros(n_surrogates, np.float32)
        for i, s in enumerate(shifts):
            m, _ = lagged_correlation_measure(
                np.roll(audio_spec, int(s), axis=0), brain_spec, max_lag_frames)
            out[i] = m
        return out


def analyze_day(agg_file: Path, out_path: Path,
                nb_surrogates: int = None) -> dict:
    mat = loadmat(agg_file.as_posix(), simplify_cells=True)
    fs = float(mat["fs"])
    ecog = np.asarray(mat["ecog"], np.float64)
    audio = np.asarray(mat["audio"], np.float64).reshape(-1)

    artifact = detect_artifacts(ecog, fs)
    logger.info("%s: %.2f%% artifact samples", agg_file.name,
                100 * artifact.mean())

    brain_spec, _, centers = band_spectrogram(ecog, fs)      # [T, C, F]
    audio_spec, _, _ = band_spectrogram(audio, fs)           # [T, F]
    T = min(len(brain_spec), len(audio_spec))
    brain_spec, audio_spec = brain_spec[:T], audio_spec[:T]
    keep = ~artifact[np.clip(centers[:T], 0, len(artifact) - 1)]
    brain_spec, audio_spec = brain_spec[keep], audio_spec[keep]

    max_lag_frames = int(MAX_TIME_LAG * SPG_FS)
    dataset_measure, per_cf = lagged_correlation_measure(
        audio_spec, brain_spec, max_lag_frames)
    surrogates = surrogate_measures(
        audio_spec, brain_spec, max_lag_frames,
        NB_SURROGATES if nb_surrogates is None else nb_surrogates)
    criterion = float((surrogates >= dataset_measure).mean())

    day = agg_file.name.split("_KeywordReading")[0]
    out = dict(surrogate_measures=surrogates.astype(np.float32),
               dataset_measure=np.float32(dataset_measure),
               criterion_value=np.float32(criterion))
    savemat(os.path.join(out_path.as_posix(),
                         f"{day}_contamination_result.mat"), dict(out=out))
    logger.info("%s: measure=%.4f, P=%.4f", day, dataset_measure, criterion)
    return out
