"""Per-channel spectrogram change vs SyllableRepetition baseline.

Parity target: reference eval/suppl_fig_2.py — for every electrode, the
speech-onset-aligned trial-average spectrogram (50 ms windows, 100 FFT bins,
0.5 s pre / 1.5 s post onset, onset from the energy VAD on the audio
channel), normalized in dB against the mean baseline spectrum from the day's
SyllableRepetition recording, laid out on the two 8x8 grids with bad
channels marked.
"""

import argparse
import logging
import math
import os
import sys
from pathlib import Path
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.io import loadmat  # noqa: E402
from scipy.signal import spectrogram  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.ops.mel import EnergyBasedVad  # noqa: E402
from dss_tpu.utils import (  # noqa: E402
    ExperimentMapping,
    SelectElectrodesFromBothGrids,
)

logger = logging.getLogger("suppl_fig_2.py")

WINDOW_SIZE = 0.05
NB_FFT_BINS = 100
PRE_ONSET = 0.5
POST_ONSET = 1.5


def _load(mat_path: Path):
    mat = loadmat(mat_path.as_posix(), simplify_cells=True)
    sel = SelectElectrodesFromBothGrids()
    gain = mat["parameters"]["SourceChGain"]["NumericValue"]
    signals = sel(mat["signal"] * gain)
    audio = mat["signal"][:, 128] * gain[128]
    fs = mat["parameters"]["SamplingRate"]["NumericValue"]
    cls = ExperimentMapping.get_experiment_class(mat_filename=str(mat_path))
    experiment = cls(mat["states"]["StimulusCode"],
                     ExperimentMapping.extract_stimuli_values(mat))
    return signals, audio, fs, experiment


def _chan_spectrogram(segment: np.ndarray, fs: float) -> np.ndarray:
    _, _, Sxx = spectrogram(
        segment, fs=fs, window="hann", nfft=NB_FFT_BINS,
        nperseg=int(WINDOW_SIZE * fs),
        noverlap=int(WINDOW_SIZE * fs - 0.01 * fs),
    )
    return Sxx


def gen_power_spectral_analysis_figure(mat_file: Path, cal_file: Path,
                                       keyword: Optional[str] = None,
                                       out_dir: Optional[Path] = None):
    cal_signals, _, cal_fs, cal_exp = _load(cal_file)
    mat_signals, mat_audio, mat_fs, mat_exp = _load(mat_file)
    n_chan = cal_signals.shape[1]

    # Baseline spectrum per channel from the calibration recording's trials.
    norm_stats = np.zeros((n_chan, NB_FFT_BINS // 2 + 1), np.float32)
    trials = cal_exp.get_trial_indices()
    for channel in range(n_chan):
        specs = [
            _chan_spectrogram(cal_signals[start:stop, channel], cal_fs)
            for _, start, stop in trials
        ]
        norm_stats[channel] = np.mean(np.concatenate(specs, axis=1), axis=-1)

    nb_pre = math.floor((PRE_ONSET * mat_fs - WINDOW_SIZE * mat_fs)
                        / (0.01 * mat_fs)) + 5
    nb_post = math.floor((POST_ONSET * mat_fs - WINDOW_SIZE * mat_fs)
                         / (0.01 * mat_fs)) + 5
    num_windows = nb_pre + nb_post

    mat_trials = [t for t in mat_exp.get_trial_indices()
                  if keyword is None or t[0] == keyword]
    onsets = []
    for label, start, stop in mat_trials:
        audio_segment = mat_audio[start:int(stop + POST_ONSET * mat_fs)]
        vad_labels = EnergyBasedVad().from_wav(audio_segment,
                                               sampling_rate=mat_fs)
        onsets.append(int(np.argmax(vad_labels)))

    chan_specs = np.zeros((n_chan, NB_FFT_BINS // 2 + 1, num_windows), np.float32)
    for channel in range(n_chan):
        trial_specs = []
        for (label, start, stop), onset in zip(mat_trials, onsets):
            seg = mat_signals[start:int(stop + POST_ONSET * mat_fs), channel]
            Sxx = _chan_spectrogram(seg, mat_fs)
            lo = onset - nb_pre
            hi = onset + nb_post
            if lo < 0 or hi > Sxx.shape[1]:
                continue
            trial_specs.append(Sxx[:, lo:hi])
        if not trial_specs:
            continue
        mean_spec = np.mean(np.stack(trial_specs), axis=0)
        baseline = norm_stats[channel][:, None]
        chan_specs[channel] = 10 * np.log10(
            np.maximum(mean_spec, 1e-20) / np.maximum(baseline, 1e-20)
        )

    # Grid layout: motor grid (65..128) on top, speech grid (1..64) below.
    upper = np.flip(np.flip((np.arange(64) + 64).reshape(8, 8)), axis=1)
    lower = np.flip(np.flip(np.arange(64).reshape(8, 8)), axis=1)
    layout = np.concatenate([upper, np.full((1, 8), np.nan), lower])

    height_ratios = np.ones(17)
    height_ratios[8] = 0.25
    fig, axes = plt.subplots(nrows=17, ncols=8,
                             gridspec_kw={"height_ratios": height_ratios},
                             figsize=(8.5, 10))
    for (row, col) in np.ndindex(layout.shape):
        ax = axes[row, col]
        ax.set_xticks([])
        ax.set_yticks([])
        idx = layout[row, col]
        if np.isnan(idx):
            for side in ("top", "bottom", "left", "right"):
                ax.spines[side].set_visible(False)
            continue
        idx = int(idx)
        ax.imshow(chan_specs[idx], aspect="auto", origin="lower",
                  cmap="RdBu_r", vmin=-5, vmax=5)
        if (idx + 1) in (19, 38, 48, 52):  # bad channels
            for side in ("top", "bottom", "left", "right"):
                ax.spines[side].set_color("red")
                ax.spines[side].set_linewidth(2)

    plt.tight_layout()
    out = (out_dir or Path(".")) / "suppl_fig_2.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out.as_posix(), dpi=200)
    logger.info("Wrote %s", out)


if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
    )
    parser = argparse.ArgumentParser(
        description="Per-channel spectrogram change vs baseline figure.")
    parser.add_argument("mat_file", help="KeywordReading recording .mat")
    parser.add_argument("cal_file", help="SyllableRepetition baseline .mat")
    parser.add_argument("--keyword", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    gen_power_spectral_analysis_figure(
        Path(args.mat_file), Path(args.cal_file), keyword=args.keyword,
        out_dir=Path(args.out) if args.out else None,
    )
