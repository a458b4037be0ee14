"""Corpus preparation: features + targets from recorded sessions.

Parity target: reference prepare_corpus.py — per (mat, wav) recording pair
and per trial (with min length 2.5 s and +0.04 s pad):
  * high-gamma features (fresh extractor per trial);
  * LPC targets from the time-aligned wav (-3 dB peak normalization except
    SILENCE trials, 16 ms filter-delay shift, frame crop [3:-1]);
  * energy-VAD labels (zeroed for SILENCE, per-trial debug PNGs);
  * sign-alternating trial_ids;
  * z-scoring with per-day SyllableRepetition statistics;
written as HDF containers {hga_activity, lpc_coefficients, vad_labels,
trial_ids} mirroring the reference layout byte-for-byte in structure.
"""

import argparse
import logging
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.ops import (  # noqa: E402
    BadChannelCorrection,
    CommonAverageReferencing,
    HighGammaExtractor,
)
from dss_tpu.ops.mel import EnergyBasedVad  # noqa: E402
from dss_tpu.utils import (  # noqa: E402
    BCI2000MatFile,
    ExperimentMapping,
    SelectElectrodesFromBothGrids,
    default_layout,
    motor_grid,
    peak_normalize,
    read_wav,
    save_data_to_hdf,
    speech_grid,
)
from dss_tpu.vocoder import LPCFeatureEncoder  # noqa: E402

logger = logging.getLogger("prepare_corpus.py")


def get_feature_extractor(cleaned_mat_file: BCI2000MatFile) -> HighGammaExtractor:
    """Both-grids reorder + CAR pre-transforms; bad/contaminated channel
    patching post-transform when the recording flags contaminated channels
    (reference prepare_corpus.py:147-176)."""
    fs = cleaned_mat_file.fs
    bad_channels = cleaned_mat_file.bad_channels()
    contaminated_channels = cleaned_mat_file.contaminated_channels()

    feature_selection = SelectElectrodesFromBothGrids()
    pre_transforms = [feature_selection]

    car = CommonAverageReferencing(
        exclude_channels=[19, 38, 48, 52],
        grids=[speech_grid(), motor_grid()],
        layout=default_layout(),
    )
    pre_transforms.append(car)
    post_transforms = None

    if contaminated_channels is not None:
        logger.debug(
            f"Found contaminated channels in {cleaned_mat_file.mat_filename}: "
            f"{contaminated_channels}."
        )
        corrected = (bad_channels or []) + contaminated_channels
        ch_correction = BadChannelCorrection(
            bad_channels=corrected, grids=[speech_grid(), motor_grid()],
            layout=default_layout(),
        )
        post_transforms = [ch_correction]

    return HighGammaExtractor(
        fs=fs, nb_electrodes=len(feature_selection),
        pre_transforms=pre_transforms, post_transforms=post_transforms,
    )


class FeatureExtractionPipeline:
    """Extract features and targets from one (mat, wav) recording pair."""

    def __init__(self, mat_filename: Path, wav_filename: Path,
                 min_trial_length: Optional[float] = None,
                 vad_plot_dir: str = "/tmp/vad_labels"):
        self.mat_filename = mat_filename
        self.wav_filename = wav_filename
        self.min_trial_length = min_trial_length
        self.vad_plot_dir = vad_plot_dir
        self.mat = BCI2000MatFile(mat_filename=str(mat_filename))
        self.fs_audio, self.wav = read_wav(str(wav_filename))

    def _trial_audio(self, label: str, start: int, stop: int) -> np.ndarray:
        """Aligned, normalized, filter-delay-shifted trial audio."""
        start = int(start * self.fs_audio / self.mat.fs)
        stop = int(stop * self.fs_audio / self.mat.fs) + int(0.04 * self.fs_audio)
        trial_audio = self.wav[start:stop]
        if label != "SILENCE":
            trial_audio = peak_normalize(trial_audio, gain_db=-3.0)
        # Shift audio by 16 ms to account for the IIR filter group delay.
        pad = np.zeros(int(0.016 * self.fs_audio), dtype=np.int16)
        return np.hstack([pad, trial_audio[:-len(pad)]])

    def get_features(self, show_pbar: bool = False) -> np.ndarray:
        del show_pbar
        features = []
        ecog = self.mat.signals()
        for _, start, stop in self.mat.trial_indices(self.min_trial_length):
            extractor = get_feature_extractor(self.mat)
            feats = extractor.extract_features(
                ecog[start:int(stop + (0.04 * self.mat.fs)), :]
            )
            features.append(feats)
        return np.concatenate(features)

    def get_lpc_coefficients(self, norm: float = -3.0,
                             show_pbar: bool = False) -> np.ndarray:
        del norm, show_pbar
        lpc_features = []
        for label, start, stop in self.mat.trial_indices(self.min_trial_length):
            trial_audio = self._trial_audio(label, start, stop)
            encoder = LPCFeatureEncoder()
            features = encoder.compute_LPC_features(trial_audio)
            lpc_features.append(features[3:-1])
        return np.concatenate(lpc_features)

    def get_vad_labels(self, norm: float = -3.0,
                       show_pbar: bool = False) -> np.ndarray:
        del norm, show_pbar
        vad_labels = []
        for i, (label, start, stop) in enumerate(
                self.mat.trial_indices(self.min_trial_length)):
            trial_audio = self._trial_audio(label, start, stop)
            vad = EnergyBasedVad()
            labels = vad.from_wav(trial_audio, sampling_rate=self.fs_audio)
            if label == "SILENCE":
                labels = np.zeros_like(labels)
            vad_labels.append(labels)
            self._plot_vad(trial_audio, labels, i)
        return np.concatenate(vad_labels)

    def _plot_vad(self, trial_audio: np.ndarray, labels: np.ndarray,
                  index: int) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots(1, 1, num=1, clear=True)
        xs = np.linspace(0, len(trial_audio) / self.fs_audio, len(trial_audio))
        peak = np.max(np.abs(trial_audio)) or 1
        ax.plot(xs, trial_audio / peak, c="blue")
        xs = np.linspace(0, len(trial_audio) / self.fs_audio, len(labels))
        ax.plot(xs, labels, c="orange")
        mat_path = Path(self.mat.mat_filename)
        out = Path(self.vad_plot_dir) / mat_path.parent.name / \
            f"{mat_path.with_suffix('').name}_{index + 1:03d}.png"
        os.makedirs(out.parent, exist_ok=True)
        plt.savefig(out.as_posix(), dpi=72)
        plt.close(fig)

    def get_trial_ids(self) -> np.ndarray:
        """Sign-alternating stimulus codes, one run per trial: consecutive
        trials of the same stimulus alternate sign so boundaries stay
        recoverable (reference prepare_corpus.py:118-137)."""
        trial_ids = []
        stimuli = ExperimentMapping.extract_stimuli_values(self.mat.mat)

        last_code = None
        for label, start, stop in self.mat.trial_indices(self.min_trial_length):
            interval = int(stop + (0.04 * self.mat.fs)) - start
            overlap = 0.04 * self.mat.fs
            window_shift = 0.01 * self.mat.fs
            num_windows = int(np.floor((interval - overlap) / window_shift))

            code = stimuli.index(label) + 1
            if last_code is None or last_code != code:
                trial_ids.append(np.ones(num_windows) * code)
                last_code = code
            else:
                trial_ids.append(np.ones(num_windows) * code * -1)
                last_code = -code
        return np.hstack(trial_ids).astype(np.int16)

    def accumulative_audio_duration(self) -> float:
        total = sum(stop - start for _, start, stop in
                    self.mat.trial_indices(self.min_trial_length))
        return total / self.mat.fs


class ZScoresFromSyllableRepetitions(dict):
    """day -> (mean, std) of high-gamma features over SyllableRepetition
    recordings (reference prepare_corpus.py:179-199)."""

    def __init__(self, syllable_recordings: Dict[str, Path],
                 show_pbar: bool = False):
        super().__init__()
        del show_pbar
        for day, path in syllable_recordings.items():
            recording = BCI2000MatFile(mat_filename=path.as_posix())
            ecog = recording.signals()
            data = []
            for _, start, stop in recording.trial_indices():
                extractor = get_feature_extractor(recording)
                feats = extractor.extract_features(
                    ecog[start:int(stop + (0.04 * recording.fs)), :]
                )
                data.append(feats)
            normalization_data = np.concatenate(data)
            self[day] = (np.mean(normalization_data, axis=0),
                         np.std(normalization_data, axis=0))


def main(out_base_path: Path, norm_dir: Path, folders: List[Path]) -> None:
    normalization_recordings = norm_dir.glob("**/*.mat")
    syllable_repetitions = {p.parent.name: p for p in normalization_recordings}
    z_score_mapping = ZScoresFromSyllableRepetitions(
        syllable_recordings=syllable_repetitions, show_pbar=True)

    accumulative_audio_sum = 0.0
    for folder in folders:
        mat_files = list(folder.glob("**/*.mat"))
        wav_files = [m.with_suffix(".wav") for m in mat_files]

        for mat_file, wav_file in zip(mat_files, wav_files):
            if mat_file.parent.name not in z_score_mapping:
                logger.warning(
                    f"No normalization data for {mat_file.parent.name}. "
                    f"Skipping it!"
                )
                continue

            pipeline = FeatureExtractionPipeline(
                mat_filename=mat_file, wav_filename=wav_file,
                min_trial_length=2.5,
            )
            ecog = pipeline.get_features(show_pbar=True)
            targ = pipeline.get_lpc_coefficients(show_pbar=True)
            nvad = pipeline.get_vad_labels(show_pbar=True)
            tids = pipeline.get_trial_ids()
            accumulative_audio_sum += pipeline.accumulative_audio_duration()

            norm_means, norm_stds = z_score_mapping[mat_file.parent.name]
            ecog = (ecog - norm_means) / norm_stds

            out_filename = Path(os.path.join(
                out_base_path.as_posix(), mat_file.parent.name,
                mat_file.with_suffix(".hdf").name,
            ))
            os.makedirs(out_filename.parent, exist_ok=True)
            save_data_to_hdf(
                out_filename.as_posix(),
                parameters=dict(hga_activity=ecog, lpc_coefficients=targ,
                                vad_labels=nvad, trial_ids=tids),
                overwrite=True,
            )

    logger.info(
        f"Finished. Total of {accumulative_audio_sum / 60 / 60:.02f}h of "
        f"speech data."
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Prepare the speech-data corpus into features and labels "
                    "for training the neural network architectures.")
    parser.add_argument("out_dir", help="Directory for the feature/label HDF files.")
    parser.add_argument("norm_dir", help="Directory with the BCI2000 recordings used "
                                         "for normalization statistics.")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu' — offline "
                             "prep has no executor isolation; a stalled "
                             "tunneled-TPU read wedges it for minutes).")
    parser.add_argument("folders", nargs="+",
                        help="Folders containing BCI2000 recording mat files.")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
    )

    logger.info(f"python prepare_corpus.py {args.out_dir} {args.norm_dir} {args.folders}")
    main(out_base_path=Path(args.out_dir), norm_dir=Path(args.norm_dir),
         folders=[Path(f) for f in args.folders])
