"""Mel filterbank and Kaldi-style energy VAD for corpus preparation.

Parity targets: reference local/common.py:475-553 (``MelFilterBank`` with
pseudo-inverse and log-mel helpers) and :556-671 (``EnergyBasedVad``):
wav -> hann/rFFT spectrogram (50 ms window, 10 ms shift, /2^15 scaling) ->
40 log-mels -> DCT-II MFCCs -> threshold ``scale * mean(MFCC0) + thr`` with
±5-frame context and 0.6 proportion; ``.lab`` export.

These run at corpus-preparation time on acoustic audio; formulas are kept
numerically identical to the reference (numpy, float64) since they define
training labels.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.fftpack import dct


class MelFilterBank:
    """Triangular mel filterbank with best-effort (transpose) inverse."""

    def __init__(self, specSize: int, numCoefficients: int, sampleRate: float):
        numBands = int(numCoefficients)

        maxMel = self.freqToMel(sampleRate / 2.0)
        melStep = maxMel / (numBands + 1)
        melFilterEdges = np.arange(numBands + 2) * melStep

        centerIndices = [
            self.freqToBin(math.floor(self.melToFreq(m)), sampleRate, specSize)
            for m in melFilterEdges
        ]

        filterMatrix = np.zeros((numBands, specSize))
        for i in range(numBands):
            start, center, end = centerIndices[i:i + 3]
            k1 = float(center - start)
            k2 = float(end - center)
            if k1 > 0:
                up = (np.arange(start, center) - start) / k1
                filterMatrix[i][start:center] = up
            if k2 > 0:
                down = (end - np.arange(center, end)) / k2
                filterMatrix[i][center:end] = down

        self.melMatrix = filterMatrix.transpose()
        self.melMatrix = self.makeNormal(self.melMatrix / self.normSum(self.melMatrix))

        self.melInvMatrix = self.melMatrix.transpose()
        self.melInvMatrix = self.makeNormal(
            self.melInvMatrix / self.normSum(self.melInvMatrix)
        )

    @staticmethod
    def normSum(x: np.ndarray) -> np.ndarray:
        retSum = np.sum(x, axis=0)
        retSum[retSum == 0] = 1.0
        return retSum

    @staticmethod
    def fuzz(x: np.ndarray) -> np.ndarray:
        return x + 1e-7

    @staticmethod
    def freqToBin(freq: float, sampleRate: float, specSize: int) -> int:
        return int(math.floor((freq / (sampleRate / 2.0)) * specSize))

    @staticmethod
    def freqToMel(freq: float) -> float:
        return 2595.0 * math.log10(1.0 + freq / 700.0)

    @staticmethod
    def melToFreq(mel: float) -> float:
        return 700.0 * (math.pow(10.0, mel / 2595.0) - 1.0)

    @staticmethod
    def makeNormal(x: np.ndarray) -> np.ndarray:
        x[np.isnan(x)] = 0
        x[np.isinf(x)] = 0
        return x

    def toMelScale(self, spectrogram: np.ndarray) -> np.ndarray:
        return spectrogram @ self.melMatrix

    def fromMelScale(self, melSpectrogram: np.ndarray) -> np.ndarray:
        return melSpectrogram @ self.melInvMatrix

    toMels = toMelScale
    fromMels = fromMelScale

    def toLogMels(self, spectrogram: np.ndarray) -> np.ndarray:
        return self.makeNormal(np.log(self.fuzz(self.toMelScale(spectrogram))))

    def fromLogMels(self, melSpectrogram: np.ndarray) -> np.ndarray:
        return self.makeNormal(self.fromMelScale(np.exp(melSpectrogram)))


class EnergyBasedVad:
    """Kaldi-compute-vad-equivalent energy VAD on MFCC0."""

    def __init__(self, energy_threshold: float = 4,
                 energy_mean_scale: float = 1, frames_context: int = 5,
                 proportion_threshold: float = 0.6):
        self.vad_energy_threshold = energy_threshold
        self.vad_energy_mean_scale = energy_mean_scale
        self.vad_frames_context = frames_context
        self.vad_proportion_threshold = proportion_threshold
        self.mfcc_coeff = 13
        self.frame_shift = 0.01
        self.window_length = 0.05

    def from_wav(self, wav: np.ndarray, sampling_rate: int = 16000) -> np.ndarray:
        window_size = int(sampling_rate * self.window_length)
        window_shift = int(sampling_rate * self.frame_shift)
        nb_windows = math.floor((len(wav) - window_size) / window_shift) + 1

        starts = (np.arange(nb_windows) * window_shift).astype(int)
        idx = starts[:, None] + np.arange(window_size)[None, :]
        segments = np.asarray(wav)[idx] / (2 ** 15)

        win = np.hanning(window_size)
        spectrogram = np.fft.rfft(win * segments, axis=1)

        mfb = MelFilterBank(spectrogram.shape[1], 40, sampling_rate)
        log_mels = mfb.toLogMels(np.abs(spectrogram))
        return self.from_log_mels(log_mels=log_mels)

    def from_log_mels(self, log_mels: np.ndarray) -> np.ndarray:
        self.mfccs = dct(log_mels)[:, : self.mfcc_coeff + 2]
        return self.from_mfccs(self.mfccs)

    def from_mfccs(self, mfccs: np.ndarray) -> np.ndarray:
        self.mfccs = mfccs
        return self._compute_vad()

    def _compute_vad(self) -> np.ndarray:
        log_energy = self.mfccs[:, 0]
        n = len(self.mfccs)

        energy_threshold = self.vad_energy_threshold
        if self.vad_energy_mean_scale != 0:
            assert self.vad_energy_mean_scale > 0
            energy_threshold += self.vad_energy_mean_scale * \
                np.sum(log_energy) / n

        assert self.vad_frames_context >= 0
        assert 0.0 < self.vad_proportion_threshold < 1

        # Window [t - ctx, t + ctx) — the reference's asymmetric range.
        ctx = self.vad_frames_context
        above = (log_energy > energy_threshold).astype(np.float64)
        output = np.empty(n, dtype=bool)
        for t in range(n):
            lo = max(0, t - ctx)
            hi = min(n, t + ctx)
            den = hi - lo
            num = above[lo:hi].sum()
            output[t] = num >= den * self.vad_proportion_threshold
        return output

    def convert_vad_to_lab(self, filename: str, vad: np.ndarray) -> None:
        last_i = None
        s = None
        rows = ""
        for t, i in enumerate(vad):
            if last_i is None:
                last_i = i
                s = 0
            if i != last_i:
                e = t * self.frame_shift
                rows += f"{s:.2f}\t{e:.2f}\t{int(last_i)}\n"
                s = t * self.frame_shift
                last_i = i
        rows += f"{s:.2f}\t{len(vad) * self.frame_shift:.2f}\t{int(last_i)}\n"
        with open(filename, "w+") as f:
            f.write(rows)
