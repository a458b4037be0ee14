"""Synthetic speech-like corpus generator (tools/make_synthetic_corpus.py)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
from scipy.io import wavfile

REPO = Path(__file__).resolve().parent.parent


def test_generator_writes_valid_wavs(tmp_path):
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_synthetic_corpus.py"),
         str(tmp_path), "--seconds", "8", "--seed", "3"],
        check=True, capture_output=True,
    )
    wavs = sorted(tmp_path.glob("*.wav"))
    assert len(wavs) == 2  # 8 s -> 2 x 4 s utterances
    fs, audio = wavfile.read(wavs[0])
    assert fs == 16000
    assert audio.dtype == np.int16
    assert len(audio) == 4 * 16000
    # Audible but not clipped, and with both activity and pauses.
    peak = np.abs(audio).max()
    assert 3000 < peak < 32768
    frame_rms = np.sqrt(
        np.mean(audio[: len(audio) // 160 * 160]
                .reshape(-1, 160).astype(np.float64) ** 2, axis=1))
    assert frame_rms.min() < 0.05 * frame_rms.max()  # has quiet stretches
    assert (frame_rms > 0.1 * frame_rms.max()).mean() > 0.10  # has speech
    # Deterministic for a fixed seed.
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_synthetic_corpus.py"),
         str(tmp_path / "again"), "--seconds", "4", "--seed", "3"],
        check=True, capture_output=True,
    )
    _, audio2 = wavfile.read(tmp_path / "again" / "utt_0000.wav")
    np.testing.assert_array_equal(audio, audio2)
