"""Replicate-demo dataset generator: structural + learnability contracts.

The full pipeline run (all 8 replicate.sh stages on this tree) is the
manual integration demo; these tests pin the properties that made it work:
parseable BCI2000 sessions, and quiet shoulders INSIDE each trial span so
the nVAD can learn a speech/non-speech boundary (an all-loud trial span
degenerates to an always-speech VAD and the online segment assembler never
fires).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from make_replicate_dataset import (
    make_keyword_day,
    make_online_session,
    make_syllable_day,
)

from dss_tpu.utils import BCI2000MatFile


def test_keyword_day_structure(tmp_path):
    rng = np.random.default_rng(0)
    make_keyword_day(tmp_path, rng, n_trials=2)
    mat = BCI2000MatFile(str(tmp_path / "KeywordReading_Overt_R01.mat"))
    trials = mat.trial_indices()
    assert len(trials) == 2
    sig = mat.signals()
    assert sig.shape[1] == 129
    for _, start, stop in trials:
        seg = sig[start:stop, :64]
        T = stop - start
        # Quiet shoulders inside the trial: edge power << center power.
        edge = float(np.var(seg[: T // 8]))
        center = float(np.var(seg[T // 2 - T // 8: T // 2 + T // 8]))
        assert center > 100 * edge
    assert (tmp_path / "KeywordReading_Overt_R01.wav").exists()


def test_online_session_words_separated(tmp_path):
    rng = np.random.default_rng(1)
    make_online_session(tmp_path, rng, n_words=3)
    mat = BCI2000MatFile(str(tmp_path / "KeywordSynthesis_Overt_R01.mat"))
    sig = mat.signals()[:, :64]
    power = np.var(sig.reshape(-1, 100, 64), axis=(1, 2))  # 100 ms blocks
    loud = power > power.min() * 100
    # 3 separated loud spans, each bounded by >0.5 s of quiet.
    edges = np.flatnonzero(np.diff(loud.astype(int)) == 1)
    assert len(edges) == 3


def test_syllable_day_parses(tmp_path):
    rng = np.random.default_rng(2)
    make_syllable_day(tmp_path, rng, n_trials=2)
    mat = BCI2000MatFile(str(tmp_path / "SyllableRepetition_Overt.mat"))
    assert len(mat.trial_indices()) >= 1
