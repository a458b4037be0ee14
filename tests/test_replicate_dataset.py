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


def test_speech_day_carries_keyword_audio_and_patterns(tmp_path):
    """--speech sessions: the audio track holds real keyword speech at the
    trial spans, ECoG channels follow keyword-specific gain patterns, and
    word_order metadata round-trips through the segment->word mapper."""
    from make_replicate_dataset import (
        _keyword_bank,
        _keyword_patterns,
        make_speech_keyword_day,
        make_speech_online_session,
    )

    rng = np.random.default_rng(2)
    bank = _keyword_bank()
    patterns = _keyword_patterns()
    assert set(bank) == set(patterns)

    make_speech_keyword_day(tmp_path, rng, bank, patterns, reps=1)
    mat = BCI2000MatFile(str(tmp_path / "KeywordReading_Overt_R01.mat"))
    trials = mat.trial_indices()
    assert len(trials) == 6
    from scipy.io import wavfile

    fs, audio = wavfile.read(tmp_path / "KeywordReading_Overt_R01.wav")
    assert fs == 16000
    # Speech is loud inside trial spans (words start 1.5 s in — the
    # leading-silence shoulder the streaming nVAD needs), room tone
    # outside.
    _, start, stop = trials[0]
    w0 = start * 16 + int(1.5 * 16000)
    span = audio[w0: w0 + len(bank["enter"])]
    assert np.abs(span).max() > 8000
    lead = audio[: start * 16 - 16000]
    assert np.abs(lead).max() < 500
    shoulder = audio[start * 16: w0 - 1600]
    assert np.abs(shoulder).max() < 500

    words, spans, seconds = make_speech_online_session(
        tmp_path, rng, bank, patterns)
    assert len(words) == 6 and len(spans) == 6

    # The mapper resolves looped-replay segment times back to words.
    import json

    from score_speech_run import map_segments_to_words

    run = tmp_path / "run"
    run.mkdir()
    lab = []
    for k, ((t0, t1), w) in enumerate(zip(spans, words)):
        # one segment in-loop 0 and one in loop 1 (time + session length)
        lab.append(f"{t0 + 0.2:.2f}\t{t0 + 1.0:.2f}\t\"80 frames\"")
    lab.append(f"{spans[0][0] + seconds + 0.2:.2f}"
               f"\t{spans[0][0] + seconds + 1.0:.2f}\t\"80 frames\"")
    lab.append("990.00\t991.00\t\"100 frames\"")  # spurious
    (run / "log.vad.lab").write_text("\n".join(lab) + "\n")
    order = {"session_seconds": seconds,
             "words": [{"word": w, "t0": t0, "t1": t1}
                       for w, (t0, t1) in zip(words, spans)]}
    mapping, skipped = map_segments_to_words(str(run), order)
    assert [w for _, w in mapping[:6]] == words
    assert mapping[6][1] == words[0]  # loop-1 segment wraps to word 0
    assert skipped == 1
