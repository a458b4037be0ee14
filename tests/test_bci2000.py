"""BCI2000 wrapper and experiment parser tests on synthetic recordings."""

import numpy as np
import pytest
from scipy.io import savemat

from dss_tpu.utils import (
    BCI2000MatFile,
    ExperimentMapping,
    KeywordReading,
    LeaveOneDayOut,
    SyllableRepetition,
    peak_normalize,
)


def _save_recording(path, stimulus_code, stimuli, fs=1000, n_channels=4):
    T = len(stimulus_code)
    rng = np.random.default_rng(0)
    mat = {
        "signal": rng.normal(size=(T, n_channels)),
        "parameters": {
            "SamplingRate": {"NumericValue": fs},
            "SourceChGain": {"NumericValue": np.full(n_channels, 2.0)},
            "Stimuli": {"Value": np.array([stimuli])},
        },
        "states": {"StimulusCode": stimulus_code},
    }
    savemat(str(path), mat)
    return mat


def test_keyword_reading_trials():
    code = np.array([0] * 10 + [1] * 20 + [0] * 10 + [2] * 20 + [0] * 10)
    exp = KeywordReading(code, ["Enter", "Right"])
    trials = exp.get_trial_indices()
    assert trials == [("Enter", 10, 30), ("Right", 40, 60)]
    assert exp.get_stimuli_indices() == trials
    # Baseline windows: 0.8 s before each stimulus.
    bl = exp.get_webfm_baseline_windows(fs=10)
    assert bl == [("BL", 2, 10), ("BL", 32, 40)]


def test_syllable_repetition_relabeling():
    # presentation (code) then speaking (0), twice; final speaking span has
    # no trailing change point and is appended with the canonical length.
    code = np.array([0] * 5 + [1] * 10 + [0] * 15 + [2] * 10 + [0] * 15)
    exp = SyllableRepetition(code, ["ba", "da"])
    trials = exp.get_trial_indices()
    # Speaking spans: [15, 30) labeled "ba"; [40, 55) labeled "da" (appended
    # using the first speaking span's length, 15).
    assert trials == [("ba", 15, 30), ("da", 40, 55)]
    stimuli = exp.get_stimuli_indices()
    assert stimuli == [("ba", 5, 15), ("da", 30, 40)]


def test_experiment_mapping():
    assert ExperimentMapping.get_experiment_class("KeywordReading_R01.mat") \
        is KeywordReading
    assert ExperimentMapping.get_experiment_class("KeywordSynthesis_R01.mat") \
        is KeywordReading
    assert ExperimentMapping.get_experiment_class(
        "SyllableRepetition_Overt.mat") is SyllableRepetition
    assert ExperimentMapping.get_experiment_class("Unknown.mat") is None


def test_mat_file_wrapper(tmp_path):
    code = np.array([0] * 10 + [1] * 20 + [0] * 10, dtype=np.int16)
    path = tmp_path / "KeywordReading_Overt_R01.mat"
    mat = _save_recording(path, code, ["Enter"])
    wrapper = BCI2000MatFile(str(path))
    assert wrapper.fs == 1000
    np.testing.assert_allclose(wrapper.signals(), mat["signal"] * 2.0)
    assert wrapper.bad_channels() is None
    trials = wrapper.trial_indices()
    assert trials == [("Enter", 10, 30)]
    # Minimum trial length extension.
    trials = wrapper.trial_indices(min_trial_length=0.05)
    assert trials == [("Enter", 10, 60)]
    assert wrapper.ordered_stimulus_codes() == [1]


def test_leave_one_day_out():
    days = ["2022_11_04", "2022_09_22", "2022_10_05"]
    folds = list(LeaveOneDayOut().split(days))
    assert folds[0] == (["2022_10_05", "2022_11_04"], "2022_09_22")
    assert len(folds) == 3
    folds = list(LeaveOneDayOut().split(days, start_with_day="2022_10_05"))
    assert folds[0][1] == "2022_10_05"
    with pytest.raises(ValueError):
        next(LeaveOneDayOut().split(days, start_with_day="1999_01_01"))


def test_peak_normalize():
    audio = np.array([0, 8192, -16384], np.int16)
    out = peak_normalize(audio, headroom_db=0.0, gain_db=-3.0)
    # Peak scaled to full scale then -3 dB: 32768 * 10^(-3/20) ~ 23197.
    assert abs(int(out[2]) + 23198) <= 1
    assert out[1] == -out[2] // 2 or abs(int(out[1]) - 11599) <= 1
    # Silence passes through.
    np.testing.assert_array_equal(
        peak_normalize(np.zeros(5, np.int16)), np.zeros(5, np.int16)
    )


def test_trial_indices_to_lab(tmp_path):
    from dss_tpu.utils import Experiment

    fn = tmp_path / "trials.lab"
    Experiment.trial_indices_to_lab(
        str(fn), [("Enter", 1000, 3000), ("Right", 4000, 6000)], fs=1000)
    assert fn.read_text() == "1.000\t3.000\tEnter\n4.000\t6.000\tRight\n"


def test_experiment_run_indices():
    code = np.array([0] * 10 + [1] * 20 + [0] * 10 + [2] * 20 + [0] * 10)
    exp = KeywordReading(code, ["Enter", "Right"])
    name, start, stop = exp.get_experiment_run_indices()
    assert start == 10  # first code change
    assert stop == 60   # last trial's end
