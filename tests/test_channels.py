"""Channel-map tests: permutation invariants from the reference constants."""

import numpy as np

from dss_tpu.utils import (
    BOTH_GRIDS_ORDER,
    IMG_LAYOUT,
    SPEECH_AREA_CHANNELS,
    SelectElectrodesFromBothGrids,
    SelectElectrodesOverSpeechAreas,
    default_layout,
    motor_grid,
    speech_grid,
)


def test_both_grids_is_permutation():
    assert sorted(BOTH_GRIDS_ORDER.tolist()) == list(range(128))


def test_speech_area_count_and_exclusions():
    # 68-entry map minus bad channels 19/38/48/52 -> 64 decoded channels.
    assert len(SPEECH_AREA_CHANNELS) == 64
    for bad in (19, 38, 48, 52):
        assert (bad - 1) not in SPEECH_AREA_CHANNELS
    assert np.all(np.diff(SPEECH_AREA_CHANNELS) > 0)  # sorted, unique


def test_img_layout_is_permutation():
    assert sorted(IMG_LAYOUT.tolist()) == list(range(128))


def test_selectors_gather(rng):
    data = rng.normal(size=(7, 128))
    both = SelectElectrodesFromBothGrids()
    speech = SelectElectrodesOverSpeechAreas()
    np.testing.assert_array_equal(both(data), data[:, BOTH_GRIDS_ORDER])
    np.testing.assert_array_equal(speech(data), data[:, SPEECH_AREA_CHANNELS])
    assert len(both) == 128
    assert len(speech) == 64


def test_grid_definitions():
    sg, mg = speech_grid(), motor_grid()
    assert sg.shape == (8, 8) and mg.shape == (8, 8)
    assert sorted(sg.flatten().tolist()) == list(range(1, 65))
    assert sorted(mg.flatten().tolist()) == list(range(65, 129))
    # Row-flipped: channel 1 sits in the last row.
    assert sg[7, 0] == 1 and mg[7, 0] == 65
    assert np.array_equal(default_layout(), np.arange(1, 129))
