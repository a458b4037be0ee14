"""Dataset tests: trial boundary recovery from sign-alternating ids,
transforms, padded batching."""

import numpy as np

from dss_tpu.train.dataset import (
    SequentialSpeechTrials,
    padded_batches,
    run_boundaries,
    squeeze_trial_ids,
)
from dss_tpu.utils import save_data_to_hdf


def _make_corpus(tmp_path, trials=((3, 4), (-3, 4), (5, 2))):
    """trials: (stimulus_code, num_frames). Codes alternate sign per the
    corpus-preparation contract."""
    trial_ids = np.concatenate(
        [np.full(n, code, np.int16) for code, n in trials]
    )
    T = len(trial_ids)
    hga = np.arange(T * 4, dtype=np.float32).reshape(T, 4)
    lpc = np.arange(T * 20, dtype=np.float32).reshape(T, 20)
    vad = (np.arange(T) % 2).astype(np.float32)
    path = tmp_path / "2022_11_04"
    path.mkdir()
    fn = path / "KeywordReading_Overt_R01.hdf"
    save_data_to_hdf(str(fn), dict(hga_activity=hga, lpc_coefficients=lpc,
                                   vad_labels=vad, trial_ids=trial_ids))
    return str(fn), trial_ids


def test_run_boundaries():
    seq = np.array([4, 4, 4, 3, 3, -3, -3, 5])
    assert run_boundaries(seq) == [(0, 3), (3, 5), (5, 7), (7, 8)]


def test_squeeze_trial_ids():
    seq = np.array([4, 4, 3, 3, -3, -3, 5, 5])
    assert squeeze_trial_ids(seq) == [4, 3, 3, 5]


def test_dataset_trials(tmp_path):
    fn, ids = _make_corpus(tmp_path)
    ds = SequentialSpeechTrials([fn])
    assert len(ds) == 3
    x, y = ds[1]
    assert x.shape == (4, 4) and y.shape == (4, 20)
    # Trial 1 is frames 4..8 of the file.
    np.testing.assert_array_equal(x[0], np.arange(16, 20))
    assert ds.trial_labels == [3, 3, 5]


def test_dataset_vad_target_and_transform(tmp_path):
    fn, _ = _make_corpus(tmp_path)
    take2 = lambda a: a[:, :2]
    ds = SequentialSpeechTrials([fn], transform=take2,
                                target_specifier="vad_labels")
    x, y = ds[0]
    assert x.shape == (4, 2)
    assert y.shape == (4,)


def test_padded_batches(tmp_path):
    fn, _ = _make_corpus(tmp_path, trials=((1, 7), (2, 60), (3, 55), (-3, 20)))
    ds = SequentialSpeechTrials([fn])
    batches = list(padded_batches(ds, batch_size=2, length_multiple=50))
    assert len(batches) == 2
    for x, y, m in batches:
        assert x.shape[1] % 50 == 0
        assert m.shape == x.shape[:2]
        # Masked region is zero.
        assert np.all(x[m == 0] == 0)
    # Total valid frames preserved.
    total = sum(int(m.sum()) for _, _, m in batches)
    assert total == 7 + 60 + 55 + 20
