"""Application-level tests: prepare_corpus -> train VAD -> train decoder ->
baseline_offline on a synthetic multi-day corpus (replicate.sh stages 2-5
in miniature)."""

import os
import sys

import numpy as np
import pytest
from scipy.io import savemat
from scipy.io.wavfile import write as wavwrite

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

FS = 1000
FS_AUDIO = 16000


def _make_day(day_dir, n_trials=3, seed=0, kind="keyword"):
    """One day: either a KeywordReading .mat + aligned .wav pair (data dir)
    or a SyllableRepetition .mat (normalization dir)."""
    rng = np.random.default_rng(seed)
    day_dir.mkdir(parents=True, exist_ok=True)

    trial_len = 3 * FS  # satisfies min_trial_length=2.5 s
    gap = FS
    T = n_trials * (trial_len + gap) + gap
    code = np.zeros(T, np.int16)
    for i in range(n_trials):
        start = gap + i * (trial_len + gap)
        code[start:start + trial_len] = (i % 2) + 1

    signal = rng.normal(size=(T, 129))
    mat = {
        "signal": signal,
        "parameters": {
            "SamplingRate": {"NumericValue": FS},
            "SourceChGain": {"NumericValue": np.ones(129)},
            # BCI2000 stores Stimuli as a cell matrix; row 0 = captions.
            "Stimuli": {"Value": np.array(
                [["Enter", "Right"], ["1", "2"]], dtype=object)},
        },
        "states": {"StimulusCode": code},
    }
    if kind == "keyword":
        savemat(str(day_dir / "KeywordReading_Overt_R01.mat"), mat)
        audio = (rng.normal(size=int(T * FS_AUDIO / FS)) * 3000).astype(np.int16)
        wavwrite(str(day_dir / "KeywordReading_Overt_R01.wav"), FS_AUDIO, audio)
        return

    # SyllableRepetition: presentation/speaking alternation.
    sr_code = np.zeros(8 * FS, np.int16)
    sr_code[FS:2 * FS] = 1
    sr_code[3 * FS:4 * FS] = 1
    sr = dict(mat)
    sr["signal"] = rng.normal(size=(8 * FS, 129))
    sr["states"] = {"StimulusCode": sr_code}
    sr["parameters"] = dict(mat["parameters"])
    sr["parameters"]["Stimuli"] = {"Value": np.array(
        [["ba"], ["1"]], dtype=object)}
    savemat(str(day_dir / "SyllableRepetition_Overt.mat"), sr)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic 2-day corpus, prepared through the real prepare_corpus app."""
    base = tmp_path_factory.mktemp("corpus")
    data_dir = base / "KeywordReading"
    norm_dir = base / "SyllableRepetition"
    for i, day in enumerate(["2022_11_02", "2022_11_03", "2022_11_04"]):
        _make_day(data_dir / day, seed=i, kind="keyword")
        _make_day(norm_dir / day, seed=10 + i, kind="syllable")

    import prepare_corpus

    out_dir = base / "prepared"
    prepare_corpus.main(
        out_base_path=out_dir,
        norm_dir=norm_dir,
        folders=[data_dir],
    )
    return base, out_dir


def test_prepare_corpus_output(corpus):
    base, out_dir = corpus
    from dss_tpu.utils import load_hdf

    files = sorted(out_dir.rglob("*.hdf"))
    assert len(files) == 3
    data = load_hdf(str(files[0]))
    assert set(data) == {"hga_activity", "lpc_coefficients", "vad_labels",
                         "trial_ids"}
    n = len(data["trial_ids"])
    assert data["hga_activity"].shape == (n, 128)
    assert data["lpc_coefficients"].shape[1] == 20
    assert len(data["vad_labels"]) >= n - 5
    # 3 trials of alternating stimuli -> ids like [1.., 2.., 1..] (sign
    # alternation only on same-stimulus repeats).
    ids = np.unique(data["trial_ids"])
    assert set(np.abs(ids)) <= {1, 2}
    # z-scored features should be roughly standardized.
    assert abs(float(data["hga_activity"].mean())) < 1.0


def test_frame_alignment_counts(corpus):
    """hga frames == trial_ids frames == per-trial floor((T-40)/10) sums —
    the alignment contract prepare_corpus must maintain."""
    base, out_dir = corpus
    from dss_tpu.utils import load_hdf

    for f in out_dir.rglob("*.hdf"):
        data = load_hdf(str(f))
        assert len(data["hga_activity"]) == len(data["trial_ids"])


def test_train_vad_app(corpus, tmp_path):
    base, out_dir = corpus
    import train_unidirectional_vad as app

    cfg = app.TrainingConfiguration(
        nb_hidden_units=16, nb_layer=1, nb_epochs=1, batch_size=1,
        num_workers=0, truncated_sequence_length=50,
        speech_corpus_root=out_dir, out_dir=tmp_path,
        test_day="2022_11_04", valid_day="2022_11_03",
    )
    app.main(cfg)
    assert (tmp_path / "best_model.pth").exists()

    # The checkpoint loads back into the online model path.
    from dss_tpu.models import load_checkpoint

    params = load_checkpoint(str(tmp_path / "best_model.pth"), 1, False,
                             "classifier")
    assert params["classifier"]["weight"].shape == (2, 16)


def test_train_decoder_app(corpus, tmp_path):
    base, out_dir = corpus
    import train_bidirectional_model as app

    cfg = app.TrainingConfiguration(
        nb_hidden_units=12, nb_layer=1, nb_epochs=1, batch_size=1,
        num_workers=0, speech_corpus_root=out_dir, out_dir=tmp_path,
        test_day="2022_11_04", valid_day="2022_11_03",
    )
    app.main(cfg)
    assert (tmp_path / "best_model.pth").exists()
    # Per-epoch synthesis artifacts (queue is asynchronous but waited on).
    assert (tmp_path / "reco" / "reco_epoch=001.npy").exists()
    assert (tmp_path / "reco" / "reco_epoch=001.wav").exists()
    assert (tmp_path / "orig" / "orig.wav").exists()


def test_baseline_offline_app(corpus, tmp_path):
    base, _ = corpus
    import baseline_offline as app

    session = tmp_path / "session"
    session.mkdir()
    norm_file = base / "SyllableRepetition" / "2022_11_03" / \
        "SyllableRepetition_Overt.mat"
    app.main(session=str(session), norm_file=str(norm_file))
    stats = np.load(session / "normalization.npy")
    assert stats.shape == (2, 128)
    assert np.all(stats[1] > 0)  # stds positive


def test_train_vad_app_batched(corpus, tmp_path):
    """Batched (padded+masked) training path produces a usable checkpoint."""
    base, out_dir = corpus
    import train_unidirectional_vad as app

    cfg = app.TrainingConfiguration(
        nb_hidden_units=16, nb_layer=1, nb_epochs=1, batch_size=2,
        num_workers=0, truncated_sequence_length=50,
        speech_corpus_root=out_dir, out_dir=tmp_path,
        test_day="2022_11_04", valid_day="2022_11_03",
    )
    app.main(cfg)
    assert (tmp_path / "best_model.pth").exists()
