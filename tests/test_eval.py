"""Evaluation-layer tests: figure renderers and the contamination analysis
pipeline on synthetic data."""

import os
import sys

import numpy as np
import pytest
from scipy.io import loadmat, savemat
from scipy.io.wavfile import write as wavwrite

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "eval"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "eval",
                                "contamination"))


@pytest.fixture
def run_dir(tmp_path, rng):
    """Synthetic decode_online output folder."""
    d = tmp_path / "run"
    (d / "reco").mkdir(parents=True)
    hga = rng.normal(size=(800, 64))
    hga.astype(np.float64).tofile(d / "log.hga.f64")
    lpc = rng.normal(size=(1000, 20)).astype(np.float32)
    lpc.tofile(d / "log.lpc.f32")
    with open(d / "log.vad.lab", "w") as f:
        for i in range(7):
            f.write(f"{i * 2.0:.2f}\t{i * 2.0 + 1.5:.2f}\t150 frames\n")
    for i in range(7):
        pcm = (rng.normal(size=16000) * 5000).astype(np.int16)
        wavwrite(str(d / "reco" / f"reco_{i + 1:05d}.wav"), 16000, pcm)
    return d


def test_figure_1_assets(run_dir, tmp_path, monkeypatch):
    import figure_1_assets as f1

    out = tmp_path / "plots"
    monkeypatch.setattr(
        sys, "argv",
        ["figure_1_assets.py", str(run_dir), "--out", str(out),
         "--start", "0", "--stop", "4", "--lpc-start", "0",
         "--lpc-stop", "100"],
    )
    f1.main()
    for name in ("figure_1_cb.png", "figure_1_b.png", "figure_1_d.png",
                 "figure_1_f.png"):
        assert (out / name).exists()


def test_figure_2ab(run_dir, tmp_path, monkeypatch, rng):
    import figure_2ab as f2

    orig = tmp_path / "orig.wav"
    wavwrite(str(orig), 16000, (rng.normal(size=16000 * 16) * 4000).astype(np.int16))
    out = tmp_path / "plots" / "figure_2ab.png"
    monkeypatch.setattr(
        sys, "argv",
        ["figure_2ab.py", str(run_dir), str(orig),
         "--indices", "1", "2", "3", "--words", "A", "B", "C",
         "--out", str(out)],
    )
    f2.main()
    assert out.exists()


def test_contamination_pipeline(tmp_path, rng):
    """Aggregation + permutation analysis + report end to end, including the
    calibration property: an uncontaminated recording must NOT trip the
    p < 0.05 criterion, while an ECoG channel that literally contains the
    audio envelope must."""
    import contamination_analysis as ca

    agg = tmp_path / "aggregated_by_day"
    analysis = tmp_path / "analysis"
    agg.mkdir()
    analysis.mkdir()

    fs = 1000
    T = 40 * fs
    # Audio: amplitude-modulated noise bursts.
    env = (np.sin(2 * np.pi * np.arange(T) / (4 * fs)) > 0).astype(float)
    audio = rng.normal(size=T) * (0.1 + env)

    # Day A: independent ECoG -> clean.  32+ channels keep the 1/10
    # artifact-channel ratio meaningful (with few channels white noise
    # constantly trips it and the safety dilation masks everything).
    ecog_clean = rng.normal(size=(T, 32))
    savemat(str(agg / "2022_09_22_KeywordReading_Overt.mat"),
            dict(fs=fs, ecog=ecog_clean, audio=audio))

    # Day B: one channel carries the audio -> contaminated.
    ecog_dirty = rng.normal(size=(T, 32))
    ecog_dirty[:, 3] += 5.0 * audio
    savemat(str(agg / "2022_09_23_KeywordReading_Overt.mat"),
            dict(fs=fs, ecog=ecog_dirty, audio=audio))

    # Shrink the surrogate count for test speed.
    for f in sorted(agg.glob("*.mat")):
        ca.analyze_day(f, analysis, nb_surrogates=500)

    clean = loadmat(str(analysis / "2022_09_22_contamination_result.mat"),
                    simplify_cells=True)["out"]
    dirty = loadmat(str(analysis / "2022_09_23_contamination_result.mat"),
                    simplify_cells=True)["out"]
    assert clean["criterion_value"] >= 0.05
    assert dirty["criterion_value"] < 0.05
    assert dirty["dataset_measure"] > clean["dataset_measure"]
    assert len(clean["surrogate_measures"]) == 500

    # Report renders.
    import gen_contamination_report as report

    report.main(agg, analysis, tmp_path / "report")
    assert (tmp_path / "report" / "contamination_report.png").exists()


def test_vad_timings():
    from aggregate_per_day import vad_timings

    labels = np.array([0, 0, 1, 1, 1, 0, 0, 1, 0], dtype=bool)
    t = vad_timings(labels)
    assert t.shape == (2, 2)
    np.testing.assert_allclose(t[0], [0.02, 0.04])
    np.testing.assert_allclose(t[1], [0.07, 0.07])


def test_suppl_fig_2(tmp_path, rng):
    """Per-channel spectrogram-change figure renders from synthetic
    recordings (full 128-channel grid layout)."""
    import suppl_fig_2 as sf2

    fs = 1000
    T = 14 * fs
    code = np.zeros(T, np.int16)
    for i in range(3):
        code[(1 + i * 4) * fs:(3 + i * 4) * fs] = 1
    base = {
        "parameters": {
            "SamplingRate": {"NumericValue": fs},
            "SourceChGain": {"NumericValue": np.ones(129)},
            "Stimuli": {"Value": np.array([["Enter"], ["1"]], dtype=object)},
        },
        "states": {"StimulusCode": code},
    }
    mat = dict(base)
    env = np.where(code > 0, 3.0, 0.2)
    signal = rng.normal(size=(T, 129))
    signal[:, 128] *= env * 10000  # audio channel with speech bursts
    mat["signal"] = signal
    mat_file = tmp_path / "KeywordReading_Overt_R01.mat"
    savemat(str(mat_file), mat)

    cal = dict(base)
    cal["signal"] = rng.normal(size=(T, 129))
    cal_file = tmp_path / "SyllableRepetition_Overt.mat"
    savemat(str(cal_file), cal)

    sf2.gen_power_spectral_analysis_figure(
        mat_file, cal_file, out_dir=tmp_path / "out")
    assert (tmp_path / "out" / "suppl_fig_2.png").exists()


def test_vad_timings_edge_cases():
    from aggregate_per_day import vad_timings

    # Ends voiced: final span closes at the recording end.
    labels = np.array([0, 0, 1, 1], dtype=bool)
    t = vad_timings(labels)
    assert t.shape == (1, 2)
    np.testing.assert_allclose(t[0], [0.02, 0.03])

    # Starts voiced.
    labels = np.array([1, 1, 0, 0], dtype=bool)
    t = vad_timings(labels)
    np.testing.assert_allclose(t[0], [0.0, 0.01])
