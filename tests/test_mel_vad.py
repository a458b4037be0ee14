"""Mel filterbank and energy-VAD tests against documented semantics."""

import numpy as np

from dss_tpu.ops.mel import EnergyBasedVad, MelFilterBank


def test_mel_filterbank_shapes_and_inverse(rng):
    mfb = MelFilterBank(401, 40, 16000)
    spec = np.abs(rng.normal(size=(7, 401)))
    mels = mfb.toLogMels(spec)
    assert mels.shape == (7, 40)
    back = mfb.fromLogMels(mels)
    assert back.shape == (7, 401)
    assert np.all(np.isfinite(mels)) and np.all(np.isfinite(back))


def test_energy_vad_detects_loud_segment():
    fs = 16000
    rng = np.random.default_rng(0)
    # Broadband loud vs quiet (MFCC0 sums log-mels across all bands, so a
    # pure tone would read as LOW energy — use noise for both levels).
    quiet = (rng.normal(size=fs) * 50).astype(np.int16)
    loud = (rng.normal(size=fs) * 15000).astype(np.int16)
    wav = np.concatenate([quiet, loud, quiet])

    vad = EnergyBasedVad()
    labels = vad.from_wav(wav, sampling_rate=fs)
    n = len(labels)
    third = n // 3
    # Middle third voiced, outer thirds mostly not.
    assert labels[third + 10:2 * third - 10].mean() > 0.9
    assert labels[:third - 10].mean() < 0.1
    assert labels[2 * third + 10:].mean() < 0.1


def test_vad_lab_export(tmp_path):
    vad = EnergyBasedVad()
    labels = np.array([False, False, True, True, True, False])
    fn = tmp_path / "out.lab"
    vad.convert_vad_to_lab(str(fn), labels)
    lines = fn.read_text().strip().split("\n")
    assert lines[0] == "0.00\t0.02\t0"
    assert lines[1] == "0.02\t0.05\t1"
    assert lines[2] == "0.05\t0.06\t0"
