"""Value-level goldens for the corpus alignment chain.

The four alignment rules of prepare_corpus (reference prepare_corpus.py:42-137)
are recomputed here from FIRST PRINCIPLES with literal constants on a crafted
session — corrupting any rule fails with a value diff, not just a length diff:

  1. trial ECoG/audio slice gets a +0.04 s pad past the stimulus end;
  2. trial audio is peak-normalized to -3 dB (except SILENCE) and shifted by
     16 ms of leading zeros (IIR group-delay compensation);
  3. LPC feature frames are cropped [3:-1];
  4. trial_ids are sign-alternating stimulus codes.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.io import savemat
from scipy.io.wavfile import write as wavwrite

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "apps"))

FS = 1000
FS_AUDIO = 16000

# Crafted session: code spans (seconds) and their stimulus codes.  The two
# consecutive code-1 trials at the end exercise the sign alternation; code 3
# is a SILENCE trial (exercises VAD zeroing and normalization bypass).
TRIALS = [  # (code, t0, t1)
    (1, 1.0, 4.5),
    (2, 6.0, 9.5),
    (1, 11.0, 14.5),
    (1, 16.0, 19.5),
    (3, 21.0, 24.5),
]
SECONDS = 26.0


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    day = tmp_path_factory.mktemp("golden_day")
    rng = np.random.default_rng(7)
    t_total = int(SECONDS * FS)

    code = np.zeros(t_total, np.int16)
    for c, t0, t1 in TRIALS:
        code[int(t0 * FS):int(t1 * FS)] = c

    signal = rng.normal(size=(t_total, 129)) * 0.05
    # Distinctive IN-BAND (100 Hz — inside the 70-170 Hz feature band) burst
    # INSIDE the +0.04 s pad window of trial 0 (stimulus ends at 4.5 s; pad
    # covers [4.5, 4.54) s): feature rule 1 must see it.
    # Per-channel random signs so common-average referencing can't cancel it.
    burst_t = np.arange(4500, 4540)
    signs = rng.choice([-1.0, 1.0], size=signal.shape[1])
    signal[burst_t, :] += 40.0 * np.sin(
        2 * np.pi * 100.0 * burst_t / FS)[:, None] * signs[None, :]

    mat = {
        "signal": signal,
        "parameters": {
            "SamplingRate": {"NumericValue": FS},
            "SourceChGain": {"NumericValue": np.ones(129)},
            "Stimuli": {"Value": np.array(
                [["Enter", "Right", "SILENCE"], ["1", "2", "3"]],
                dtype=object)},
        },
        "states": {"StimulusCode": code},
    }
    savemat(str(day / "KeywordReading_Overt_R01.mat"), mat)

    # Audio: low noise floor plus a known impulse in every trial (value
    # 12000 at exactly 0.5 s past trial onset), so alignment is traceable
    # sample-for-sample through normalize + shift.
    audio = (rng.normal(size=t_total * (FS_AUDIO // FS)) * 30.0)
    for _, t0, _ in TRIALS:
        audio[int((t0 + 0.5) * FS_AUDIO)] = 12000.0
    audio = np.clip(audio, -32767, 32767).astype(np.int16)
    wavwrite(str(day / "KeywordReading_Overt_R01.wav"), FS_AUDIO, audio)
    return day, audio


@pytest.fixture(scope="module")
def pipeline(session):
    import prepare_corpus as app

    day, _ = session
    return app.FeatureExtractionPipeline(
        mat_filename=day / "KeywordReading_Overt_R01.mat",
        wav_filename=day / "KeywordReading_Overt_R01.wav",
        min_trial_length=2.5,
    )


def _expected_trial_audio(audio, t0, t1, silence):
    """Rules 1+2 from first principles: slice [t0*16k, t1*16k + 640), peak
    -3 dB normalize (skip for SILENCE), 256-sample zero-shift."""
    a = int(t0 * FS) * 16
    b = int(t1 * FS) * 16 + 640
    raw = audio[a:b]
    if silence:
        scaled = raw.astype(np.int16)
    else:
        peak = float(np.max(np.abs(raw.astype(np.int64))))
        target = 32767.0 * 10.0 ** (-0.1 / 20.0)   # 0.1 dB headroom
        gain = (target / peak) * 10.0 ** (-3.0 / 20.0)
        scaled = np.clip(np.round(raw.astype(np.float64) * gain),
                         -32768, 32767).astype(np.int16)
    return np.concatenate([np.zeros(256, np.int16), scaled[:-256]])


def test_trial_audio_alignment_values(pipeline, session):
    _, audio = session
    trials = pipeline.mat.trial_indices(2.5)
    assert len(trials) == len(TRIALS)
    for (label, start, stop), (code, t0, t1) in zip(trials, TRIALS):
        got = pipeline._trial_audio(label, start, stop)
        want = _expected_trial_audio(audio, t0, t1, silence=(code == 3))
        np.testing.assert_array_equal(got, want)
        # The known impulse lands at (0.5 s * 16 kHz) + 256 shift exactly.
        impulse_at = int(0.5 * FS_AUDIO) + 256
        assert got[impulse_at] == want[impulse_at]
        if code != 3:
            assert got[impulse_at] > 20000  # normalized peak, not raw 12000
        else:
            assert got[impulse_at] == 12000  # SILENCE skips normalization


def test_lpc_crop_values(pipeline, session):
    """Rule 3: per-trial LPC features are encoder(full aligned audio)[3:-1],
    recomputed independently per trial and compared value-for-value."""
    from dss_tpu.vocoder import LPCFeatureEncoder

    _, audio = session
    got = pipeline.get_lpc_coefficients()
    rows = []
    for code, t0, t1 in TRIALS:
        aligned = _expected_trial_audio(audio, t0, t1, silence=(code == 3))
        feats = LPCFeatureEncoder().compute_LPC_features(aligned)
        rows.append(feats[3:-1])
    want = np.concatenate(rows)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Off-by-one crops produce different VALUES at the boundaries:
    wrong = np.concatenate(
        [LPCFeatureEncoder().compute_LPC_features(
            _expected_trial_audio(audio, t0, t1, silence=(c == 3)))[2:-2]
         for c, t0, t1 in TRIALS])
    assert wrong.shape == want.shape  # same length...
    assert float(np.abs(wrong - want).max()) > 1e-3  # ...different values


def test_trial_ids_sign_alternation(pipeline):
    """Rule 4: ids per trial = floor((stop-start)/10ms) copies of the code,
    sign-flipped on same-stimulus repeats.  Codes 1,2,1,1,3 -> +1,+2,+1,-1,+3."""
    got = pipeline.get_trial_ids()
    want_parts = []
    expected_signed = [1, 2, 1, -1, 3]
    for (code, t0, t1), signed in zip(TRIALS, expected_signed):
        n = int(np.floor((int(t1 * FS) + 40 - int(t0 * FS) - 40) / 10))
        want_parts.append(np.full(n, signed, np.int16))
    want = np.concatenate(want_parts)
    np.testing.assert_array_equal(got, want)


def test_feature_pad_rule_sees_post_stimulus_spike(pipeline):
    """Rule 1 value-level: the huge ECoG spike placed INSIDE trial 0's
    +0.04 s pad window must dominate the trial's final feature frame; if the
    pad is dropped the final frame is ordinary noise."""
    feats = pipeline.get_features()
    n0 = int(np.floor((int(4.5 * FS) + 40 - int(1.0 * FS) - 40) / 10))
    trial0 = feats[:n0]
    # The spike at 3.51-3.53 s into the trial falls in the last ~4 frames'
    # 50 ms windows; earlier frames are quiet noise.
    assert float(trial0[-1].mean()) > float(trial0[: n0 - 8].mean()) + 2.0


def test_hdf_roundtrip_frame_alignment(pipeline):
    """hga/trial_ids rows agree and vad labels align within the usual
    -5-frame audio-windowing difference."""
    feats = pipeline.get_features()
    ids = pipeline.get_trial_ids()
    vad = pipeline.get_vad_labels()
    assert len(feats) == len(ids)
    assert 0 <= len(ids) - len(vad) <= len(TRIALS) * 5
    # SILENCE trial's vad labels are all zero (rule: zeroed for SILENCE).
    n_before = sum(int(np.floor((int(t1 * FS) - int(t0 * FS)) / 10)) - 4
                   for _, t0, t1 in TRIALS[:4])
    assert not vad[n_before:].any()
