"""Out-of-family intelligibility: the code-independent HNM generator.

VERDICT r3 item 3: every quality gate used to score material from
tools/make_speech_corpus.py — the same generator family that produced the
training corpus — so the evaluation graded the builder's homework with the
builder's answer key.  tools/make_hnm_corpus.py is a second synthesizer
sharing NO code and NO parameter tables with it (harmonic-plus-noise
additive synthesis, Hillenbrand-1995 vowel targets vs the formant
source-filter model on Peterson-Barney targets).  This gate round-trips
its keywords through the shipped flagship checkpoint and requires the
vocabulary to stay identifiable.

Measured reality (recorded honestly, also in MIGRATION.md): keyword-ID on
this out-of-family material is 12/12 but fidelity degrades hard vs
in-family scores — cepstral distortion ~12.5 dB (vs 2.5-3 dB in-family)
and STOI ~0.25 (vs ~0.89); the weight-free DSP backend scores 12/12 /
15.4 dB / STOI 0.81 on the same material.  The neural checkpoint keeps
the envelope (better CD than DSP) but its free-running excitation is
rougher outside its training distribution.  The gate pins the
classification floor (>= 10/12) and a CD ceiling, not STOI.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "weights" / "vocoder_speech.npz"

pytestmark = pytest.mark.skipif(
    not WEIGHTS.exists(), reason="speech checkpoint not shipped")


@pytest.fixture(scope="module")
def hnm_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("hnm")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_hnm_corpus.py"),
         "--out", str(out), "--seed", "424242"],  # unseen seed
        check=True, capture_output=True,
    )
    return out


def test_hnm_keywords_identifiable(hnm_dir):
    from dss_tpu.eval.quality import keyword_id_report, score
    from dss_tpu.vocoder import LPCNet
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    wavs = sorted(hnm_dir.glob("kw_*.wav"))
    assert len(wavs) == 12  # 6 keywords x 2 variants

    vocoder = LPCNet(backend="net", weights=str(WEIGHTS))
    originals, resyntheses, dists = {}, {}, []
    for path in wavs:
        word = path.stem.split("_")[1]
        _, audio = wavfile.read(path)
        feats = LPCFeatureEncoder().compute_LPC_features(audio)
        vocoder.reset_decoder()
        syn = vocoder.synthesize_frames(feats)
        n = len(feats) * 160
        originals.setdefault(word, []).append(audio[:n])
        resyntheses.setdefault(word, []).append(syn[:n])
        dists.append(score(audio[:n], syn[:n]).cepstral_distance_db)

    report = keyword_id_report(originals, resyntheses)
    n_correct = round(report["accuracy"] * 12)
    assert n_correct >= 10, (report["confusion"], report["margins"])
    # Fidelity ceiling: measured ~12.5 dB on this material; untrained
    # weights measure ~33 dB, the DSP backend ~15 dB.  A regression past
    # 18 dB means the checkpoint stopped tracking out-of-family envelopes.
    assert float(np.mean(dists)) < 18.0, float(np.mean(dists))
