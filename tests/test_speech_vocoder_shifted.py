"""Speaker-shifted intelligibility: held-out generator parameters.

Every other vocoder gate scores material drawn from the same generator
configuration the training corpus used, so 12/12 keyword-ID there is
necessary-but-weak evidence of intelligibility (VERDICT r2).  This gate
round-trips keywords produced by the SHIFTED_SPEAKERS presets — ±10%
vocal-tract (formant) scale, ±20-30% F0, ±10% speaking rate, 0.8-1.6x
production noise (tools/make_speech_corpus.py) — parameters no training
draw ever used.  The vocoder must keep identifying the vocabulary across
speakers it has never heard, and the full confusion matrix plus
per-utterance DTW margins must be available for inspection
(dss_tpu.eval.quality.keyword_id_report).

The matching reference capability is xiph LPCNet's speaker independence
(trained on multi-speaker data; reference extensions/lpcnet/setup.py:34-36
compiles its released weights in).
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
def shifted_dir(tmp_path_factory):
    """Speaker-shifted keyword wavs at an unseen seed."""
    out = tmp_path_factory.mktemp("speech_shifted")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_speech_corpus.py"),
         str(out), "--seconds", "4", "--seed", "777", "--shifted-val"],
        check=True, capture_output=True,
    )
    return out / "val_shifted"


def test_shifted_keywords_identifiable(shifted_dir):
    """>= 9/12 keyword-ID under speaker-shifted generation (ship evals
    measure 10-12/12; the floor keeps one confusable pair of headroom
    per speaker), and the report carries the full confusion matrix and
    margins."""
    from dss_tpu.eval.quality import keyword_id_report
    from dss_tpu.vocoder import LPCNet
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    wavs = sorted(shifted_dir.glob("kw_*.wav"))
    assert len(wavs) == 12  # 6 keywords x 2 shifted speakers

    vocoder = LPCNet(backend="net", weights=str(WEIGHTS))
    originals, resyntheses = {}, {}
    for path in wavs:
        word = path.stem.split("_")[1]
        _, audio = wavfile.read(path)
        feats = LPCFeatureEncoder().compute_LPC_features(audio)
        vocoder.reset_decoder()
        syn = vocoder.synthesize_frames(feats)
        n = len(feats) * 160
        originals.setdefault(word, []).append(audio[:n])
        resyntheses.setdefault(word, []).append(syn[:n])

    report = keyword_id_report(originals, resyntheses)
    # Confusion matrix covers all 12 utterances and margins carry the
    # distance evidence.
    assert sum(sum(r.values()) for r in report["confusion"].values()) == 12
    assert len(report["margins"]) == 12
    assert all("own_d" in m and "margin" in m for m in report["margins"])
    assert report["accuracy"] >= 0.75, report["confusion"]
