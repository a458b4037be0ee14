"""Shipped speech-trained vocoder weights: quality + intelligibility floor.

weights/vocoder_speech.npz is trained by apps/train_vocoder.py on the
phoneme-driven formant-synthesis corpus (tools/make_speech_corpus.py) with
the three-stage AR-feedback ladder (teacher forcing -> scheduled sampling
-> free-running STFT fine-tune; see ARCHITECTURE.md).  These tests pin
that the shipped checkpoint (a) loads and is tile-sparse so the Pallas
sparse sampler engages, (b) beats a Bark-cepstral round-trip floor on
held-out *linguistically structured* audio, and (c) keeps the deployed
six-keyword vocabulary identifiable after resynthesis — the intelligibility
contract the reference meets by compiling in xiph LPCNet's released
weights (reference extensions/lpcnet/setup.py:34-36).
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
def corpus_dir(tmp_path_factory):
    """A tiny held-out slice of the speech corpus (unseen seed)."""
    out = tmp_path_factory.mktemp("speech_heldout")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_speech_corpus.py"),
         str(out), "--seconds", "4", "--seed", "777"],
        check=True, capture_output=True,
    )
    return out


def test_weights_load_and_are_tile_sparse():
    from dss_tpu.ops.pallas.sampler import tile_sparse_pattern

    params = dict(np.load(WEIGHTS))
    pattern, kept = tile_sparse_pattern(params["gru_a_mask"])
    assert pattern is not None and kept < 1.0


def test_roundtrip_quality_floor(corpus_dir):
    from dss_tpu.eval.quality import score_roundtrip
    from dss_tpu.vocoder import LPCNet

    from dss_tpu.eval.quality import stoi

    _, audio = wavfile.read(corpus_dir / "val" / "val_00.wav")
    vocoder = LPCNet(backend="net", weights=str(WEIGHTS))
    report = score_roundtrip(audio[:16000], vocoder)
    # Ship-time scores are ~2.5-3.1 dB mean (STATUS.md) with +-1.5 dB
    # run-to-run variance; untrained nets score ~33 dB, the DSP backend
    # ~19 dB.  The 6 dB floor fails the gate if quality halves (the old
    # 12 dB floor would have passed a 4x regression silently).
    assert report.cepstral_distance_db < 6.0

    # Intelligibility floor on the sentence utterance (keywords are too
    # short for STOI's 384 ms windows): ships measure 0.83-0.92; 0.70
    # fails the gate well before speech becomes unintelligible while
    # staying clear of run-to-run variance.
    vocoder.reset_decoder()
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    feats = LPCFeatureEncoder().compute_LPC_features(audio[:32000])
    syn = vocoder.synthesize_frames(feats)
    n = min(len(syn), 32000)
    assert stoi(audio[:n], syn[:n]) >= 0.70


def test_keyword_identification_above_chance(corpus_dir):
    """Round-trip the six deployed keywords and check each resynthesis is
    recognized as its own word (DTW Bark-cepstral nearest-original)."""
    from dss_tpu.eval.quality import keyword_id_accuracy
    from dss_tpu.vocoder import LPCNet
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    words = {}
    for wav in sorted((corpus_dir / "val").glob("kw_*_0.wav")):
        word = wav.name.split("_")[1]
        _, audio = wavfile.read(wav)
        words[word] = audio
    assert len(words) == 6

    vocoder = LPCNet(backend="net", weights=str(WEIGHTS))
    originals, resyntheses = {}, {}
    for word, audio in words.items():
        feats = LPCFeatureEncoder().compute_LPC_features(audio)
        vocoder.reset_decoder()
        syn = vocoder.synthesize_frames(feats)
        n = len(feats) * 160
        originals[word] = [audio[:n]]
        resyntheses[word] = [syn[:n]]

    acc = keyword_id_accuracy(originals, resyntheses)
    # Chance is 1/6 ~ 0.17; every ship eval scored 6/6 (STATUS.md), so the
    # floor demands >= 5/6 — one confusable pair at most.
    assert acc >= 0.75

