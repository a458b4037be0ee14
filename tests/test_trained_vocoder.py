"""Shipped trained vocoder weights: quality regression floor.

weights/vocoder_synthetic.npz was trained by apps/train_vocoder.py on a
tools/make_synthetic_corpus.py corpus (see README). These tests pin that
the shipped checkpoint (a) loads, (b) carries a tile-sparse GRU-A mask the
Pallas sampler can exploit, and (c) beats a fixed Bark-cepstral round-trip
quality floor on held-out synthetic audio — so a regression in the
encoder, the sample-rate network, or the weights file shows up as a score
jump, not as a silent quality loss.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "weights" / "vocoder_synthetic.npz"


@pytest.fixture(scope="module")
def held_out_audio(tmp_path_factory):
    out = tmp_path_factory.mktemp("heldout")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_synthetic_corpus.py"),
         str(out), "--seconds", "4", "--seed", "123"],
        check=True, capture_output=True,
    )
    _, audio = wavfile.read(out / "utt_0000.wav")
    return audio[:16000]  # 1 s is enough for a stable score


def test_weights_load_and_are_tile_sparse():
    from dss_tpu.ops.pallas.sampler import tile_sparse_pattern

    params = dict(np.load(WEIGHTS))
    pattern, kept = tile_sparse_pattern(params["gru_a_mask"])
    assert pattern is not None and kept < 1.0


def test_roundtrip_quality_floor(held_out_audio):
    from dss_tpu.eval.quality import score_roundtrip
    from dss_tpu.vocoder import LPCNet

    vocoder = LPCNet(backend="net", weights=str(WEIGHTS))
    report = score_roundtrip(held_out_audio, vocoder)
    # Measured 4.4 dB at ship time (untrained: ~33 dB; DSP backend:
    # ~19 dB on the same material). Generous margin for sampling noise.
    assert report.cepstral_distance_db < 12.0


def _bunched_path(S):
    return REPO / "weights" / f"vocoder_synthetic_b{S}.npz"


@pytest.mark.parametrize("bunch", [2, 4])
def test_bunched_weights_load_sparse_and_infer_bunch(bunch):
    from dss_tpu.ops.pallas.sampler import tile_sparse_pattern
    from dss_tpu.vocoder import LPCNetModel

    params = dict(np.load(_bunched_path(bunch)))
    assert LPCNetModel.from_params(params).bunch == bunch
    pattern, kept = tile_sparse_pattern(params["gru_a_mask"])
    assert pattern is not None and kept < 1.0


@pytest.mark.parametrize("bunch", [2, 4])
def test_bunched_roundtrip_quality_floor(held_out_audio, bunch):
    """The shipped bunched checkpoints (S samples per sample-rate step,
    ~1.3x / ~1.6x faster synthesis) must stay within the same quality
    floor as the bunch=1 checkpoint.  Measured at ship time: 4.2-4.9 dB
    (bunch=2, recovery-window schedule + best-by-val), ~5 dB (bunch=4);
    bunch=1: 4.4 dB; DSP: ~19 dB."""
    from dss_tpu.eval.quality import score_roundtrip
    from dss_tpu.vocoder import LPCNet

    vocoder = LPCNet(backend="net", weights=str(_bunched_path(bunch)))
    assert vocoder._model.bunch == bunch
    report = score_roundtrip(held_out_audio, vocoder)
    assert report.cepstral_distance_db < 12.0
