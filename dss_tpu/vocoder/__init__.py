"""LPCNet-equivalent vocoder subsystem, TPU-native.

Capability target: reference extensions/lpcnet/ (Cython binding over the
xiph LPCNet C library, which is NOT vendored in the reference tree): a
20-feature (18 Bark-scale cepstra + pitch period + pitch correlation) frame
interface producing 160 samples of 16 kHz int16 PCM per 10 ms frame
(LPCNet.pyx:10,30-40), plus the feature encoder used by corpus preparation
(LPCNet.pyx:43-87).

Because the reference ships no vocoder weights, this subsystem is
*self-consistent* rather than bit-matching: the encoder and the two decoder
backends share one spectral definition (dss_tpu.vocoder.lpc).

Backends:
* ``LPCVocoder``    (dsp.py) — deterministic source-filter LPC synthesis;
  zero-training, used for tests and as a robust fallback.
* ``LPCNetVocoder`` (net.py) — neural autoregressive vocoder (frame-rate
  conditioning network + sample-rate GRU sampler), trainable, with a Pallas
  on-chip sampling kernel and batched multi-stream synthesis.
"""

from .mulaw import mulaw_encode, mulaw_decode, MULAW_LEVELS
from .lpc import (
    NB_BANDS,
    NB_FEATURES,
    LPC_ORDER,
    FRAME_SIZE,
    band_energies,
    cepstrum_from_bands,
    bands_from_cepstrum,
    psd_from_bands,
    lpc_from_bands,
)
from .features import LPCFeatureEncoder
from .dsp import LPCVocoder
from .net import LPCNetModel
from .lpcnet import LPCNet, BatchedLPCNet, LPCFeatureFile


def _packaged(name):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                        name)
    path = os.path.abspath(path)
    return path if os.path.isfile(path) else None


def packaged_weights():
    """Path to the repo's shipped neural-vocoder checkpoint, or None.

    Prefers the speech-trained flagship (vocoder_speech.npz: 2.5 dB
    held-out Bark-cepstral distortion, 12/12 keyword identification —
    see tests/test_speech_vocoder.py); falls back to the synthetic
    source-filter demo anchor (tools/make_synthetic_corpus.py,
    tests/test_trained_vocoder.py)."""
    return (_packaged("vocoder_speech.npz")
            or _packaged("vocoder_synthetic.npz"))


def packaged_weights_bunched(bunch: int = 2):
    """Path to the shipped bunched checkpoint (``bunch`` samples per
    sample-rate step — faster synthesis at a small quality cost), or
    None.  Prefers a speech-trained bunched checkpoint
    (vocoder_speech_b{S}.npz) over the synthetic-corpus one."""
    return (_packaged(f"vocoder_speech_b{bunch}.npz")
            or _packaged(f"vocoder_synthetic_b{bunch}.npz"))

__all__ = [
    "mulaw_encode",
    "mulaw_decode",
    "MULAW_LEVELS",
    "NB_BANDS",
    "NB_FEATURES",
    "LPC_ORDER",
    "FRAME_SIZE",
    "band_energies",
    "cepstrum_from_bands",
    "bands_from_cepstrum",
    "psd_from_bands",
    "lpc_from_bands",
    "LPCFeatureEncoder",
    "packaged_weights",
    "packaged_weights_bunched",
    "LPCVocoder",
    "LPCNetModel",
    "LPCNet",
    "BatchedLPCNet",
    "LPCFeatureFile",
]
