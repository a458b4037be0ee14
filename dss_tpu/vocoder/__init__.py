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

    Trained on synthetic source-filter audio (see
    tools/make_synthetic_corpus.py and tests/test_trained_vocoder.py) —
    a working default for demos; retrain on real speech for deployment.
    """
    return _packaged("vocoder_synthetic.npz")


def packaged_weights_bunched(bunch: int = 2):
    """Path to the shipped bunched checkpoint (``bunch`` samples per
    sample-rate step — faster synthesis at a small quality cost), or
    None.  Shipped: bunch=2 (78x RT, 5.2 dB held-out) and bunch=4
    (95x RT, 5.0-5.7 dB held-out) vs 60x / 4.4 dB for the bunch=1
    checkpoint."""
    return _packaged(f"vocoder_synthetic_b{bunch}.npz")

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
