"""Fused decode+vocode unit: one device program per completed word.

Pins that FusedDecoderVocoder is functionally equivalent to the separate
RecurrentNeuralDecodingModel -> DelayedLPCNetVocoder chain (both wirings are
selectable in decode_online via the fused_decoder setting), and that warmed
segment-length buckets never compile at stream time.
"""

import numpy as np
import pytest

from dss_tpu.models import BidirectionalSpeechSynthesisModel
from dss_tpu.runtime.units import (
    DelayedLPCNetVocoder,
    DelayedLPCNetVocoderSettings,
    FusedDecoderVocoder,
    FusedDecoderVocoderSettings,
    RecurrentNeuralDecodingModel,
    RecurrentNeuralDecodingModelSettings,
)

DEC = dict(nb_layer=1, nb_hidden_units=16, nb_electrodes=8)


def _fused(backend, weights=None, mult=10, prewarm=()):
    unit = FusedDecoderVocoder()
    unit.apply_settings(FusedDecoderVocoderSettings(
        path_to_model_weights=None, model=BidirectionalSpeechSynthesisModel,
        params=DEC, vocoder_backend=backend, vocoder_weights=weights,
        length_multiple=mult, prewarm_frames=prewarm,
    ))
    unit.initialize()
    return unit


def test_fused_dsp_matches_separate_chain():
    fused = _fused("dsp")

    dec = RecurrentNeuralDecodingModel()
    dec.apply_settings(RecurrentNeuralDecodingModelSettings(
        path_to_model_weights=None, model=BidirectionalSpeechSynthesisModel,
        params=DEC, length_multiple=10, prewarm_frames=(),
    ))
    dec.initialize()
    voc = DelayedLPCNetVocoder()
    voc.apply_settings(DelayedLPCNetVocoderSettings(
        backend="dsp", prewarm_frames=()))
    voc.initialize()

    rng = np.random.default_rng(3)
    segment = rng.normal(size=(23, 8)).astype(np.float32)
    lpc, audio = fused._decode_and_vocode(segment)

    # Separate chain: decoder unit math inline (same bucket/mask policy).
    import jax.numpy as jnp

    T = len(segment)
    x = np.zeros((1, 30, 8), np.float32)
    x[0, :T] = segment
    mask = np.zeros((1, 30), np.float32)
    mask[0, :T] = 1.0
    pred, _ = dec._infer(dec._params, jnp.asarray(x), jnp.asarray(mask))
    sep_lpc = np.asarray(pred)[0, :T]
    np.testing.assert_allclose(lpc, sep_lpc, atol=1e-5)

    # DSP synthesis is frame-causal, so the first T frames of audio are
    # identical no matter how the tail is padded.
    sep_audio = voc._lpcnet.synthesize_frames(sep_lpc)[: T * 160]
    assert audio.dtype == np.int16 and len(audio) == T * 160
    np.testing.assert_array_equal(audio, sep_audio)
    for u in (fused, dec, voc):
        u.shutdown()


def test_fused_net_backend_shapes_and_determinism():
    fused = _fused("net")
    rng = np.random.default_rng(4)
    segment = rng.normal(size=(8, 8)).astype(np.float32)
    lpc, audio = fused._decode_and_vocode(segment)
    assert lpc.shape == (8, 20)
    assert audio.dtype == np.int16 and len(audio) == 8 * 160
    assert np.all(np.isfinite(lpc))

    # Same input from a fresh unit (same seeds) reproduces the audio; the
    # carried vocoder state advances, so a SECOND segment through the same
    # unit continues the stream rather than restarting it.
    fused2 = _fused("net")
    lpc2, audio2 = fused2._decode_and_vocode(segment)
    np.testing.assert_array_equal(audio, audio2)
    np.testing.assert_allclose(lpc, lpc2, atol=0)

    _, audio3 = fused._decode_and_vocode(segment)
    assert audio3.shape == audio.shape
    for u in (fused, fused2):
        u.shutdown()


def test_fused_net_backend_audio_matches_host_pack():
    """Value parity for the device-side int16 bitcast pack: the fused net
    program's audio bytes must equal host-side
    ``np.clip(pcm*32767, -32768, 32767).astype(int16)`` of a separate
    net_synthesize_frames run with identical state — a byte-order or
    clip/truncate mismatch in the pack/unpack pair would otherwise pass the
    shape/determinism test unnoticed (advisor r3)."""
    import jax.numpy as jnp

    from dss_tpu.vocoder.net import net_synthesize_frames, net_vocoder_init

    fused = _fused("net")
    rng = np.random.default_rng(6)
    T, mult = 8, 10
    segment = rng.normal(size=(T, 8)).astype(np.float32)
    lpc, audio = fused._decode_and_vocode(segment)

    # Reconstruct the padded conditioning the fused program vocoded: valid
    # frames then repeat-pad of the last valid frame (the one-hot einsum in
    # segment_program reduces to exactly this).
    feats = np.concatenate([lpc, np.repeat(lpc[-1:], mult - T, axis=0)])
    state = net_vocoder_init(fused._voc_model, batch=1)
    pcm, _ = net_synthesize_frames(
        fused._voc_model, fused._voc_params, state,
        jnp.asarray(feats[None]), use_pallas=False)
    expect = np.clip(np.asarray(pcm).reshape(-1) * 32767.0,
                     -32768, 32767).astype(np.int16)[: T * 160]
    np.testing.assert_array_equal(audio, expect)
    fused.shutdown()


def test_fused_warmed_bucket_compiles_nothing():
    from test_no_stream_compiles import _compile_log

    fused = _fused("dsp", mult=10, prewarm=())
    rng = np.random.default_rng(5)
    with _compile_log() as compiles:
        # 2*mult is warmed in initialize(); any T <= 20 shares its bucket.
        fused._decode_and_vocode(rng.normal(size=(20, 8)).astype(np.float32))
        fused._decode_and_vocode(rng.normal(size=(13, 8)).astype(np.float32))
    assert compiles() == [], f"stream-time compiles: {compiles()}"
    fused.shutdown()
