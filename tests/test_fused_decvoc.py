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


def _small_voc_npz(tmp_path):
    """Tiny vocoder checkpoint so CPU chunk tests stay fast."""
    import jax

    from dss_tpu.vocoder.net import LPCNetModel

    m = LPCNetModel(gru_a_units=64, gru_b_units=16, cond_dim=32,
                    embed_dim=16)
    p = m.init(jax.random.PRNGKey(2))
    path = tmp_path / "voc_small.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in p.items()})
    return str(path)


def _fused50(weights, chunked):
    unit = FusedDecoderVocoder()
    unit.apply_settings(FusedDecoderVocoderSettings(
        path_to_model_weights=None, model=BidirectionalSpeechSynthesisModel,
        params=DEC, vocoder_backend="net", vocoder_weights=weights,
        length_multiple=50, prewarm_frames=(), chunk_emission=chunked,
    ))
    unit.initialize()
    return unit


def test_chunked_emission_bitexact_vs_single_shot(tmp_path):
    """Chunked word emission (head + tail programs) concatenates to
    BIT-identical audio and identical LPC features vs the single-shot
    program — the VERDICT r3 item-1 contract.  Rides on
    net_synthesize_frames chunk invariance (50-frame blocks)."""
    w = _small_voc_npz(tmp_path)
    chunked = _fused50(w, True)
    single = _fused50(w, False)
    assert chunked._chunked and not single._chunked

    rng = np.random.default_rng(8)
    for T in (120, 50, 73):  # 3 chunks / 1 chunk / 2 chunks
        segment = rng.normal(size=(T, 8)).astype(np.float32)
        lpc_c, audio0, pending, Tc = chunked._decode_head(segment)
        parts = [audio0] + [chunked._read_chunk(b, k, Tc)
                            for k, b in enumerate(pending, start=1)]
        audio_chunked = np.concatenate(parts)
        lpc_s, audio_single = single._decode_and_vocode(segment)
        np.testing.assert_allclose(lpc_c, lpc_s, atol=0)
        np.testing.assert_array_equal(audio_chunked, audio_single)
        assert len(audio_chunked) == T * 160
    for u in (chunked, single):
        u.shutdown()


def test_chunked_emission_bitexact_mult100_short_word(tmp_path):
    """length_multiple=100 (a value bucket_sweep recommends and the
    ``% COND_BLOCK == 0`` gate admits) with words ending BEFORE a tail
    chunk boundary: the all-pad tail chunks must ship zero samples.  An
    unclamped ``T - k*chunk`` went negative here and the slice-from-the-
    end emitted a near-full chunk of padded garbage (advisor r4)."""
    import asyncio
    import time as _time

    from dss_tpu.runtime.messages import ClosedLoopMessage

    w = _small_voc_npz(tmp_path)

    def mk(chunked):
        unit = FusedDecoderVocoder()
        unit.apply_settings(FusedDecoderVocoderSettings(
            path_to_model_weights=None,
            model=BidirectionalSpeechSynthesisModel,
            params=DEC, vocoder_backend="net", vocoder_weights=w,
            length_multiple=100, prewarm_frames=(),
            chunk_emission=chunked,
        ))
        unit.initialize()
        return unit

    chunked, single = mk(True), mk(False)
    assert chunked._chunked
    rng = np.random.default_rng(11)
    # T=40 < chunk: tail chunk k=1 of the 100-bucket is pure repeat-pad.
    # T=60: tail chunk is partially valid. T=130: 200-bucket, chunk k=3
    # all-pad. All must match single-shot bit-exactly.
    for T in (40, 60, 130):
        segment = rng.normal(size=(T, 8)).astype(np.float32)
        lpc_c, audio0, pending, Tc = chunked._decode_head(segment)
        parts = [audio0] + [chunked._read_chunk(b, k, Tc)
                            for k, b in enumerate(pending, start=1)]
        audio_chunked = np.concatenate(parts)
        lpc_s, audio_single = single._decode_and_vocode(segment)
        np.testing.assert_allclose(lpc_c, lpc_s, atol=0)
        np.testing.assert_array_equal(audio_chunked, audio_single)
        assert len(audio_chunked) == T * 160

    # Message flow for the short word: completion marker still arrives
    # (possibly with zero samples) and byte accounting holds.
    msg = ClosedLoopMessage(data=rng.normal(size=(40, 8)).astype(np.float32),
                            fs=100, received_at=_time.time(),
                            previous_frames=0)

    async def run():
        return [(p, m) async for p, m in chunked.decode(msg)]

    out = asyncio.run(run())
    chunk_msgs = [m for p, m in out if p == chunked.OUTPUT]
    assert any(any(n == "dv_word_complete" for n, _ in m.stamps)
               for m in chunk_msgs)
    total = sum(len(m.data) for m in chunk_msgs)
    assert total == 40 * 160
    for u in (chunked, single):
        u.shutdown()


def test_chunked_emission_message_flow(tmp_path):
    """decode() publishes: LPC once; in-order audio chunks on OUTPUT where
    only the FIRST carries latency stamps and the LAST carries the
    dv_word_complete marker; and the full word on WORD (wav tap)."""
    import asyncio
    import time as _time

    from dss_tpu.runtime.messages import ClosedLoopMessage

    w = _small_voc_npz(tmp_path)
    unit = _fused50(w, True)
    rng = np.random.default_rng(9)
    segment = rng.normal(size=(120, 8)).astype(np.float32)
    msg = ClosedLoopMessage(data=segment, fs=100,
                            received_at=_time.time(), previous_frames=0)

    async def run():
        out = []
        async for port, m in unit.decode(msg):
            out.append((port, m))
        return out

    out = asyncio.run(run())
    lpc_msgs = [m for p, m in out if p == unit.LPC]
    chunk_msgs = [m for p, m in out if p == unit.OUTPUT]
    word_msgs = [m for p, m in out if p == unit.WORD]
    assert len(lpc_msgs) == 1 and len(word_msgs) == 1
    assert len(chunk_msgs) == 3  # 120 frames -> 150-bucket -> 3 chunks
    first, mid, last = chunk_msgs
    assert first.received_at is not None
    assert any(n == "dv_device_done" for n, _ in first.stamps)
    assert mid.received_at is None and mid.stamps == ()
    assert last.received_at is not None
    assert any(n == "dv_word_complete" for n, _ in last.stamps)
    # Byte accounting: chunks concatenate to the word, which is T*160.
    word = np.concatenate([m.data for m in chunk_msgs])
    np.testing.assert_array_equal(word, word_msgs[0].data)
    assert len(word) == 120 * 160
    assert word_msgs[0].received_at is None  # wav tap, not a latency probe
    unit.shutdown()


def test_chunked_warmed_bucket_compiles_nothing(tmp_path):
    from test_no_stream_compiles import _compile_log

    w = _small_voc_npz(tmp_path)
    unit = FusedDecoderVocoder()
    unit.apply_settings(FusedDecoderVocoderSettings(
        path_to_model_weights=None, model=BidirectionalSpeechSynthesisModel,
        params=DEC, vocoder_backend="net", vocoder_weights=w,
        length_multiple=50, prewarm_frames=(150,), chunk_emission=True,
    ))
    unit.initialize()
    import time as _time

    # Wait for the background prewarm of the 150 bucket to finish.
    deadline = _time.time() + 300
    while _time.time() < deadline:
        try:
            with _compile_log() as compiles:
                unit._decode_head(np.zeros((120, 8), np.float32))
            if not compiles():
                break
        except Exception:
            raise
        _time.sleep(2)
    with _compile_log() as compiles:
        # 100-bucket (warmed in initialize) and 150-bucket (prewarmed):
        # head + tail for both, any chunk index.
        lpc, a0, pending, T = unit._decode_head(
            np.zeros((90, 8), np.float32))
        for k, b in enumerate(pending, start=1):
            unit._read_chunk(b, k, T)
        lpc, a0, pending, T = unit._decode_head(
            np.zeros((130, 8), np.float32))
        for k, b in enumerate(pending, start=1):
            unit._read_chunk(b, k, T)
    assert compiles() == [], f"stream-time compiles: {compiles()}"
    unit.shutdown()
