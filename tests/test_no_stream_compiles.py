"""Regression: the per-packet online path must not compile at stream time.

A stream-time compile (even a tiny implicit jit like a dtype cast or a
bare jnp.argmax) blocks the event loop for seconds-to-minutes on remote
backends and conflate then drops the live stream. These tests pin that
every device program used per packet is compiled during initialize().
"""

import numpy as np
import pytest

from dss_tpu.models import UnidirectionalVoiceActivityDetector
from dss_tpu.runtime.units import (
    FilterSpeechSegments,
    FilterSpeechSegmentsSettings,
    FusedFrontendVad,
    FusedFrontendVadSettings,
    HighGammaActivity,
    HighGammaActivitySettings,
)


import contextlib


@contextlib.contextmanager
def _compile_log():
    """Capture jax 'Compiling ...' log lines; yields a callable returning
    the compile messages recorded so far."""
    import logging

    import jax

    jax.config.update("jax_log_compiles", True)
    records = []
    handler = logging.Handler()
    handler.emit = lambda record: records.append(record.getMessage())
    names = ("jax._src.interpreters.pxla", "jax._src.dispatch")
    for name in names:
        logging.getLogger(name).addHandler(handler)
    try:
        yield lambda: [m for m in records if m.startswith("Compiling ")]
    finally:
        jax.config.update("jax_log_compiles", False)
        for name in names:
            logging.getLogger(name).removeHandler(handler)


def test_vad_unit_compiles_nothing_per_packet():
    unit = FilterSpeechSegments()
    unit.apply_settings(FilterSpeechSegmentsSettings(
        nb_features=64, fs=100,
        vad_architecture=UnidirectionalVoiceActivityDetector,
        vad_parameters=dict(nb_electrodes=64, nb_hidden_units=16,
                            nb_layer=2),
        buffer_size=200, context_frames=5,
    ))
    unit.initialize()
    warmed = unit._infer._cache_size()
    assert warmed == 2  # warm-start (1 frame) + steady (4 frames)

    rng = np.random.default_rng(0)
    with _compile_log() as compiles:
        for frames in (1, 4, 4):
            unit._vad_labels(rng.normal(size=(frames, 64)))  # float64 input!
    assert unit._infer._cache_size() == warmed
    assert compiles() == [], f"stream-time compiles: {compiles()}"
    unit.shutdown()


@pytest.mark.parametrize("unit_cls,settings", [
    (HighGammaActivity, None),
    (FusedFrontendVad, None),
])
def test_packet_units_compile_nothing_per_packet(unit_cls, settings):
    common = dict(fs=1000, window_length=0.05, window_shift=0.01,
                  package_size=40, raw_channels=8)
    if unit_cls is HighGammaActivity:
        unit = HighGammaActivity()
        unit.apply_settings(HighGammaActivitySettings(
            nb_electrodes=8, **common))
    else:
        unit = FusedFrontendVad()
        unit.apply_settings(FusedFrontendVadSettings(
            nb_features=8,
            vad_architecture=UnidirectionalVoiceActivityDetector,
            vad_parameters=dict(nb_electrodes=8, nb_hidden_units=16,
                                nb_layer=2),
            buffer_size=200, context_frames=5,
            # Coalesce batch shapes compile in a background thread BY
            # DESIGN (off the packet critical path); disable them here so
            # the compile log captures only per-packet compiles.
            coalesce_packets=(), **common))
    unit.initialize()

    rng = np.random.default_rng(1)
    step = (unit._packet_features if unit_cls is HighGammaActivity
            else unit._step)
    with _compile_log() as compiles:
        for _ in range(3):
            step(rng.normal(size=(40, 8)))  # float64 packets, like the wire
    assert compiles() == [], f"stream-time compiles: {compiles()}"
    unit.shutdown()


def test_fused_and_separate_paths_agree():
    """The fused frontend+VAD unit must produce the same features and
    labels as the separate HighGammaActivity -> FilterSpeechSegments
    chain (both wirings are selectable in decode_online)."""
    common = dict(fs=1000, window_length=0.05, window_shift=0.01,
                  package_size=40, raw_channels=8)
    vad_kw = dict(vad_architecture=UnidirectionalVoiceActivityDetector,
                  vad_parameters=dict(nb_electrodes=8, nb_hidden_units=16,
                                      nb_layer=2),
                  buffer_size=200, context_frames=5)

    fused = FusedFrontendVad()
    fused.apply_settings(FusedFrontendVadSettings(
        nb_features=8, **vad_kw, **common))
    fused.initialize()

    hga = HighGammaActivity()
    hga.apply_settings(HighGammaActivitySettings(nb_electrodes=8, **common))
    hga.initialize()
    vad = FilterSpeechSegments()
    vad.apply_settings(FilterSpeechSegmentsSettings(
        nb_features=8, fs=100, **vad_kw))
    vad.initialize()

    rng = np.random.default_rng(5)
    for _ in range(6):
        pkt = rng.normal(size=(40, 8))
        f_feats, f_labels = fused._step(pkt)
        s_feats = hga._packet_features(pkt)
        s_labels = vad._vad_labels(s_feats)
        np.testing.assert_allclose(f_feats, s_feats, atol=1e-5)
        np.testing.assert_array_equal(f_labels, s_labels)
    for u in (fused, hga, vad):
        u.shutdown()


def test_coalesced_frontend_matches_per_packet():
    """Draining a packet backlog in one device call (the coalescing path)
    must produce the identical feature/label stream as one-at-a-time
    processing: the filter scan, framer carry, and VAD recurrence are
    streaming-equivalent over concatenation."""
    kw = dict(fs=1000, window_length=0.05, window_shift=0.01,
              package_size=40, raw_channels=8, nb_features=8,
              vad_architecture=UnidirectionalVoiceActivityDetector,
              vad_parameters=dict(nb_electrodes=8, nb_hidden_units=16,
                                  nb_layer=2),
              buffer_size=200, context_frames=5)

    one = FusedFrontendVad()
    one.apply_settings(FusedFrontendVadSettings(coalesce_packets=(), **kw))
    one.initialize()
    batched = FusedFrontendVad()
    batched.apply_settings(FusedFrontendVadSettings(
        coalesce_packets=(2, 4), **kw))
    batched.initialize()

    rng = np.random.default_rng(7)
    pkts = [rng.normal(size=(40, 8)) for _ in range(7)]

    fa, la = zip(*(one._step(p) for p in pkts))
    fa, la = np.concatenate(fa), np.concatenate(la)

    fb, lb = [], []
    for chunk in ([pkts[0]], pkts[1:3], pkts[3:7]):  # sizes 1, 2, 4
        f, l = batched._step(np.concatenate(chunk, axis=0))
        assert len(f) == 4 * len(chunk)  # 4 frames per 40 ms packet
        fb.append(f)
        lb.append(l)
    np.testing.assert_allclose(np.concatenate(fb), fa, atol=1e-5)
    np.testing.assert_array_equal(np.concatenate(lb), la)
    one.shutdown()
    batched.shutdown()
