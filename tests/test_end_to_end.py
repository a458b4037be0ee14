"""Closed-loop integration test: replay amplifier -> ZMQ -> feature
extraction -> VAD gating -> decode -> vocoder -> logs, without hardware.

This is the reference's own validation strategy ("closed loop without a real
amplifier", development_amplifier.py:156-158) turned into an automated test:
a synthetic BCI2000 recording with one loud speech-like burst streams over
real ZMQ sockets into the full Neuroprosthesis graph; the burst must come out
the other end as a synthesized wav segment plus correctly-formatted logs.
"""

import os
import sys
import threading

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import savemat

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

PORT = 5899  # avoid clashing with anything on the default 5556


def _make_session_mat(path, fs=1000, seconds=6.0, burst=(2.0, 3.5)):
    """128-channel noise with a common loud-envelope burst (independent
    per-channel noise so CAR keeps the power)."""
    rng = np.random.default_rng(7)
    T = int(seconds * fs)
    envelope = np.full(T, 0.05)
    envelope[int(burst[0] * fs):int(burst[1] * fs)] = 2.0
    signal = rng.normal(size=(T, 129)) * envelope[:, None]
    code = np.zeros(T, np.int16)
    code[int(burst[0] * fs):int(burst[1] * fs)] = 1
    savemat(str(path), {
        "signal": signal,
        "parameters": {
            "SamplingRate": {"NumericValue": fs},
            "SourceChGain": {"NumericValue": np.ones(129)},
            "Stimuli": {"Value": np.array([["Enter"]])},
        },
        "states": {"StimulusCode": code},
    })


class _ThresholdVAD:
    """Deterministic stand-in for the trained nVAD: speech iff the mean
    feature crosses a threshold (keeps the integration test independent of
    training)."""

    nb_layer = 1

    def __init__(self, threshold=-2.5, **_):
        self.threshold = threshold

    def init(self, key):
        return {}

    def create_new_initial_state(self, batch_size):
        return jnp.zeros((1, batch_size, 1))

    def apply(self, params, x, state=None, **_):
        speech = jnp.mean(x, axis=-1, keepdims=True) > self.threshold
        logits = jnp.concatenate([1.0 - speech, speech.astype(jnp.float32)],
                                 axis=-1)
        return logits, state


@pytest.mark.parametrize("fused,fused_decoder", [
    (False, False),
    (True, False),
    (False, True),  # fused decode+vocode word path (dsp backend, host voc)
])
def test_closed_loop(tmp_path, monkeypatch, fused, fused_decoder):
    mat_path = tmp_path / "KeywordSynthesis_Overt_R01.mat"
    _make_session_mat(mat_path)

    import decode_online
    from development_amplifier import Amplifier

    run_dir = tmp_path / "run"
    os.makedirs(run_dir)

    settings = decode_online.NeuroprosthesisSettings(
        destination_dir=str(run_dir),
        address="127.0.0.1",
        fs=1000,
        package_size=40,
        idle_timeout=8.0,
        vocoder_backend="dsp",
        fused_frontend=fused,
        fused_decoder=fused_decoder,
    )
    system = decode_online.Neuroprosthesis(settings)

    # Swap the trained VAD for the deterministic threshold stand-in and
    # point the connector at the test port.
    original_configure = system.configure
    from dss_tpu.runtime.units import ZMQConnectorSettings

    def reconfigure_port():
        original_configure()
        if fused:
            s = system.FUSED_FRONTEND.SETTINGS
            system.FUSED_FRONTEND.apply_settings(
                type(s)(
                    nb_features=s.nb_features, fs=s.fs,
                    buffer_size=s.buffer_size,
                    context_frames=s.context_frames,
                    pre_transforms=s.pre_transforms,
                    post_transforms=s.post_transforms,
                    package_size=s.package_size,
                    raw_channels=s.raw_channels,
                    vad_architecture=_ThresholdVAD,
                    vad_weights_path=None, vad_parameters=None,
                )
            )
        else:
            s = system.SPEECH_FILTER.SETTINGS
            system.SPEECH_FILTER.apply_settings(
                type(s)(
                    nb_features=s.nb_features, fs=s.fs,
                    buffer_size=s.buffer_size,
                    context_frames=s.context_frames,
                    vad_architecture=_ThresholdVAD,
                    vad_weights_path=None, vad_parameters=None,
                )
            )
        system.CONNECTOR.apply_settings(ZMQConnectorSettings(
            fs=1000, address="127.0.0.1", port=PORT, idle_timeout=8.0,
        ))

    system.configure = reconfigure_port

    # Don't spam the test's stdout with PCM: swap in a sink object.
    import io

    class _FakeStdout:
        def __init__(self):
            self.buffer = io.BytesIO()

        def flush(self):
            pass

    fake_stdout = _FakeStdout()
    import dss_tpu.runtime.units as units_mod

    monkeypatch.setattr(units_mod.sys, "stdout", fake_stdout)

    # Two replay sessions back to back through one decode run: the stream
    # "restarts" (amplifier process dies and a new one binds) and the decoder
    # must keep segmenting — the reference's stream-restart story
    # (WarmStartFrameBuffer.reset / ZMQ auto-reconnect).
    def run_amplifiers():
        for _ in range(2):
            # epsilon=5ms: the default 100ns spin-wait would starve the
            # decoder on a single-core test machine and drop packets.
            amp = Amplifier(mat_file=str(mat_path), package_size=40,
                            loop=False, seconds=0, port=PORT, epsilon=0.005)
            amp.stream()
            amp.close()

    amp_thread = threading.Thread(target=run_amplifiers, daemon=True)
    amp_thread.start()

    import dss_tpu.runtime as ez

    ez.run_system(system)
    amp_thread.join(timeout=10)

    # Raw log: one float64 row per streamed sample, all 129 recorded
    # channels (128 ECoG + audio) exactly as the amplifier sends them.
    raw = np.fromfile(run_dir / "log.raw.f64", np.float64).reshape(-1, 129)
    assert len(raw) >= 5000  # ~6 s at 1 kHz (allow drop-old losses)

    # HGA log: 64 z-scored feature channels at 100 Hz.
    hga = np.fromfile(run_dir / "log.hga.f64", np.float64).reshape(-1, 64)
    assert len(hga) >= len(raw) // 10 - 10

    # Both bursts (one per replay session) must have been segmented,
    # decoded, and vocoded.
    vad_lines = (run_dir / "log.vad.lab").read_text().strip().split("\n")
    assert len(vad_lines) >= 2, vad_lines
    assert all(line.split("\t")[2].endswith("frames") for line in vad_lines)
    # Burst spans 2.0-3.5 s; the segment includes 0.5 s trailing context and
    # the smoothing delay, so SOME segment must start near 2 s (within 1 s
    # warmup fuzz) with duration > 1 s.  Under heavy machine load the IIR
    # warm-up transient can also emit a spurious early segment (the reference
    # formula at local/units.py:444 yields the same), so don't require the
    # burst to be the FIRST line.
    spans = [(float(s), float(e)) for s, e, _ in
             (line.split("\t") for line in vad_lines)]
    assert any(1.0 <= s <= 3.0 and e - s >= 1.0 for s, e in spans), spans

    lpc = np.fromfile(run_dir / "log.lpc.f32", np.float32).reshape(-1, 20)
    assert len(lpc) >= 100  # >= 1 s of decoded frames

    wav_file = run_dir / "reco" / "reco_00001.wav"
    assert wav_file.exists()
    assert (run_dir / "reco" / "reco_00002.wav").exists()
    from scipy.io.wavfile import read as wavread

    fs, pcm = wavread(str(wav_file))
    assert fs == 16000
    assert pcm.dtype == np.int16
    # All decoded frames were vocoded across the segments.
    total = sum(
        len(wavread(str(run_dir / "reco" / f"reco_{i + 1:05d}.wav"))[1])
        for i in range(len(vad_lines))
    )
    assert total == len(lpc) * 160
