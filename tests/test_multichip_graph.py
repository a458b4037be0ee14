"""Multi-chip correctness one level up (VERDICT r3 item 8): the closed-loop
RUNTIME GRAPH — replay amplifier over real ZMQ -> ingest -> fused
frontend+VAD -> segment close -> SPMD word program — driven end to end with
the serving vocoder sharded over the 8-virtual-device CPU mesh.

The round-3 multichip dryrun covered five jitted programs in isolation;
this covers the runtime wiring around them: sharded device_puts inside the
unit's single-worker executor, mesh-context execution from an asyncio
graph, carried sharded vocoder state across words, and the log/audio
contracts downstream of an SPMD unit.
"""

import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

PORT = 5898

from test_end_to_end import _ThresholdVAD, _make_session_mat  # noqa: E402


def _small_voc_npz(tmp_path):
    import jax

    from dss_tpu.vocoder.net import LPCNetModel

    m = LPCNetModel(gru_a_units=64, gru_b_units=16, cond_dim=32,
                    embed_dim=16)
    p = m.init(jax.random.PRNGKey(2))
    path = tmp_path / "voc_small.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in p.items()})
    return str(path)


def test_closed_loop_graph_with_sharded_word_path(tmp_path, monkeypatch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    mat_path = tmp_path / "KeywordSynthesis_Overt_R01.mat"
    _make_session_mat(mat_path)
    voc_w = _small_voc_npz(tmp_path)

    import decode_online
    from development_amplifier import Amplifier

    from dss_tpu.runtime.units import (
        ShardedFusedDecoderVocoder,
        ShardedFusedDecoderVocoderSettings,
        ZMQConnectorSettings,
    )

    run_dir = tmp_path / "run"
    os.makedirs(run_dir)

    settings = decode_online.NeuroprosthesisSettings(
        destination_dir=str(run_dir),
        address="127.0.0.1",
        fs=1000,
        package_size=40,
        idle_timeout=8.0,
        vocoder_backend="net",
        fused_frontend=True,
        fused_decoder=True,
    )
    system = decode_online.Neuroprosthesis(settings)
    # Swap the single-chip fused word unit for the SPMD serving unit: it
    # exposes the same INPUT/LPC/OUTPUT/WORD surface, so network() wiring
    # is untouched — exactly the coverage this test exists for.
    system.DECODE_VOCODE = ShardedFusedDecoderVocoder()

    original_configure = system.configure

    def reconfigure():
        original_configure()
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
        system.CONNECTOR.apply_settings(ZMQConnectorSettings(
            fs=1000, address="127.0.0.1", port=PORT, idle_timeout=8.0,
        ))
        from dss_tpu.models import BidirectionalSpeechSynthesisModel

        system.DECODE_VOCODE.apply_settings(
            ShardedFusedDecoderVocoderSettings(
                path_to_model_weights=None,
                model=BidirectionalSpeechSynthesisModel,
                params=dict(nb_layer=1, nb_hidden_units=16,
                            nb_electrodes=64),
                vocoder_weights=voc_w,
                length_multiple=50, prewarm_frames=(),
                n_devices=8, streams=8,
            ))

    system.configure = reconfigure

    import io

    class _FakeStdout:
        def __init__(self):
            self.buffer = io.BytesIO()

        def flush(self):
            pass

    fake_stdout = _FakeStdout()
    import dss_tpu.runtime.units as units_mod

    monkeypatch.setattr(units_mod.sys, "stdout", fake_stdout)

    def run_amplifier():
        amp = Amplifier(mat_file=str(mat_path), package_size=40,
                        loop=False, seconds=0, port=PORT, epsilon=0.005)
        amp.stream()
        amp.close()

    amp_thread = threading.Thread(target=run_amplifier, daemon=True)
    amp_thread.start()

    import dss_tpu.runtime as ez

    ez.run_system(system)
    amp_thread.join(timeout=10)

    # The SPMD unit ran over the mesh (4-way data x 2-way model axes
    # exist; serve batch 8 sharded over data).
    assert system.DECODE_VOCODE._mesh.shape["data"] >= 2
    # The burst was segmented, decoded and vocoded through the graph.
    vad_lines = (run_dir / "log.vad.lab").read_text().strip().split("\n")
    assert len(vad_lines) >= 1, vad_lines
    lpc = np.fromfile(run_dir / "log.lpc.f32", np.float32).reshape(-1, 20)
    assert len(lpc) >= 100
    wav = run_dir / "reco" / "reco_00001.wav"
    assert wav.exists()
    from scipy.io.wavfile import read as wavread

    fs, pcm = wavread(str(wav))
    assert fs == 16000 and pcm.dtype == np.int16
    # Audio accounting: the wav tap carries whole words (160 samples per
    # decoded frame over the segmented spans).
    n_seg_frames = sum(
        int(line.split("\t")[2].split()[0].strip('"'))
        for line in vad_lines)
    total_wav = sum(
        len(wavread(str(run_dir / "reco" / f"reco_{i + 1:05d}.wav"))[1])
        for i in range(len(vad_lines)))
    assert total_wav == n_seg_frames * 160
    # The stdout sink saw the same bytes (OUTPUT path).
    assert len(fake_stdout.buffer.getvalue()) == total_wav * 2
