"""Benchmark driver: prints ONE JSON line with the headline metric.

Primary metric: LPCNet-equivalent vocoder real-time factor per core for a
single stream (north-star target: >= 20x; vs_baseline = RTF / 20).  Also
reports the batched-64 vocoder aggregate RTF, high-gamma front-end frame
throughput, and the p50 packet->feature->VAD->decode latency of the jitted
online path.

Run on the real TPU chip by the round driver; falls back to CPU cleanly.
"""

import json
import time

import numpy as np


def _bench_vocoder(n_frames: int = 200, batch: int = 1) -> float:
    """Real-time factor: synthesized-audio seconds per wall second."""
    import jax

    from dss_tpu.vocoder import LPCNetModel
    from dss_tpu.vocoder.net import net_synthesize_frames, net_vocoder_init

    model = LPCNetModel()
    params = model.init(jax.random.PRNGKey(0))
    state = net_vocoder_init(model, batch=batch)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(batch, n_frames, 20)).astype(np.float32) * 0.1
    feats[..., 18] = 0.0
    feats[..., 19] = 0.2

    # Warm-up (compile)
    pcm, state = net_synthesize_frames(model, params, state, feats[:, :2])
    jax.block_until_ready(pcm)

    t0 = time.perf_counter()
    pcm, state = net_synthesize_frames(model, params, state, feats)
    jax.block_until_ready(pcm)
    dt = time.perf_counter() - t0
    audio_seconds = batch * n_frames * 160 / 16000.0
    return audio_seconds / dt


def _bench_hga(packets: int = 200) -> float:
    """Frames/sec through the jitted 40-sample packet front-end (64 ch)."""
    import jax
    import jax.numpy as jnp

    from dss_tpu.ops import HighGammaExtractor

    ex = HighGammaExtractor(fs=1000, nb_electrodes=64)
    state = ex.init_state()
    rng = np.random.default_rng(0)
    packet = jnp.asarray(rng.normal(size=(40, 64)), jnp.float32)

    feats, state = ex.packet_step(state, packet)  # compile
    jax.block_until_ready(feats)

    t0 = time.perf_counter()
    for _ in range(packets):
        feats, state = ex.packet_step(state, packet)
    jax.block_until_ready(feats)
    dt = time.perf_counter() - t0
    return packets * 4 / dt  # 4 frames per 40 ms packet


def _bench_latency(iters: int = 100) -> float:
    """p50 wall latency of packet -> features -> VAD step (the per-packet
    critical path of the online system), milliseconds."""
    import jax
    import jax.numpy as jnp

    from dss_tpu.models import UnidirectionalVoiceActivityDetector
    from dss_tpu.ops import HighGammaExtractor

    ex = HighGammaExtractor(fs=1000, nb_electrodes=64)
    fe_state = ex.init_state()
    vad = UnidirectionalVoiceActivityDetector(2, 150, 64)
    params = vad.init(jax.random.PRNGKey(0))
    vad_state = vad.create_new_initial_state(1)

    @jax.jit
    def packet_path(fe_state, vad_state, packet):
        feats, fe_state = ex.packet_step(fe_state, packet)
        logits, vad_state = vad.apply(params, feats[None], vad_state)
        return fe_state, vad_state, jnp.argmax(logits, axis=-1)

    rng = np.random.default_rng(0)
    packet = jnp.asarray(rng.normal(size=(40, 64)), jnp.float32)
    fe_state, vad_state, labels = packet_path(fe_state, vad_state, packet)
    jax.block_until_ready(labels)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fe_state, vad_state, labels = packet_path(fe_state, vad_state, packet)
        jax.block_until_ready(labels)
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(times, 50))


def main() -> None:
    rtf1 = _bench_vocoder(batch=1)
    rtf64 = _bench_vocoder(batch=64, n_frames=100)
    hga_fps = _bench_hga()
    p50_ms = _bench_latency()

    result = {
        "metric": "vocoder_rtf_1stream",
        "value": round(rtf1, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf1 / 20.0, 3),
        "extra": {
            "vocoder_rtf_64stream_aggregate": round(rtf64, 3),
            "hga_frames_per_sec": round(hga_fps, 1),
            "packet_to_vad_p50_ms": round(p50_ms, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
