"""dss_tpu — TPU-native delayed speech synthesis framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
cronelab/delayed-speech-synthesis (Angrick et al., Sci Rep 2024): a
closed-loop speech neuroprosthesis streaming 128-channel ECoG over ZeroMQ,
extracting 50 ms / 10 ms-hop high-gamma log-power features, gating speech
segments with a unidirectional neural-VAD recurrent network, decoding
complete segments into 20-dim LPCNet-style acoustic features with a
bidirectional recurrent model, and vocoding 16 kHz audio on-chip.

Layer map (mirrors the reference's 7 layers, re-designed TPU-first):

  dss_tpu.ops      — signal-processing kernels (IIR scan filters, fused
                     framing + log-power in Pallas, CAR, z-score, mel/VAD)
                     [reference: extensions/hga/hga_optimized.pyx,
                      local/common.py preprocessing region]
  dss_tpu.utils    — channel maps, CV splitters, BCI2000 .mat wrapper,
                     experiment parsers, HDF I/O  [reference: local/common.py]
  dss_tpu.models   — scan-based LSTM nVAD + bidirectional decoder
                     [reference: local/models.py]
  dss_tpu.vocoder  — LPCNet-equivalent feature encoder + vocoder (DSP and
                     neural backends, Pallas autoregressive sampler)
                     [reference: extensions/lpcnet/]
  dss_tpu.train    — trial dataset, TBPTT/BPTT trainers, best-checkpointing,
                     batched on-device synthesis queue [reference:
                     local/training.py, train_*.py]
  dss_tpu.runtime  — asyncio streaming dataflow graph (Unit/System API),
                     ZMQ ingest, loggers, SoX sink [reference: local/units.py,
                     ezmsg dependency]
  dss_tpu.parallel — jax.sharding mesh helpers, sharded train/infer steps
  dss_tpu.native   — host-side C++ (BCI2000 packet codec, PCM ring buffer)
"""

__version__ = "0.1.0"


def _apply_platform_env() -> None:
    """Honor DSS_PLATFORM=cpu|tpu|... for every CLI/app uniformly.

    Some deployments force-register a remote accelerator plugin via
    sitecustomize and PREPEND it to jax_platforms, so a plain JAX_PLATFORMS
    env var cannot win; an explicit jax.config update (before the first
    backend use) can.  No-op when the variable is unset; if a backend was
    already initialized before this import, the request cannot take effect
    and a warning is emitted instead."""
    import os

    platform = os.environ.get("DSS_PLATFORM")
    if not platform:
        return
    import warnings

    import jax

    try:
        from jax._src import xla_bridge

        already = xla_bridge.backends_are_initialized()
    except (ImportError, AttributeError):  # private API moved — best effort
        already = False
    if already:
        warnings.warn(
            f"DSS_PLATFORM={platform} ignored: a JAX backend was initialized "
            "before dss_tpu was imported", RuntimeWarning, stacklevel=2)
        return
    try:
        jax.config.update("jax_platforms", platform)
    except Exception as exc:  # pragma: no cover - config surface changes
        warnings.warn(f"DSS_PLATFORM={platform} not applied: {exc}",
                      RuntimeWarning, stacklevel=2)


_apply_platform_env()
