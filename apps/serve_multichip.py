"""Multi-chip batched vocoder serving demo.

Scales the batched neural vocoder across a device mesh: N streams are
sharded over the mesh's "data" axis (dss_tpu/parallel/shard.py,
``batched_vocoder_sharding``), one jitted program advances ALL streams a
frame-chunk at a time, and GSPMD keeps every per-stream state tensor local
to its shard — there is no cross-chip communication in the vocoder at all,
so throughput scales linearly with chips.

This is the deployment answer to the reference's per-process synthesis
pool (local/training.py:165-207): where the reference parks one CPU process
per stream, a TPU pod slice serves streams_per_chip x n_chips from one
program.

Run on real hardware (devices = what's attached), or demo the sharding on
a virtual CPU mesh:

    python apps/serve_multichip.py --devices 8 --platform cpu \
        --streams-per-device 4 --frames 20

Prints one JSON line with aggregate throughput (frames/s and realtime
factor across all streams).
"""

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser(
        "Serve N batched vocoder streams over a device mesh.")
    parser.add_argument("--devices", type=int, default=None,
                        help="Mesh size; with --platform cpu this many "
                             "virtual host devices are created.")
    parser.add_argument("--streams-per-device", type=int, default=8)
    parser.add_argument("--frames", type=int, default=50,
                        help="Frames (10 ms each) per serving step.")
    parser.add_argument("--steps", type=int, default=3,
                        help="Timed serving steps (after one warm-up).")
    parser.add_argument("--weights", default=None,
                        help="Trained vocoder weights (.npz); random init "
                             "otherwise (throughput is weight-agnostic).")
    parser.add_argument("--pallas", action="store_true",
                        help="Use the Pallas AR sampler kernel (TPU only; "
                             "~5x the XLA scan path).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu').")
    args = parser.parse_args()

    # Virtual devices must be configured before the backend initializes.
    if args.platform == "cpu" and args.devices and args.devices > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dss_tpu.parallel import batched_vocoder_sharding, make_mesh
    from dss_tpu.vocoder.net import (
        LPCNetModel,
        net_synthesize_frames,
        net_vocoder_init,
    )

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    streams = n_dev * args.streams_per_device

    if args.weights:
        params = {k: jnp.asarray(v)
                  for k, v in np.load(args.weights).items()}
        # Architecture (incl. the bunch factor) rides in the checkpoint.
        model = LPCNetModel.from_params(params)
    else:
        model = LPCNetModel()
        params = model.init(jax.random.PRNGKey(0))
    state = net_vocoder_init(model, batch=streams)

    rng = np.random.default_rng(0)
    features = rng.normal(scale=0.3, size=(streams, args.frames, 20)) \
        .astype(np.float32)

    step = jax.jit(
        lambda p, s, f: net_synthesize_frames(
            model, p, s, f, use_pallas=args.pallas
        )
    )

    with mesh:
        state, feats = batched_vocoder_sharding(mesh, state, features)
        pcm, state = step(params, state, feats)  # compile + warm
        np.asarray(pcm)  # hard sync (block_until_ready is soft on axon)

        # One step including the host round trip (the latency a caller
        # sees per dispatch)...
        t0 = time.perf_counter()
        pcm, state = step(params, state, feats)
        np.asarray(pcm)
        dt_single = time.perf_counter() - t0

        # ...and the marginal cost of chained steps behind one sync (the
        # on-device serving throughput; the tunnel RPC makes per-dispatch
        # timing meaningless on this box).
        n = max(args.steps, 2)
        t0 = time.perf_counter()
        for _ in range(n):
            pcm, state = step(params, state, feats)
        np.asarray(pcm)
        dt_chain = time.perf_counter() - t0
        dt = max((dt_chain - dt_single) / (n - 1), 1e-9)

    total_frames = streams * args.frames
    audio_seconds = total_frames * 0.01
    print(json.dumps({
        "devices": n_dev,
        "streams": streams,
        "frames_per_step": args.frames,
        "dispatch_seconds": round(dt_single, 4),
        "step_seconds_device": round(dt, 4),
        "aggregate_frames_per_s": round(total_frames / dt, 1),
        "realtime_factor": round(audio_seconds / dt, 1),
        "pcm_shape": list(np.asarray(pcm).shape),
    }))


if __name__ == "__main__":
    main()
