"""Sweep segment-length padding buckets for the online decoder.

The online decode path (dss_tpu/runtime/units.py,
``RecurrentNeuralDecodingModel``) pads each detected speech segment to a
multiple of ``length_multiple`` frames so XLA reuses one compiled program
per bucket.  The bucket size trades two costs:

* **compiles** — every distinct padded length hit during a session compiles
  once (tens of seconds on the tunneled TPU, seconds on CPU);
* **padding waste** — padded frames are masked but still computed, so each
  inference costs ``padded / real`` of the useful work.

This tool scores candidate multiples against an observed segment-length
distribution — from real run logs (``log.vad.lab``: rows
``start<TAB>stop<TAB>"N frames"``) or a synthetic lognormal — and
optionally times each bucket's actual inference latency on the current
device.  Output: one JSON line per candidate plus a recommendation that
minimizes expected session time (compiles amortized over the session).

Usage:
    python tools/bucket_sweep.py --lab RUN1/log.vad.lab RUN2/log.vad.lab
    python tools/bucket_sweep.py --synthetic 500 --measure --platform cpu
"""

import argparse
import json
import os
import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.runtime.bucket_policy import (  # noqa: E402
    load_lab_lengths,
    recommend_prewarm,
    score_multiple,
    synthetic_lengths,
)


def sweep(lengths: np.ndarray, multiples, compile_cost_s: float,
          per_frame_s: float = None, measure: bool = False):
    results = []
    model = params = infer = None
    if measure:
        import jax
        import jax.numpy as jnp
        from dss_tpu.models.decoder import BidirectionalSpeechSynthesisModel

        model = BidirectionalSpeechSynthesisModel(nb_electrodes=64)
        params = model.init(jax.random.PRNGKey(0))
        infer = jax.jit(lambda p, x, m: model.apply(p, x, None, mask=m)[0])

    for mult in multiples:
        if not measure:
            # Cost model: latency ~ per_frame_s * padded frames.
            results.append(score_multiple(lengths, mult, compile_cost_s,
                                          per_frame_s))
            continue

        import jax.numpy as jnp

        padded = -(-lengths // mult) * mult
        buckets = Counter(padded.tolist())
        total = 0.0
        for bucket_len, count in sorted(buckets.items()):
            x = jnp.zeros((1, int(bucket_len), 64), jnp.float32)
            m = jnp.ones((1, int(bucket_len)), jnp.float32)
            np.asarray(infer(params, x, m))  # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                np.asarray(infer(params, x, m))
            total += (time.perf_counter() - t0) / reps * count
        results.append({
            "length_multiple": int(mult),
            "buckets": len(buckets),
            "padding_overhead": round(
                float(np.mean(padded / lengths) - 1.0), 4),
            "mean_inference_ms": round(total / len(lengths) * 1e3, 3),
            "est_session_s": round(total + len(buckets) * compile_cost_s, 3),
        })
    return results


def main() -> None:
    parser = argparse.ArgumentParser(
        "Sweep decoder segment-padding bucket sizes against a segment-length "
        "distribution.")
    parser.add_argument("--lab", nargs="+", default=None,
                        help="log.vad.lab files with observed segments.")
    parser.add_argument("--synthetic", type=int, default=None, metavar="N",
                        help="Use N synthetic lognormal segment lengths "
                             "instead of .lab files.")
    parser.add_argument("--multiples", type=int, nargs="+",
                        default=[10, 25, 50, 75, 100, 150])
    parser.add_argument("--compile-cost", type=float, default=30.0,
                        help="Assumed seconds per new-bucket XLA compile "
                             "(tunneled TPU ~30 s; CPU ~1 s).")
    parser.add_argument("--per-frame-us", type=float, default=150.0,
                        help="Modeled inference cost per padded frame "
                             "(microseconds) when not measuring.")
    parser.add_argument("--measure", action="store_true",
                        help="Time real decoder inference per bucket on the "
                             "current JAX device instead of the cost model.")
    parser.add_argument("--prewarm-coverage", type=float, default=0.98,
                        help="Fraction of observed segments the recommended "
                             "prewarm bucket list must cover.")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu').")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.lab:
        lengths = load_lab_lengths(args.lab)
        if len(lengths) == 0:
            raise SystemExit("no segments found in the given .lab files")
    elif args.synthetic:
        lengths = synthetic_lengths(args.synthetic)
    else:
        raise SystemExit("pass --lab FILES or --synthetic N")

    print(json.dumps({
        "segments": len(lengths),
        "frames_p50": int(np.percentile(lengths, 50)),
        "frames_p90": int(np.percentile(lengths, 90)),
        "frames_max": int(lengths.max()),
    }))

    results = sweep(lengths, args.multiples, args.compile_cost,
                    per_frame_s=args.per_frame_us * 1e-6,
                    measure=args.measure)
    for row in results:
        print(json.dumps(row))
    best = min(results, key=lambda r: r["est_session_s"])
    prewarm = recommend_prewarm(lengths, best["length_multiple"],
                                coverage=args.prewarm_coverage)
    print(json.dumps({
        "recommended_length_multiple": best["length_multiple"],
        "recommended_prewarm_frames": prewarm,
        # Paste-ready for config/debug_settings.ini [Decoding]:
        "ini": (f"segment_length_multiple = {best['length_multiple']}\n"
                f"segment_prewarm_frames = {prewarm}"),
    }))


if __name__ == "__main__":
    main()
