"""A/B harness: synthesize an LPCNet ``.f32`` feature file and quantify
parity against a reference rendering.

Bridges reference-ecosystem assets into this framework (reference
extensions/lpcnet/LPCNet.pyx:90-115 defines the 36-column ``.f32`` feature
format; ``lpcnet_demo -features in.pcm out.f32`` produces it; ``lpcnet_demo
-synthesis out.f32 out.pcm`` is the C rendering to compare against):

  # our rendering of the same features
  python tools/vocoder_ab.py feats.f32 --weights model.npz --out ours.wav \
      [--h5 lpcnet.h5]            # released Keras checkpoint instead of npz
  # parity numbers vs the C (or any) rendering
  python tools/vocoder_ab.py feats.f32 --weights model.npz \
      --ref-pcm theirs.pcm --out ours.wav

Parity metrics: Bark-cepstral distortion and per-band level SNR between the
two renderings (frame-aligned — both vocoders are frame-synchronous), plus
basic waveform stats.  Autoregressive samplers never match sample-for-
sample (different RNGs), so spectral-envelope distance is the meaningful
number; < ~4 dB is "same voice, same intelligibility" territory.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("features", help="36-column .f32 LPCNet feature file")
    parser.add_argument("--weights", default=None,
                        help=".npz checkpoint (native trainer format)")
    parser.add_argument("--h5", default=None,
                        help="Keras LPCNet checkpoint (xiph layout)")
    parser.add_argument("--out", default="ab_ours.wav")
    parser.add_argument("--ref-pcm", default=None,
                        help="Reference rendering: raw int16 @ 16 kHz "
                             "(lpcnet_demo -synthesis output) or a .wav")
    parser.add_argument("--rtf", action="store_true",
                        help="Time the synthesis (after a warm-up compile) "
                             "and report the realtime factor — wall clock "
                             "including host transfer, hard-synced")
    args = parser.parse_args()

    from dss_tpu.vocoder.lpcnet import LPCNet, LPCFeatureFile
    from dss_tpu.utils import read_wav, write_wav

    if args.h5:
        from dss_tpu.vocoder.interop import import_lpcnet_h5

        params, model = import_lpcnet_h5(args.h5)
        voc = LPCNet(backend="net", model=model, weights=params)
    else:
        voc = LPCNet(backend="net" if args.weights else "dsp",
                     weights=args.weights)

    feats = np.stack(list(LPCFeatureFile(args.features)))
    print(f"features: {feats.shape[0]} frames "
          f"({feats.shape[0] * 0.01:.2f} s)")
    if args.rtf:
        import time

        backend = getattr(voc, "use_pallas", None)
        voc.warm(feats.shape[0])  # compile + transfer-warm, hard-synced
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pcm = voc.synthesize_frames(feats)  # hard sync inside
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        audio_s = feats.shape[0] * 0.01
        print(f"rtf: {audio_s / wall:.1f}x realtime wall "
              f"({audio_s:.2f} s audio in {wall * 1e3:.1f} ms incl. one "
              f"host round trip, pallas={backend})")
        # Device-time estimate: marginal cost of chained state-dependent
        # calls behind one sync (amortizes the per-call host round trip —
        # ~30 ms on a tunneled chip; see bench.py for the methodology).
        if backend:
            from dss_tpu.vocoder.net import net_synthesize_frames
            import jax.numpy as jnp

            fx = jnp.asarray(feats, jnp.float32)[None]
            chain, best = 4, 0.0
            st = voc._state
            for _ in range(3):  # min-time over reps (tunnel stalls happen)
                t0 = time.perf_counter()
                for _ in range(chain):
                    pcm_d, st = net_synthesize_frames(
                        voc._model, voc._params, st, fx, use_pallas=True,
                        sparse_pattern=voc._sparse)
                np.asarray(pcm_d)
                t_chain = time.perf_counter() - t0
                best = max(best,
                           audio_s * (chain - 1) / max(t_chain - wall, 1e-9))
            print(f"rtf: {best:.1f}x realtime device "
                  f"(chained-call estimate, {chain} calls, best of 3)")
    else:
        pcm = voc.synthesize_frames(feats)
    write_wav(args.out, pcm.astype(np.int16))
    print(f"ours: {args.out} rms={np.sqrt(np.mean(pcm.astype(float)**2)):.1f} "
          f"peak={np.abs(pcm).max()}")

    if args.ref_pcm:
        if args.ref_pcm.endswith(".wav"):
            _, ref = read_wav(args.ref_pcm)
        else:
            ref = np.fromfile(args.ref_pcm, dtype=np.int16)
        n = min(len(ref), len(pcm))
        print(f"ref:  {args.ref_pcm} rms="
              f"{np.sqrt(np.mean(ref[:n].astype(float) ** 2)):.1f} "
              f"({len(ref)} samples; comparing {n})")

        from dss_tpu.eval.quality import score

        report = score(ref[:n], pcm[:n])
        print(f"A/B Bark-cepstral distortion: "
              f"{report.cepstral_distance_db:.2f} dB")
        print(f"A/B band-level SNR:           "
              f"{report.band_level_snr_db:.2f} dB")


if __name__ == "__main__":
    main()
