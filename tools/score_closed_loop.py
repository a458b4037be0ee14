"""Score a closed-loop run's reco wavs against offline resynthesis.

The closed loop logs, per completed speech segment, both the decoded LPC
features (``log.lpc.f32``, [T, 20] float32 rows) and the audio the online
vocoder synthesized from them (``reco/reco_%05d.wav``).  This tool
resynthesizes each segment OFFLINE from those same logged features with
the same checkpoint and scores both renderings against the logged
conditioning (Bark-cepstral distance between each waveform's encoded band
energies and the bands the features prescribe — the free-running
synthesis-fidelity metric of dss_tpu.eval.quality, with the reference
taken from the features instead of a reference waveform).

If the online path (Pallas kernels, fused decode+vocode program, carried
stream state, packed readback) costs nothing, the two scores match; the
report makes that claim checkable per run::

    python tools/score_closed_loop.py RUN_DIR --weights weights/...npz \
        [--platform cpu] [--out report.json]

``delta_db`` = online_score - offline_score per segment (positive = the
online rendering tracks its conditioning worse than offline).  The ship
expectation is |mean delta| < 1 dB (VERDICT r2 item 4: "closed-loop wavs
score within 1 dB of offline").

The reference system had no such check — its online LPCNet (reference
extensions/lpcnet/LPCNet.pyx:30-40) was the same C code offline and
online, so parity was structural; here the online path is a different
(fused, streaming) program and earns the check.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_segments(run_dir: str):
    """-> (list of [T, 20] feature arrays, list of reco waveforms)."""
    lpc = np.fromfile(os.path.join(run_dir, "log.lpc.f32"),
                      dtype=np.float32).reshape(-1, 20)
    lengths = []
    with open(os.path.join(run_dir, "log.vad.lab")) as fd:
        for line in fd:
            parts = line.strip().split("\t")
            if len(parts) == 3:
                lengths.append(int(parts[2].split()[0]))
    if sum(lengths) != len(lpc):
        raise SystemExit(
            f"log.vad.lab frames ({sum(lengths)}) != log.lpc.f32 rows "
            f"({len(lpc)}) — partial/unflushed run?")
    feats, recos, off = [], [], 0
    for i, n in enumerate(lengths):
        feats.append(lpc[off:off + n])
        off += n
        path = os.path.join(run_dir, "reco", f"reco_{i + 1:05d}.wav")
        fs, audio = wavfile.read(path)
        if fs != 16000:
            raise SystemExit(f"{path}: expected 16 kHz, got {fs}")
        if len(audio) != n * 160:
            raise SystemExit(f"{path}: {len(audio)} samples != {n}*160")
        recos.append(audio)
    return feats, recos


def fidelity_db(feats: np.ndarray, audio: np.ndarray,
                skip_frames: int = 2) -> float:
    """Bark-cepstral distance (dB) between a waveform's encoded band
    energies and the band energies its conditioning features prescribe
    (dss_tpu.eval.quality.cepstral_distance with the reference bands taken
    from the features)."""
    from dss_tpu.eval.quality import _FLOOR_DB, _log_bands
    from dss_tpu.vocoder.lpc import DCT_MATRIX, NB_BANDS

    ref = feats[:, :NB_BANDS].astype(np.float64) @ DCT_MATRIX
    peak = np.max(ref, axis=1, keepdims=True)
    ref = np.maximum(ref, peak - _FLOOR_DB / 10.0)
    got = _log_bands(audio)
    n = min(len(ref), len(got))
    if n <= skip_frames:
        raise ValueError(f"segment too short: {n} frames")
    d_db = 10.0 * (ref[skip_frames:n] - got[skip_frames:n])
    return float(np.mean(np.sqrt(np.mean(d_db * d_db, axis=1))))


def main() -> None:
    ap = argparse.ArgumentParser(
        "Score closed-loop reco wavs vs offline resynthesis of the same "
        "logged features.")
    ap.add_argument("run_dir", help="decode_online run directory "
                                    "(log.lpc.f32 + log.vad.lab + reco/)")
    ap.add_argument("--weights", required=True,
                    help="The vocoder checkpoint the run used (.npz).")
    ap.add_argument("--platform", default=None,
                    help="Force a JAX platform (e.g. 'cpu').")
    ap.add_argument("--pallas", default="auto", choices=("auto", "on", "off"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-frames", type=int, default=30,
                    help="Skip segments shorter than this (transient-"
                         "dominated scores).")
    ap.add_argument("--limit", type=int, default=0,
                    help="Score at most this many segments (0 = all); "
                         "evenly spaced over the run.")
    ap.add_argument("--out", default=None, help="Also write JSON here.")
    ap.add_argument("--quiet-sharpen", action="store_true",
                    help="Match the online units' quiet-frame squelch "
                         "(decode_online defaults it ON) so the offline "
                         "rendering runs the same sampler config.")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dss_tpu.vocoder.lpcnet import LPCNet

    # The comparison is only meaningful when the offline resynthesis uses
    # the same vocoder the run used; decode_online logs its config.
    run_log = os.path.join(args.run_dir, "log.run.txt")
    if os.path.exists(run_log):
        with open(run_log) as fd:
            for line in fd:
                if "Vocoder: backend=" in line:
                    cfg = line.split("Vocoder: ")[1].strip()
                    if "backend=net" not in cfg or \
                            os.path.basename(args.weights) not in cfg:
                        print(f"WARNING: run used '{cfg}' but scoring "
                              f"against {args.weights} — deltas compare "
                              f"different vocoders, not the online path",
                              file=sys.stderr)
                    break

    feats, recos = read_segments(args.run_dir)
    use_pallas = {"auto": None, "on": True, "off": False}[args.pallas]
    voc = LPCNet(backend="net", weights=args.weights, seed=args.seed,
                 use_pallas=use_pallas,
                 quiet_sharpen=args.quiet_sharpen)

    eligible = [i for i, f in enumerate(feats)
                if len(f) >= args.min_frames]
    if args.limit and len(eligible) > args.limit:
        sel = np.linspace(0, len(eligible) - 1, args.limit).astype(int)
        eligible = [eligible[k] for k in sel]

    rows = []
    for i in eligible:
        f, reco = feats[i], recos[i]
        voc.reset_decoder()
        offline = voc.synthesize_frames(f)[: len(f) * 160]
        d_on = fidelity_db(f, reco)
        d_off = fidelity_db(f, offline)
        rows.append({"segment": i + 1, "frames": len(f),
                     "online_db": round(d_on, 3),
                     "offline_db": round(d_off, 3),
                     "delta_db": round(d_on - d_off, 3)})

    if not rows:
        raise SystemExit(f"no segments >= {args.min_frames} frames")
    deltas = [r["delta_db"] for r in rows]
    report = {
        "run_dir": args.run_dir,
        "weights": args.weights,
        "n_segments": len(rows),
        "online_db_mean": round(float(np.mean([r["online_db"]
                                               for r in rows])), 3),
        "offline_db_mean": round(float(np.mean([r["offline_db"]
                                                for r in rows])), 3),
        "delta_db_mean": round(float(np.mean(deltas)), 3),
        "delta_db_max": round(float(np.max(np.abs(deltas))), 3),
        "segments": rows,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as fd:
            json.dump(report, fd, indent=1)


if __name__ == "__main__":
    main()
