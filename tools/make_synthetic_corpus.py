"""Generate a synthetic speech-like wav corpus for vocoder training.

The image ships no speech data (and the reference's recordings are not
redistributable), so this tool synthesizes voiced/unvoiced audio with a
classic source-filter model: an impulse-train + breath-noise source with a
wandering F0, shaped by a cascade of three time-varying formant resonators
and an utterance-level amplitude envelope with pauses.  The result is not
speech, but it exercises exactly the structure LPCNet-style vocoders model
(periodic excitation, spectral envelope, voiced/unvoiced transitions), so
it is sufficient for end-to-end training demos and quality regression
anchors (see dss_tpu/eval/quality.py).

Usage: python tools/make_synthetic_corpus.py OUT_DIR [--seconds 60] [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

FS = 16000


def _formant(freq_hz: np.ndarray, bw_hz: float, x: np.ndarray) -> np.ndarray:
    """Time-varying two-pole resonator applied blockwise (10 ms blocks)."""
    out = np.empty_like(x)
    zi = np.zeros(2)
    block = 160
    for i in range(0, len(x), block):
        f = float(freq_hz[min(i // block, len(freq_hz) - 1)])
        r = np.exp(-np.pi * bw_hz / FS)
        theta = 2 * np.pi * f / FS
        a = np.array([1.0, -2 * r * np.cos(theta), r * r])
        b = np.array([1.0 - r])
        out[i:i + block], zi = lfilter(b, a, x[i:i + block], zi=zi)
    return out


def synth_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(seconds * FS)
    frames = n // 160 + 1

    # Wandering F0 (voiced) with unvoiced stretches.
    f0 = 110.0 * np.exp(np.cumsum(rng.normal(0, 0.02, frames)))
    f0 = np.clip(f0, 70, 300)
    voiced = (lfilter(np.ones(25) / 25, [1.0],
                      rng.normal(size=frames)) > -0.2)

    # Excitation: impulse train where voiced, noise where not.
    phase = np.cumsum(np.repeat(f0, 160)[:n] / FS)
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float32)
    noise = rng.normal(0, 0.05, n).astype(np.float32)
    vmask = np.repeat(voiced, 160)[:n]
    src = np.where(vmask, pulses + 0.02 * noise, 0.3 * noise)

    # Three wandering formants.
    y = src
    for centre, spread, bw in ((500, 200, 90), (1500, 500, 120),
                               (2600, 600, 160)):
        track = np.clip(centre + lfilter(np.ones(50) / 50, [1.0],
                                         rng.normal(0, spread, frames)) * 1.0,
                        150, 6000)
        y = _formant(track, bw, y)

    # Utterance envelope: syllabic modulation + inter-word pauses.
    t = np.arange(n) / FS
    env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2, 5) * t + rng.uniform(0, 6))
    gaps = np.repeat(lfilter(np.ones(40) / 40, [1.0],
                             rng.normal(size=frames)) > -0.6, 160)[:n]
    y = y * env * gaps
    y = y / (np.max(np.abs(y)) + 1e-9) * 0.7
    return (y * 32767).astype(np.int16)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--seconds", type=float, default=60.0,
                        help="Total corpus length (split into ~4 s wavs).")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n_utts = max(1, int(round(args.seconds / 4.0)))
    for i in range(n_utts):
        wavfile.write(out / f"utt_{i:04d}.wav", FS,
                      synth_utterance(rng, 4.0))
    print(f"wrote {n_utts} x 4 s wavs to {out}")


if __name__ == "__main__":
    main()
