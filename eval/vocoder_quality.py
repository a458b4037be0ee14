"""Objective vocoder quality scoring (cepstral distortion / envelope SNR).

Two modes:

* ``--roundtrip WAV``: encode the wav with the framework's feature encoder,
  synthesize with the chosen backend, and score synthesis against input —
  the standing regression check for a vocoder backend or checkpoint.
* ``REF.wav SYN.wav``: score two existing waveforms (e.g. a training epoch's
  validation render vs the original, as written by apps/train_vocoder.py).

The reference has no objective audio metric (quality was judged by listening
and the paper's analyses); this tool closes that gap for automated
regression.  Scores are computed in the vocoder's own 18-band Bark-cepstral
domain — see dss_tpu/eval/quality.py.
"""

import argparse
import json
import os
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.eval.quality import score, score_roundtrip  # noqa: E402


def _load(path: str) -> np.ndarray:
    fs, audio = wavfile.read(path)
    if fs != 16000:
        raise SystemExit(f"{path}: expected 16 kHz, got {fs} Hz")
    if audio.ndim > 1:
        audio = audio[:, 0]
    return audio


def main() -> None:
    parser = argparse.ArgumentParser(
        "Score vocoder output quality (Bark-cepstral distortion, dB).")
    parser.add_argument("reference", help="Reference wav (16 kHz mono).")
    parser.add_argument("synthesized", nargs="?", default=None,
                        help="Synthesized wav to score against the "
                             "reference; omit with --roundtrip.")
    parser.add_argument("--roundtrip", action="store_true",
                        help="Encode + synthesize the reference and score "
                             "the round trip instead of comparing two wavs.")
    parser.add_argument("--backend", default="dsp", choices=("dsp", "net"),
                        help="Vocoder backend for --roundtrip.")
    parser.add_argument("--weights", default=None,
                        help="Neural vocoder weights (.npz) for "
                             "--backend net.")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu'). Scoring is "
                             "light; CPU avoids accelerator compile time.")
    parser.add_argument("--pallas", default="auto",
                        choices=("auto", "on", "off"),
                        help="Sampler path for --backend net: 'auto' picks "
                             "Pallas on accelerators / scan on CPU (the "
                             "production default), 'on'/'off' force it — "
                             "'on' on a TPU scores the exact kernel the "
                             "online system runs.")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    ref = _load(args.reference)
    if args.roundtrip:
        if args.backend == "net":
            from dss_tpu.vocoder import LPCNet
            use_pallas = {"auto": None, "on": True, "off": False}[args.pallas]
            vocoder = LPCNet(backend="net", weights=args.weights,
                             use_pallas=use_pallas)
        else:
            from dss_tpu.vocoder.dsp import LPCVocoder
            vocoder = LPCVocoder()
        report = score_roundtrip(ref, vocoder)
    else:
        if args.synthesized is None:
            raise SystemExit("need SYN.wav (or pass --roundtrip)")
        report = score(ref, _load(args.synthesized))

    print(json.dumps({
        "cepstral_distance_db": round(report.cepstral_distance_db, 3),
        "band_level_snr_db": round(report.band_level_snr_db, 3),
        "num_frames": report.num_frames,
    }))


if __name__ == "__main__":
    main()
