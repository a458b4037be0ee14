"""Synthesize audio from stored vocoder features (.npy / .f32).

Capability target: the LPCNet demo flow the reference relies on
(``lpcnet_demo -features`` outputs consumed via LPCFeatureFile,
extensions/lpcnet/LPCNet.pyx:90-115) plus the training-side .npy dumps
(local/training.py:181-201).  One CLI covers both: feed it a 20-dim feature
matrix and get a 16 kHz wav through either vocoder backend.
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.utils import write_wav  # noqa: E402
from dss_tpu.vocoder import LPCNet, LPCFeatureFile  # noqa: E402

logger = logging.getLogger("synthesize.py")


def load_features(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        feats = np.load(path).astype(np.float32)
    elif path.endswith(".f32"):
        feats = np.stack(list(LPCFeatureFile(path))).astype(np.float32)
    else:
        raise SystemExit(f"Unsupported feature file: {path} (.npy or .f32)")
    if feats.ndim != 2 or feats.shape[1] < 20:
        raise SystemExit(f"Expected [frames, >=20] features, got {feats.shape}")
    return feats[:, :20]


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Vocode 20-dim acoustic features into a 16 kHz wav.")
    parser.add_argument("features", help="Feature file (.npy [T,20] or LPCNet .f32).")
    parser.add_argument("out_wav", help="Output wav path.")
    parser.add_argument("--backend", default="dsp", choices=["dsp", "net"])
    parser.add_argument("--weights", default=None,
                        help="Neural vocoder weights (.npz) for --backend net.")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    feats = load_features(args.features)
    weights = args.weights
    if args.backend == "net" and not weights:
        from dss_tpu.vocoder import packaged_weights

        weights = packaged_weights()
    vocoder = LPCNet(backend=args.backend, weights=weights)
    pcm = vocoder.synthesize_frames(feats)
    write_wav(args.out_wav, pcm, fs=16000)
    logger.info(
        f"Wrote {args.out_wav}: {len(pcm)} samples "
        f"({len(pcm) / 16000:.2f} s) from {len(feats)} frames."
    )


if __name__ == "__main__":
    main()
