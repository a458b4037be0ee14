"""Day-specific z-score statistics for the online decoder.

Parity target: reference baseline_offline.py — per-trial high-gamma
features of one SyllableRepetition recording (fresh extractor per trial,
trial span padded by 0.04 s), channel mean/std stacked into
``<session>/normalization.npy`` for the online system's z-scoring.  The
CLI surface (config INI + --norm/--overwrite) and every on-disk artifact
(npy layout, ``log.normalization.txt``) match the reference contract;
the feature compute underneath is the JAX/Pallas pipeline.
"""

import argparse
import configparser
import logging
import os
import sys
from datetime import datetime
from typing import Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.utils import BCI2000MatFile  # noqa: E402

logger = logging.getLogger("baseline_offline.py")


def get_default_session_name() -> str:
    return datetime.now().strftime("%Y_%m_%d")


def get_paths(settings_filename: str) -> Tuple[str, Optional[str]]:
    """(session directory, normalization .mat path or None) from the INI.

    Empty strings mean "unset" (reference convention); an unset session
    falls back to today's date.
    """
    ini = configparser.ConfigParser()
    ini.read(settings_filename)
    sec = ini["Normalization"]
    session_dir = os.path.join(
        sec.get("base_path"),
        sec.get("session") or get_default_session_name())
    return session_dir, (sec.get("normalization_file") or None)


def main(session: str, norm_file: str) -> None:
    from prepare_corpus import get_feature_extractor

    logger.info(f"Normalization source: {norm_file}")
    rec = BCI2000MatFile(mat_filename=norm_file)
    raw = rec.signals()

    bad = rec.bad_channels()
    if bad is not None:
        logger.warning(f"Normalization recording marks bad channels {bad}")

    pad = int(0.04 * rec.fs)
    logger.info("Extracting per-trial high-gamma features for the "
                "channel statistics.")
    per_trial = [
        get_feature_extractor(rec).extract_features(raw[start:stop + pad, :])
        for _, start, stop in rec.trial_indices()
    ]

    feats = np.concatenate(per_trial)
    stats = np.vstack([feats.mean(axis=0), feats.std(axis=0)])
    out_path = os.path.join(session, "normalization.npy")
    logger.info(f"Writing [mean; std] ({stats.shape}) to {out_path}")
    np.save(out_path, stats)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute z-score statistics from .mat file")
    parser.add_argument("config", help="Path of the config file.")
    parser.add_argument("--norm", help="Path to the .mat file (overwrites the "
                                       "field normalization_file in config).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu').")
    parser.add_argument("--overwrite", required=False, default=False,
                        action="store_true",
                        help="Allow overwriting the session folder.")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    session_dir, norm_file = get_paths(args.config)
    os.makedirs(session_dir, exist_ok=args.overwrite)
    norm_file = args.norm if args.norm is not None else norm_file

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
        handlers=[
            logging.FileHandler(
                os.path.join(session_dir, "log.normalization.txt"), "w+"),
            logging.StreamHandler(sys.stderr),
        ],
    )

    if norm_file is None:
        logger.error("No normalization .mat given (INI field empty and no "
                     "--norm); nothing to do.")
        sys.exit(1)

    logger.info(f"args: config={args.config} norm={norm_file} "
                f"overwrite={args.overwrite}")
    logger.info(f"session dir: {session_dir}")
    main(session=session_dir, norm_file=norm_file)
