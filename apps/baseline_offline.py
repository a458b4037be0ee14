"""Compute day-specific z-score normalization statistics.

Parity target: reference baseline_offline.py — reads a SyllableRepetition
.mat recording, extracts per-trial high-gamma features (with a fresh
extractor per trial), and stores ``np.vstack([mean, std])`` into
``<session>/normalization.npy`` for the online system's z-scoring.
"""

import argparse
import configparser
import logging
import os
import sys
from datetime import datetime
from typing import Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dss_tpu.utils import BCI2000MatFile  # noqa: E402

logger = logging.getLogger("baseline_offline.py")


def get_default_session_name() -> str:
    return datetime.now().strftime("%Y_%m_%d")


def get_paths(settings_filename: str) -> Tuple[str, str]:
    settings_config = configparser.ConfigParser()
    settings_config.read(settings_filename)

    base_path = settings_config.get("Normalization", "base_path")
    session = settings_config.get("Normalization", "session") or \
        get_default_session_name()
    session = os.path.join(base_path, session)

    norm_file = settings_config.get("Normalization", "normalization_file") or None
    return session, norm_file


def main(session: str, norm_file: str) -> None:
    from prepare_corpus import get_feature_extractor

    logger.info(f"Processing {norm_file}")
    mat_file = BCI2000MatFile(mat_filename=norm_file)
    ecog = mat_file.signals()

    if mat_file.bad_channels() is not None:
        logger.warning(
            f"Found the following bad channels in the normalization data: "
            f"{mat_file.bad_channels()}"
        )

    trials = []
    logger.info("Aggregating trials on which normalization statistics will be computed.")
    for _, start, stop in mat_file.trial_indices():
        extractor = get_feature_extractor(mat_file)
        feats = extractor.extract_features(
            ecog[start:int(stop + (0.04 * mat_file.fs)), :]
        )
        trials.append(feats)

    logger.info("Compute normalization statistics.")
    normalization_data = np.concatenate(trials)
    mean = np.mean(normalization_data, axis=0)
    std = np.std(normalization_data, axis=0)

    out_filename = os.path.join(session, "normalization.npy")
    logger.info(f"Normalization statistics will be stored in {out_filename}")
    np.save(out_filename, np.vstack([mean, std]))


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

    session_dir, norm_file = get_paths(settings_filename=args.config)
    os.makedirs(session_dir, exist_ok=args.overwrite)

    if args.norm is not None:
        norm_file = args.norm

    log_filename = os.path.join(session_dir, "log.normalization.txt")
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
        handlers=[logging.FileHandler(log_filename, "w+"),
                  logging.StreamHandler(sys.stderr)],
    )

    if norm_file is None:
        logger.error("No normalization file provided. Script will exit.")
        sys.exit(1)

    overwrite = " --overwrite" if args.overwrite else ""
    logger.info(f"python baseline_offline.py {args.config} --norm {norm_file}" + overwrite)
    logger.info(f"Session path: {session_dir}.")
    main(session=session_dir, norm_file=norm_file)
