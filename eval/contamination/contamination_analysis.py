"""CLI for the acoustic-contamination permutation analysis.

Replaces the reference's MATLAB stage
(eval/contamination/run_contamination_analysis.m + Roussel toolbox); the
analysis itself lives in dss_tpu.eval.contamination.
"""

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dss_tpu.eval.contamination as _core  # noqa: E402
from dss_tpu.eval.contamination import analyze_day  # noqa: E402

# Re-export tunables so callers/tests can override (e.g. NB_SURROGATES).
def __getattr__(name):
    return getattr(_core, name)


def __setattr__unsupported():  # pragma: no cover
    pass


def main():
    parser = argparse.ArgumentParser(
        description="Run the acoustic-contamination permutation analysis "
                    "(Python/JAX re-expression of the Roussel pipeline).")
    parser.add_argument("--agg-path", required=True,
                        help="Directory with aggregated per-day .mat files.")
    parser.add_argument("--out", required=True, help="Results directory.")
    args = parser.parse_args()

    out_path = Path(args.out)
    os.makedirs(out_path.as_posix(), exist_ok=True)
    for agg_file in sorted(Path(args.agg_path).glob("*_KeywordReading_Overt.mat")):
        analyze_day(agg_file, out_path)


if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
    )
    main()
