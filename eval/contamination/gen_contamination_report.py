"""Ridgeline report of the contamination permutation analysis.

Parity target: reference eval/contamination/gen_contamination_report.py —
per-day histograms of the surrogate distribution with the dataset measure
overlaid (red when p < 0.05, green otherwise).
"""

import argparse
import logging
import re
from pathlib import Path
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.gridspec as grid_spec  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.io import loadmat  # noqa: E402

logger = logging.getLogger("gen_contamination_report.py")


def main(agg_dir: Path, analysis_dir: Path, output_dir: Optional[Path] = None):
    result_files = sorted(analysis_dir.glob("*_contamination_result.mat"))
    days = [re.match(r"[0-9]*_[0-9]*_[0-9]*", f.name).group(0)
            for f in result_files]
    nb_days = len(days)
    if nb_days == 0:
        logger.error("No contamination results found in %s", analysis_dir)
        return

    surrogate_data = []
    dataset_measure = np.zeros(nb_days, np.float32)
    p_criterion = np.zeros(nb_days, np.float32)
    for i, f in enumerate(result_files):
        mat = loadmat(f.as_posix(), simplify_cells=True)
        surrogate_data.append(np.asarray(mat["out"]["surrogate_measures"]).ravel())
        dataset_measure[i] = mat["out"]["dataset_measure"]
        p_criterion[i] = mat["out"]["criterion_value"]

    lo = min(min(s.min() for s in surrogate_data), dataset_measure.min())
    hi = max(max(s.max() for s in surrogate_data), dataset_measure.max())
    pad = 0.05 * (hi - lo + 1e-9)

    gs = grid_spec.GridSpec(nb_days, 1)
    fig = plt.figure(figsize=(11, max(4, 0.6 * nb_days)))
    for j, day in enumerate(days):
        ax = fig.add_subplot(gs[j:j + 1, 0:])
        counts, bins = np.histogram(surrogate_data[j], bins=50)
        ax.stairs(counts, bins, color="#f0f0f0", lw=1.5)
        ax.stairs(counts, bins, fill=True, alpha=1, color="black")

        measure_color = "red" if p_criterion[j] < 0.05 else "limegreen"
        ax.axvline(x=dataset_measure[j], color=measure_color, lw=2)
        ax.axhline(y=0, color="black")
        ax.set_xlim(lo - pad, hi + pad)
        ax.yaxis.set_tick_params(length=0)
        ax.patch.set_alpha(0)
        ax.set_yticks([0])
        ax.set_yticklabels([f"$D_{{{j}}}$"])
        for side in ("top", "right", "left"):
            ax.spines[side].set_visible(False)
        if j < nb_days - 1:
            ax.set_xticks([])
            ax.spines["bottom"].set_visible(False)

    fig.axes[-1].set_xlabel("Contamination measure")
    plt.tight_layout()
    out = (output_dir or Path(".")) / "contamination_report.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out.as_posix(), dpi=300)
    logger.info("Wrote %s", out)
    for day, m, p in zip(days, dataset_measure, p_criterion):
        flag = "CONTAMINATED?" if p < 0.05 else "ok"
        logger.info("%s: measure=%.4f p=%.4f [%s]", day, m, p, flag)


if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
    )
    parser = argparse.ArgumentParser(
        description="Render the contamination permutation report.")
    parser.add_argument("contamination_dir",
                        help="Folder containing the aggregated_by_day/ and "
                             "analysis/ subfolders.")
    parser.add_argument("--out", default=None, help="Output directory.")
    args = parser.parse_args()

    base = Path(args.contamination_dir)
    main(base / "aggregated_by_day", base / "analysis",
         Path(args.out) if args.out else None)
