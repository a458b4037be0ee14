"""Render paper-figure-1 assets from the online decoder's binary logs.

Parity target: reference eval/figure_1_assets.py — consumes ``log.hga.f64``
(reshaped [-1, 64]) and ``log.lpc.f32`` ([-1, 20]) plus original/synthesized
speech wavs, rendering the high-gamma feature raster, the masked speech
segment view, the estimated vocoder features, and the original-vs-synthesized
waveform comparison.  CLI arguments replace the reference's hardcoded paths.
"""

import argparse
import os
import sys
from pathlib import Path
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.io.wavfile import read as wavread  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _style_box(ax):
    for side in ("left", "right", "top", "bottom"):
        ax.spines[side].set_visible(True)
        ax.spines[side].set_color("black")
    ax.grid(False)
    ax.set_facecolor("white")


def _time_scale_bar(ax, x0: float, x1: float, y: float, label: str):
    """Draw a capped double-arrow time scale bar below the raster (the paper
    figure's embellishment), e.g. spanning 100 frames = 1 s at 100 Hz."""
    from matplotlib.patches import ArrowStyle

    for style in (ArrowStyle("|-|", widthA=0.5, widthB=0.5, angleA=0, angleB=0),
                  ArrowStyle("<->", widthA=0.5, widthB=0.5, angleA=0, angleB=0)):
        ax.annotate("", xy=(x0, y), xytext=(x1, y), annotation_clip=False,
                    arrowprops=dict(arrowstyle=style, shrinkA=0, shrinkB=0,
                                    linewidth=1.0, color="black"))
    ax.annotate(label, xy=((x0 + x1) / 2, y - 4), zorder=10, color="black",
                ha="center", annotation_clip=False)


def render_hga_feature_computation_plot(data_snippet: np.ndarray,
                                        out_filename: Optional[Path] = None,
                                        dpi: int = 300,
                                        title: str = "High-γ Feature Computation"):
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.imshow(data_snippet.T, origin="lower", aspect="auto", cmap="PiYG",
              vmin=-4, vmax=4)
    ax.set_xticks([])
    ax.set_yticks([0, data_snippet.shape[1] - 1])
    ax.set_yticklabels([1, 82])
    ax.set_ylabel("Selected Channels", labelpad=-10)
    ax.set_title(title)
    _time_scale_bar(ax, 20, 120, -4, "1 s")
    _style_box(ax)
    plt.tight_layout()
    _emit(fig, out_filename, dpi)


def render_masked_hga_features_plot(data_snippet: np.ndarray, mask: np.ndarray,
                                    out_filename: Optional[Path] = None,
                                    dpi: int = 300):
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.imshow(data_snippet.T, origin="lower", aspect="auto", cmap="PiYG",
              vmin=-4, vmax=4)
    ax.imshow(mask.T, origin="lower", aspect="auto", cmap="gray", alpha=0.3)
    ax.set_title("Speech Segment Extraction")
    ax.set_xticks([])
    ax.set_yticks([0, data_snippet.shape[1] - 1])
    ax.set_yticklabels([1, 82])
    ax.set_ylabel("Selected Channels", labelpad=-10)
    _time_scale_bar(ax, 20, 120, -4, "1 s")
    _style_box(ax)
    plt.tight_layout()
    _emit(fig, out_filename, dpi)


def render_lpc_features_plot(data_snippet: np.ndarray,
                             out_filename: Optional[Path] = None,
                             dpi: int = 300):
    fig, ax = plt.subplots(figsize=(4, 3))
    ax.imshow(data_snippet.T, origin="lower", aspect="auto", cmap="inferno")
    ax.set_xticks([])
    ax.set_yticks([0, 19])
    ax.set_yticklabels([1, 20])
    ax.set_ylabel("LPC Coefficients", labelpad=-10)
    ax.set_title("Estimated Vocoder Features")
    _time_scale_bar(ax, 20, 120, -2, "1 s")
    _style_box(ax)
    plt.tight_layout()
    _emit(fig, out_filename, dpi)


def render_patient_and_synthesized_speech(orig_snippet: np.ndarray,
                                          reco_snippet: np.ndarray,
                                          out_filename: Optional[Path] = None,
                                          dpi: int = 300):
    fig, (ax_orig, ax_reco) = plt.subplots(2, 1, figsize=(8, 2.5))
    xs = np.linspace(0, len(orig_snippet) / 16000, len(orig_snippet))
    for ax, sig_, color, label in ((ax_orig, orig_snippet, "black", "Participant"),
                                   (ax_reco, reco_snippet, "#9C0000", "Synthesizer")):
        ax.plot(xs[:len(sig_)], sig_, color=color)
        for side in ("top", "bottom", "left", "right"):
            ax.spines[side].set_visible(False)
        ax.set_ylabel(label)
        ax.set_yticks([])
        ax.set_xticks([])
        ax.set_xlim(0, xs[-1] if len(xs) else 1)
    ax_reco.set_xlabel("Time [s]")
    if len(xs) and xs[-1] >= 2.0:
        # 1 s scale bracket under the synthesized trace.
        x1 = min(4.0, xs[-1] - 0.5)
        amp = float(np.max(np.abs(reco_snippet))) or 1.0
        y = -0.75 * amp
        ax_reco.annotate(
            "", xy=(x1, y), xytext=(x1 - 1.0, y), annotation_clip=False,
            arrowprops=dict(connectionstyle="bar,armA=6,armB=6,fraction=0.0",
                            arrowstyle="-", shrinkA=4, shrinkB=4,
                            linewidth=1.5, edgecolor="black"))
        ax_reco.annotate("1 s", xy=(x1 - 0.62, -1.35 * amp), zorder=100,
                         color="black", annotation_clip=False)
    plt.tight_layout()
    _emit(fig, out_filename, dpi)


def render_colorbar(out_filename: Optional[Path] = None, dpi: int = 300):
    fig, ax = plt.subplots(figsize=(4, 0.9))
    ax.set_xlabel("High-γ Activity [distance to baseline in STDs]")
    ax.set_yticks([])
    ax.imshow(np.linspace(-4, 4, 400).reshape((1, -1)), aspect="auto",
              cmap="PiYG", vmin=-4, vmax=4)
    ax.xaxis.tick_top()
    ax.xaxis.set_label_position("top")
    ax.set_xticks(np.linspace(0, 400, 9))
    ax.set_xticklabels(np.arange(-4, 5))
    plt.tight_layout()
    _emit(fig, out_filename, dpi)


def _emit(fig, out_filename: Optional[Path], dpi: int):
    if out_filename:
        out_filename.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_filename.as_posix(), dpi=dpi, transparent=True)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser(description="Render figure 1 assets from run logs.")
    parser.add_argument("run_folder", help="decode_online output folder (log.hga.f64, log.lpc.f32).")
    parser.add_argument("--out", default="plots", help="Output directory.")
    parser.add_argument("--start", type=float, default=46.0)
    parser.add_argument("--stop", type=float, default=50.0)
    parser.add_argument("--lpc-start", type=int, default=821)
    parser.add_argument("--lpc-stop", type=int, default=983)
    parser.add_argument("--orig-wav", default=None)
    parser.add_argument("--reco-wav", default=None)
    parser.add_argument("--channels", type=int, default=64)
    args = parser.parse_args()

    out = Path(args.out)
    hga = np.fromfile(os.path.join(args.run_folder, "log.hga.f64"),
                      dtype=np.float64).reshape((-1, args.channels))
    lpc = np.fromfile(os.path.join(args.run_folder, "log.lpc.f32"),
                      dtype=np.float32).reshape((-1, 20))

    render_colorbar(out / "figure_1_cb.png")
    snippet = hga[int(args.start * 100):int(args.stop * 100)]
    render_hga_feature_computation_plot(snippet, out / "figure_1_b.png")

    mask = np.zeros_like(snippet)
    seg_lo = int(len(snippet) * 0.4)
    seg_hi = int(len(snippet) * 0.8)
    mask[seg_lo:seg_hi, :] = np.nan
    render_masked_hga_features_plot(snippet, mask, out / "figure_1_d.png")

    lo, hi = args.lpc_start, min(args.lpc_stop, len(lpc))
    render_lpc_features_plot(lpc[lo:hi], out / "figure_1_f.png")

    if args.orig_wav and args.reco_wav:
        orig = wavread(args.orig_wav)[1]
        reco = wavread(args.reco_wav)[1]
        render_patient_and_synthesized_speech(orig, reco, out / "figure_1_g.png")


if __name__ == "__main__":
    main()
