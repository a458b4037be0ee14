"""Original vs synthesized waveform + spectrogram comparison.

Parity target: reference eval/figure_2ab.py — concatenates selected speech
segments from the closed-loop run (positions from ``log.vad.lab``, audio from
``reco/reco_%05d.wav``) against the microphone recording, and renders paired
waveforms and log-frequency spectrograms (hann, nperseg=800, noverlap=640).
CLI arguments replace the reference's hardcoded paths.
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.io.wavfile import read as wavread  # noqa: E402
from scipy.signal import spectrogram  # noqa: E402


def read_vad_lab(path):
    """Rows of (start_s, stop_s, label) from a .lab file."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                rows.append((float(parts[0]), float(parts[1]),
                             parts[2] if len(parts) > 2 else ""))
    return rows


def main():
    parser = argparse.ArgumentParser(
        description="Waveform + spectrogram comparison of original vs "
                    "synthesized speech from a closed-loop run.")
    parser.add_argument("run_folder", help="decode_online output folder.")
    parser.add_argument("orig_speech_file", help="Microphone recording wav (16 kHz).")
    parser.add_argument("--indices", type=int, nargs="+",
                        default=[1, 2, 3, 4, 5, 6],
                        help="Segment indices to concatenate.")
    parser.add_argument("--words", nargs="+",
                        default=["Enter", "Right", "Back", "Up", "Left", "Down"])
    parser.add_argument("--out", default="plots/figure_2ab.png")
    args = parser.parse_args()

    vad = read_vad_lab(os.path.join(args.run_folder, "log.vad.lab"))
    orig_audio = wavread(args.orig_speech_file)[1]
    orig_samples = np.hstack([
        orig_audio[int(vad[i][0] * 16000):int(vad[i][1] * 16000)]
        for i in args.indices
    ])
    reco_samples = np.hstack([
        wavread(os.path.join(args.run_folder, "reco", f"reco_{i + 1:05d}.wav"))[1]
        for i in args.indices
    ])

    _, _, Sxx_orig = spectrogram(orig_samples, 16000, mode="magnitude",
                                 window="hann", nperseg=800, noverlap=640)
    _, _, Sxx_reco = spectrogram(reco_samples, 16000, mode="magnitude",
                                 window="hann", nperseg=800, noverlap=640)

    fig, ((ax_ow, ax_os), (ax_rw, ax_rs)) = plt.subplots(2, 2, figsize=(11, 4.5))

    for ax, samples, title in ((ax_ow, orig_samples, "Patient's Original Speech"),
                               (ax_rw, reco_samples, "Closed-Loop Synthesis Output")):
        ax.plot(samples)
        ax.set_title(title, loc="left", fontsize=10)
        ax.set_xlim(0, len(reco_samples))
        ax.set_ylabel("Amplitude")
        ax.set_yticks([])
        for side in ("top", "bottom", "left", "right"):
            ax.spines[side].set_visible(False)

    for ax, Sxx in ((ax_os, Sxx_orig), (ax_rs, Sxx_reco)):
        ax.imshow(10 * np.log10(Sxx + 1e-12), aspect="auto", origin="lower",
                  cmap="Blues", extent=[0, Sxx.shape[1], 0, 8000])
        ax.set_yscale("log")
        ax.set_ylim(100, 8000)
        ax.set_ylabel("Frequency [log Hz]")
        ax.yaxis.tick_right()

    ax_rs.set_xlabel("Time")
    plt.tight_layout()
    plt.subplots_adjust(hspace=0.35, wspace=0.1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    plt.savefig(args.out, dpi=300)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
