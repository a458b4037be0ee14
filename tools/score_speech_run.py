"""Score a --speech replicate run's reco wavs as KEYWORD SPEECH.

tools/make_replicate_dataset.py --speech embeds formant-synthesized
keywords in the fabricated sessions (audio + keyword-patterned ECoG); a
closed-loop run over its online session therefore produces reco wavs that
SHOULD be intelligible keywords.  This tool maps each logged segment back
to its word via replay time (word_order.json; modulo the session length
for looped replays), lays the reco wavs out as kw_<word>_<n>.wav, and
scores keyword identification + STOI against acoustic templates:

* the session's own keyword templates (keyword_templates/ in the dataset
  base) — the straight intelligibility read;
* optionally ``--shifted-dir`` (e.g. make_speech_corpus --shifted-val
  output) — the templates are SPEAKER-SHIFTED versions the decoder/vocoder
  never saw, so identification must survive template mismatch (VERDICT r3
  item 4: score the closed-loop run's actual reco wavs under shift).

Output: one JSON object on stdout (plus --out), with per-template-set
keyword-ID accuracy, confusion, margins, STOI.

Usage::

    python tools/score_speech_run.py RUN_DIR DATASET_BASE \
        [--shifted-dir DIR] [--platform cpu] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def map_segments_to_words(run_dir: str, order: dict,
                          max_dist_s: float = 2.0):
    """[(reco_index, word)] for every logged segment, matched to the word
    whose span center is CYCLICALLY nearest the segment's replay-time
    midpoint (mod the session length).  Nearest-center matching rather
    than strict span containment: looped replay accumulates a small
    per-loop timing drift (~0.1 s/loop measured — loop-boundary packet
    quantization in the amplifier), and the VAD smoothing delay offsets
    segment times by ~0.5 s; word spans are >= 5 s apart, so nearest
    center is unambiguous.  Segments farther than ``max_dist_s`` from
    every center are skipped and reported."""
    session_s = float(order["session_seconds"])
    centers = [(w["word"], (w["t0"] + w["t1"]) / 2.0)
               for w in order["words"]]
    out, skipped = [], 0
    with open(os.path.join(run_dir, "log.vad.lab")) as fd:
        for i, line in enumerate(fd):
            parts = line.strip().split("\t")
            if len(parts) != 3:
                continue
            s, e = float(parts[0]), float(parts[1])
            mid = ((s + e) / 2.0) % session_s

            def cyc(a, b):
                d = abs(a - b) % session_s
                return min(d, session_s - d)

            word, dist = min(((w, cyc(mid, c)) for w, c in centers),
                             key=lambda t: t[1])
            if dist <= max_dist_s:
                out.append((i + 1, word))
            else:
                skipped += 1
    return out, skipped


def energy_trim(audio: np.ndarray, pad_s: float = 0.05,
                rel: float = 0.08) -> np.ndarray:
    """Trim leading/trailing low-energy material (relative threshold on a
    50 ms envelope).  VAD segments carry ~0.5 s of trailing silence
    context plus smoothing slack; DTW against bare word templates maps
    those frames onto the template's edges and swamps the word distance —
    measured: untrimmed segments misclassify material whose exact-trimmed
    spans classify 6/6."""
    x = np.abs(audio.astype(np.float64))
    env = np.convolve(x, np.ones(800) / 800.0, mode="same")
    thr = env.max() * rel
    idx = np.nonzero(env > thr)[0]
    if len(idx) == 0:
        return audio
    pad = int(pad_s * 16000)
    lo = max(0, int(idx[0]) - pad)
    hi = min(len(audio), int(idx[-1]) + pad)
    return audio[lo:hi]


def _floor_dither(audio: np.ndarray, rng, rms: float = 40.0) -> np.ndarray:
    """Add a common ~-58 dBFS noise floor before scoring.

    The DTW cepstral metric compares absolute band energies, so CLOSURE
    frames score the two signals' noise floors against each other — and
    those floors are artifacts of provenance, not intelligibility
    (session room tone ~30 RMS, the energy-sharpened vocoder's rendered
    silence ~6, template variants anywhere in between).  Measured: an
    'enter' reco 19/19-misclassified as 'down' purely because its
    t-closure frames sat 14 dB under the template's room tone.  A shared
    dither floor dominates every provenance floor and cancels in the
    comparison; word content (>= 3000 RMS) is untouched."""
    return (audio.astype(np.float64)
            + rng.normal(0.0, rms, len(audio))).astype(np.float64)


def score_against(templates_dir: str, rendered: dict) -> dict:
    from dss_tpu.eval.quality import keyword_id_report, stoi

    from eval.keyword_intelligibility import collect_keywords

    rng = np.random.default_rng(0)
    originals = collect_keywords(templates_dir)
    originals = {w: [_floor_dither(v, rng) for v in vs]
                 for w, vs in originals.items()}
    rendered = {w: [_floor_dither(v, rng) for v in vs]
                for w, vs in rendered.items()}
    missing = set(rendered) - set(originals)
    if missing:
        raise SystemExit(f"templates lack words: {sorted(missing)}")
    report = keyword_id_report(
        {w: originals[w] for w in rendered}, rendered)
    stois = []
    for word, syns in rendered.items():
        for syn in syns:
            ref = originals[word][0]
            n = min(len(ref), len(syn))
            try:
                stois.append(stoi(ref[:n], syn[:n]))
            except ValueError:
                pass
    margins = [m["margin"] for m in report["margins"]
               if np.isfinite(m.get("margin", np.nan))]
    return {
        "keyword_id_accuracy": round(report["accuracy"], 4),
        "n": int(sum(len(v) for v in rendered.values())),
        "confusion": report["confusion"],
        "margins": report["margins"],
        **({"margin_min": round(float(np.min(margins)), 4),
            "margin_median": round(float(np.median(margins)), 4)}
           if margins else {}),
        **({"stoi_mean": round(float(np.mean(stois)), 4)} if stois else {}),
    }


def main() -> None:
    ap = argparse.ArgumentParser(
        "Score a --speech replicate run's reco wavs as keywords.")
    ap.add_argument("run_dir")
    ap.add_argument("dataset_base",
                    help="make_replicate_dataset --speech output base "
                         "(word_order.json + keyword_templates/).")
    ap.add_argument("--shifted-dir", default=None,
                    help="Additionally score against speaker-shifted "
                         "templates (make_speech_corpus --shifted-val).")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    order = json.load(open(os.path.join(args.dataset_base,
                                        "word_order.json")))
    mapping, skipped = map_segments_to_words(args.run_dir, order)
    if not mapping:
        raise SystemExit("no segments mapped to words")

    rendered: dict = {}
    for reco_idx, word in mapping:
        path = os.path.join(args.run_dir, "reco",
                            f"reco_{reco_idx:05d}.wav")
        fs, audio = wavfile.read(path)
        assert fs == 16000
        rendered.setdefault(word, []).append(energy_trim(audio))

    out = {
        "run_dir": args.run_dir,
        "n_segments_scored": len(mapping),
        "n_segments_unmapped": skipped,
        "words_covered": sorted(rendered),
        "vs_own_templates": score_against(
            os.path.join(args.dataset_base, "keyword_templates"),
            rendered),
    }
    if args.shifted_dir:
        out["vs_shifted_templates"] = score_against(args.shifted_dir,
                                                    rendered)
    js = json.dumps(out)
    print(js)
    if args.out:
        with open(args.out, "w") as fd:
            fd.write(js + "\n")


if __name__ == "__main__":
    main()
