"""Ship-gate scorer for vocoder checkpoints (the reship protocol).

Free-running vocoder quality at the gate epochs varies +-1.5 dB per
utterance x seed pair, so a single validation number is not shippable
evidence (STATUS.md, round 1: a reship that "won" on one utterance lost
on the next draw).  The standing protocol, applied to every shipped
checkpoint since: score each candidate on TWO fresh unseen-seed corpus
draws (12 keyword variants + 4 sentence utterances each) and require it
to win on BOTH means, plus keep the six deployed keywords identifiable.

This tool runs that protocol end to end for any number of candidate
checkpoints and prints one JSON report:

    python tools/score_vocoder_ship.py CANDIDATE.npz [MORE.npz ...] \
        [--seeds 777 888] [--platform cpu] [--pallas auto]

For each candidate x seed: mean/max Bark-cepstral round-trip distortion
(dss_tpu.eval.quality.score_roundtrip) over the 16 val utterances,
keyword-ID accuracy and mean STOI over the 12 keyword round trips.
The corpora are generated fresh with tools/make_speech_corpus.py (4 s of
training text is enough to emit the full val set; the train split is
discarded) — ship decisions must use seeds the training run never saw.

The quality gates this feeds are pinned in tests/test_speech_vocoder*.py;
the matching reference asset is the trained LPCNet model compiled into
the extension (reference extensions/lpcnet/setup.py:34-36).
"""

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_corpus(out_dir: Path, seed: int) -> Path:
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_speech_corpus.py"),
         str(out_dir), "--seconds", "4", "--seed", str(seed)],
        check=True, capture_output=True)
    return out_dir / "val"


def score_candidate(weights: str, val_dir: Path, pallas: str) -> dict:
    import numpy as np
    from scipy.io import wavfile

    from dss_tpu.eval.quality import (keyword_id_accuracy, score_roundtrip,
                                      stoi)
    from dss_tpu.vocoder import LPCNet
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    use_pallas = {"auto": None, "on": True, "off": False}[pallas]
    vocoder = LPCNet(backend="net", weights=weights, use_pallas=use_pallas)
    enc = LPCFeatureEncoder()

    distortions = {}
    originals, resyntheses, stois = {}, {}, []
    for wav in sorted(val_dir.glob("*.wav")):
        _, audio = wavfile.read(wav)
        vocoder.reset_decoder()
        report = score_roundtrip(audio, vocoder)
        distortions[wav.name] = round(report.cepstral_distance_db, 2)
        if wav.name.startswith("kw_"):
            word = wav.name.split("_")[1]
            feats = enc.compute_LPC_features(audio)
            vocoder.reset_decoder()
            syn = vocoder.synthesize_frames(feats)
            n = len(feats) * 160
            originals.setdefault(word, []).append(audio[:n])
            resyntheses.setdefault(word, []).append(syn[:n])
            try:
                stois.append(stoi(audio[:n], syn[:n]))
            except ValueError:
                pass  # keyword too short for the STOI frame minimum

    vals = list(distortions.values())
    return {
        "mean_db": round(float(np.mean(vals)), 2),
        "max_db": round(float(np.max(vals)), 2),
        "keyword_id": round(keyword_id_accuracy(originals, resyntheses), 3),
        "stoi": round(float(np.mean(stois)), 3),
        "per_wav_db": distortions,
    }


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Score vocoder ship candidates on fresh unseen-seed "
                    "corpus draws (the reship protocol).")
    parser.add_argument("weights", nargs="+",
                        help="Candidate checkpoint(s) (.npz).")
    parser.add_argument("--seeds", type=int, nargs="+", default=[777, 888],
                        help="Fresh corpus seeds (must be unseen by "
                             "training AND by prior gate fixtures when "
                             "comparing against shipped scores).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu').")
    parser.add_argument("--pallas", choices=["auto", "on", "off"],
                        default="auto",
                        help="'on' on a TPU scores the exact production "
                             "kernels; 'auto' picks by backend.")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    report = {"seeds": args.seeds, "candidates": {}}
    with tempfile.TemporaryDirectory() as tmp:
        val_dirs = {seed: make_corpus(Path(tmp) / f"seed{seed}", seed)
                    for seed in args.seeds}
        for weights in args.weights:
            per_seed = {}
            for seed, val_dir in val_dirs.items():
                per_seed[str(seed)] = score_candidate(
                    weights, val_dir, args.pallas)
                print(f"[{weights}] seed {seed}: "
                      f"mean {per_seed[str(seed)]['mean_db']} dB, "
                      f"keyword-ID {per_seed[str(seed)]['keyword_id']}, "
                      f"STOI {per_seed[str(seed)]['stoi']}",
                      file=sys.stderr)
            report["candidates"][weights] = per_seed
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
