"""Generate a synthetic dataset tree + settings INI for a full replicate.sh run.

The reference pipeline expects proprietary multi-day BCI2000 recordings
(KeywordReading_Overt .mat/.wav pairs, SyllableRepetition_Overt .mat
normalization sessions, and an online KeywordSynthesis session); none are
redistributable.  This tool fabricates a structurally identical tree from a
source-free generative recipe — independent per-channel noise whose common
amplitude envelope rises during StimulusCode-active spans (so high-gamma
log-power features carry the "speech" signal the nVAD must learn), plus an
aligned audio track that is loud exactly during those spans (so the energy
VAD labels of corpus preparation mark them) — and writes a ready-to-use
settings INI wired to the stage outputs, so

    python tools/make_replicate_dataset.py /tmp/replicate_data
    DATA_DIR=/tmp/replicate_data/KeywordReading \\
    NORM_DIR=/tmp/replicate_data/SyllableRepetition \\
    LIVE_DIR=/tmp/replicate_data/KeywordReading/online_sessions \\
    SETTINGS=/tmp/replicate_data/replicate_settings.ini \\
    bash replicate.sh

exercises every stage (contamination analysis, corpus preparation, both
trainings, normalization baseline, figures, replay amplifier, online
decoding) end to end without any external data.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from scipy.io import savemat
from scipy.io.wavfile import write as wavwrite

FS = 1000
FS_AUDIO = 16000

DAYS = ["2022_09_22", "2022_11_02", "2022_11_03", "2022_11_04"]
ONLINE_DAY = "2023_04_14"


def _mat_dict(signal: np.ndarray, code: np.ndarray, stimuli) -> dict:
    return {
        "signal": signal,
        "parameters": {
            "SamplingRate": {"NumericValue": FS},
            "SourceChGain": {"NumericValue": np.ones(signal.shape[1])},
            "Stimuli": {"Value": stimuli},
        },
        "states": {"StimulusCode": code},
    }


def _burst_session(rng, seconds: float, code_spans, burst_spans,
                   quiet=0.05, loud=2.0):
    """129-channel noise: StimulusCode active over ``code_spans``; the
    common loud envelope ("speech") only over ``burst_spans``.

    Each trial MUST contain quiet shoulders around its burst — the nVAD
    trains on within-trial frames only, so without quiet examples inside
    the trial span it degenerates to "always speech" and the online
    segment assembler (which waits for 50 consecutive non-speech frames,
    local/common.py:156-215) never completes a segment."""
    T = int(seconds * FS)
    envelope = np.full(T, quiet)
    code = np.zeros(T, np.int16)
    for i, (t0, t1) in enumerate(code_spans):
        code[int(t0 * FS):int(t1 * FS)] = (i % 2) + 1
    for t0, t1 in burst_spans:
        envelope[int(t0 * FS):int(t1 * FS)] = loud
    signal = rng.normal(size=(T, 129)) * envelope[:, None]
    return signal, code, envelope


def _trial_layout(n_trials: int, trial_s: float = 4.5, gap_s: float = 1.5,
                  shoulder_s: float = 1.0):
    """Code spans with centered bursts (quiet shoulders inside the trial)."""
    code_spans, burst_spans = [], []
    for i in range(n_trials):
        t0 = gap_s + i * (trial_s + gap_s)
        code_spans.append((t0, t0 + trial_s))
        burst_spans.append((t0 + shoulder_s, t0 + trial_s - shoulder_s))
    seconds = gap_s + n_trials * (trial_s + gap_s)
    return seconds, code_spans, burst_spans


def _aligned_audio(rng, envelope: np.ndarray) -> np.ndarray:
    """16 kHz int16 track, loud exactly where the ECoG envelope is loud
    (energy-VAD-detectable 'speech')."""
    env16 = np.repeat(envelope, FS_AUDIO // FS)
    loud = env16 > envelope.min() + 1e-9
    audio = rng.normal(size=len(env16)) * np.where(loud, 6000.0, 40.0)
    return np.clip(audio, -32767, 32767).astype(np.int16)


def make_keyword_day(day_dir: Path, rng, n_trials: int = 6) -> None:
    day_dir.mkdir(parents=True, exist_ok=True)
    seconds, code_spans, burst_spans = _trial_layout(n_trials)
    signal, code, env = _burst_session(rng, seconds, code_spans, burst_spans)
    stimuli = np.array([["Enter", "Right"], ["1", "2"]], dtype=object)
    savemat(str(day_dir / "KeywordReading_Overt_R01.mat"),
            _mat_dict(signal, code, stimuli))
    wavwrite(str(day_dir / "KeywordReading_Overt_R01.wav"), FS_AUDIO,
             _aligned_audio(rng, env))


def make_syllable_day(day_dir: Path, rng, n_trials: int = 4) -> None:
    day_dir.mkdir(parents=True, exist_ok=True)
    seconds, code_spans, burst_spans = _trial_layout(n_trials)
    signal, code, _ = _burst_session(rng, seconds, code_spans, burst_spans)
    stimuli = np.array([["ba", "da"], ["1", "2"]], dtype=object)
    savemat(str(day_dir / "SyllableRepetition_Overt.mat"),
            _mat_dict(signal, code, stimuli))


def make_online_session(day_dir: Path, rng, n_words: int = 6) -> None:
    day_dir.mkdir(parents=True, exist_ok=True)
    # Words are bursts separated by >0.5 s of quiet (the segment-end wait),
    # so each completes as its own speech segment online.
    seconds, code_spans, burst_spans = _trial_layout(
        n_words, trial_s=2.5, gap_s=3.5, shoulder_s=0.0)
    signal, code, _ = _burst_session(rng, seconds, code_spans, burst_spans)
    stimuli = np.array([["Enter", "Right"], ["1", "2"]], dtype=object)
    savemat(str(day_dir / "KeywordSynthesis_Overt_R01.mat"),
            _mat_dict(signal, code, stimuli))


SETTINGS_TEMPLATE = """[Normalization]
base_path = {temp}/sessions
session = {online_day}
normalization_file = {base}/SyllableRepetition/2022_11_04/SyllableRepetition_Overt.mat

[Decoding]
base_out_dir = {temp}/runs
block_size = 256
address = localhost
port = 5556
fs = 1000
package_size = 40
bad_channels = [19, 38, 48, 52]
decoding_model_weights = {temp}/decoding_model/best_model.pth
vad_model_weights = {temp}/nVAD/best_model.pth
initial_normalization_statistics = {temp}/sessions/{online_day}/normalization.npy
vocoder_backend = {vocoder}
vocoder_weights =
; generous idle window: the replay amplifier takes tens of seconds to even
; start (python + scipy imports, worse under CPU contention with the
; decoder's background bucket prewarms) after the decoder is listening.
idle_timeout = 240
fused_frontend = auto
fused_decoder = auto
segment_length_multiple = 50
segment_prewarm_frames = [50, 150, 200, 250, 300]
"""


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Synthesize a full replicate.sh dataset tree.")
    parser.add_argument("base", help="Output base directory.")
    parser.add_argument("--temp-dir", default="/tmp/ReplicateDelayedSynthesis",
                        help="TEMP_DIR the replicate run will use (the "
                             "settings INI points at its stage outputs).")
    parser.add_argument("--vocoder", default="dsp", choices=["dsp", "net"],
                        help="Vocoder backend for the online stage.")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    base = Path(args.base)
    rng = np.random.default_rng(args.seed)
    for i, day in enumerate(DAYS):
        make_keyword_day(base / "KeywordReading" / day, rng)
        make_syllable_day(base / "SyllableRepetition" / day, rng)
    make_online_session(
        base / "KeywordReading" / "online_sessions" / ONLINE_DAY, rng)

    ini = base / "replicate_settings.ini"
    ini.write_text(SETTINGS_TEMPLATE.format(
        base=base.resolve(), temp=Path(args.temp_dir).resolve(),
        online_day=ONLINE_DAY, vocoder=args.vocoder))
    os.makedirs(Path(args.temp_dir) / "sessions" / ONLINE_DAY, exist_ok=True)

    print(f"dataset tree under {base}")
    print(f"settings INI: {ini}")
    print("run: "
          f"DATA_DIR={base}/KeywordReading "
          f"NORM_DIR={base}/SyllableRepetition "
          f"LIVE_DIR={base}/KeywordReading/online_sessions "
          f"SETTINGS={ini} bash replicate.sh")


if __name__ == "__main__":
    main()
