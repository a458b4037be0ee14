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


# ---------------------------------------------------------------------------
# --speech mode: sessions whose audio track is actual (formant-synthesized)
# keyword speech and whose ECoG carries a keyword-specific channel pattern
# modulated by the speech envelope.  The decoder trained on this tree maps
# neural patterns to real LPC trajectories, so the ONLINE run's reco wavs
# are scoreable keyword speech (keyword-ID / STOI, incl. against
# speaker-shifted templates) — the closed-loop intelligibility story, not
# just byte accounting.  Fabricated, but the decoder only ever sees the
# neural side; its output is judged against acoustic templates it never
# saw directly.
# ---------------------------------------------------------------------------

_KEYWORD_ORDER = ["enter", "right", "back", "up", "left", "down"]


def _keyword_bank(seed: int = 12345):
    """Render each keyword once (fixed seed: all sessions share one
    speaker) -> {word: float32 wav in [-1, 1] at 16 kHz}."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_speech_corpus import KEYWORDS, synth_word

    rng = np.random.default_rng(seed)
    bank = {}
    for word in _KEYWORD_ORDER:
        w = synth_word(KEYWORDS[word], rng, f0=120.0)
        bank[word] = (w / (np.max(np.abs(w)) + 1e-9) * 0.6).astype(
            np.float32)
    return bank


def _keyword_patterns(n_channels: int = 129, seed: int = 999):
    """Keyword -> per-channel gain pattern (fixed across days/sessions; the
    audio channel 128 gets no neural pattern)."""
    rng = np.random.default_rng(seed)
    pats = {}
    for word in _KEYWORD_ORDER:
        # Baseline 0.35 on every channel (the VAD needs broad activation)
        # plus a word-specific SUBSET of ~22 channels boosted to 1.0-1.6:
        # identity lives in a sparse spatial pattern, like the distinct
        # electrode subsets real word decoding rides on.  Measured with
        # dense uniform-ratio patterns (floors 0.45 and 0.30): the
        # reference-recipe decoder deterministically collapsed
        # right/up/left onto one rendered trajectory (11/24 then 18/36
        # held-out keyword-ID) even though nearest-centroid separation of
        # the inputs was clean — the 2-layer biLSTM needs spatially
        # structured contrasts, not uniform ratio soup.
        g = np.full(n_channels, 0.35)
        boost = rng.choice(128, size=22, replace=False)
        g[boost] = rng.uniform(1.0, 1.6, len(boost))
        g[128:] = 0.0
        pats[word] = g
    return pats


def _speech_session(rng, seconds: float, spans, words, bank, patterns,
                    quiet=0.05, loud=3.0, shoulder=0.0):
    """ECoG [T, 129] + 16 kHz audio + StimulusCode for keyword trials.

    Per trial: the keyword wav starts at the span's burst onset; the ECoG
    envelope of each channel follows the speech envelope times the
    keyword's channel pattern (identity + timing both live in the
    neural data, as in the real system's premise)."""
    T = int(seconds * FS)
    T16 = T * (FS_AUDIO // FS)
    code = np.zeros(T, np.int16)
    audio = rng.normal(size=T16) * 40.0  # room tone
    env_ch = np.full((T, 129), quiet)
    for i, ((c0, t1), word) in enumerate(zip(spans, words)):
        code[int(c0 * FS):int(t1 * FS)] = (i % 2) + 1
        # The word starts ``shoulder`` seconds into its trial span:
        # leading WITHIN-TRIAL silence teaches the online nVAD to fire
        # from a carried state that has sat in silence (trained fresh-
        # state-per-trial only, its recall collapsed 0.90 -> 0.19 on a
        # continuous stream — the exact condition the closed loop runs
        # in).
        t0 = c0 + shoulder
        wav = bank[word]
        a0 = int(t0 * FS_AUDIO)
        n = min(len(wav), T16 - a0)
        audio[a0:a0 + n] += wav[:n] * 24000.0
        # 1 kHz speech envelope (50 ms smoothed |wav|), channel-patterned.
        # The envelope gets a FLOOR across the word span: acoustic dips
        # (stop closures, inter-phoneme transitions) must not read as
        # neural silence, or the nVAD fragments words and the online
        # segment assembler never completes them (articulation continues
        # through closures in the real system too).
        e16 = np.abs(wav[:n])
        e1k = e16[: (n // 16) * 16].reshape(-1, 16).mean(axis=1)
        k = np.ones(50) / 50.0
        e1k = np.convolve(e1k, k, mode="same")
        e1k = e1k / (e1k.max() + 1e-9)
        e1k = np.maximum(e1k, 0.45)
        s0 = int(t0 * FS)
        env_ch[s0:s0 + len(e1k)] += \
            loud * e1k[:, None] * patterns[word][None, :]
    signal = rng.normal(size=(T, 129)) * env_ch
    # The recorded audio channel mirrors the microphone (contamination
    # analysis reads channel 128).
    signal[:, 128] = audio[::FS_AUDIO // FS] / 32767.0
    audio_i16 = np.clip(audio, -32767, 32767).astype(np.int16)
    return signal, code, audio_i16


def make_speech_keyword_day(day_dir: Path, rng, bank, patterns,
                            reps: int = 2,
                            tight_dir: Path = None) -> None:
    """Write a training day; with ``tight_dir``, ALSO write a second .mat
    over the SAME signal/audio whose StimulusCode spans hug each word
    (word - 0.5 s .. word end + 0.6 s) — the shape of an online VAD
    segment.  The nVAD trains on the long-shoulder trials (it needs
    leading within-trial silence, see _speech_session) while the decoder
    trains on the tight trials: a decoder trained only on 4.5 s trials
    measurably collapses on ~1.5 s online segments (12/12-discriminable
    features scored 4/12 through it; matched-length training is the
    fix — train/test segment-shape parity, the same constraint the
    reference system's trial structure implicitly satisfies)."""
    day_dir.mkdir(parents=True, exist_ok=True)
    words = _KEYWORD_ORDER * reps
    shoulder = 1.5
    seconds, code_spans, _ = _trial_layout(len(words), trial_s=4.5,
                                           gap_s=1.5, shoulder_s=0.0)
    signal, code, audio = _speech_session(rng, seconds, code_spans, words,
                                          bank, patterns, shoulder=shoulder)
    stimuli = np.array([["Enter", "Right"], ["1", "2"]], dtype=object)
    savemat(str(day_dir / "KeywordReading_Overt_R01.mat"),
            _mat_dict(signal, code, stimuli))
    wavwrite(str(day_dir / "KeywordReading_Overt_R01.wav"), FS_AUDIO, audio)
    if tight_dir is not None:
        tight_dir.mkdir(parents=True, exist_ok=True)
        tcode = np.zeros_like(code)
        for i, ((c0, _c1), word) in enumerate(zip(code_spans, words)):
            t0 = c0 + shoulder - 0.5
            t1 = c0 + shoulder + len(bank[word]) / FS_AUDIO + 0.6
            tcode[int(t0 * FS):int(t1 * FS)] = (i % 2) + 1
        savemat(str(tight_dir / "KeywordReading_Overt_R01.mat"),
                _mat_dict(signal, tcode, stimuli))
        wavwrite(str(tight_dir / "KeywordReading_Overt_R01.wav"),
                 FS_AUDIO, audio)


def make_speech_online_session(day_dir: Path, rng, bank, patterns,
                               reps: int = 1):
    """Online session: each keyword once per rep, words separated by > 0.5 s
    quiet so each completes as its own online segment.  Returns
    (words, spans, session_seconds) — tools/score_speech_run.py maps
    reco_%05d.wav segments back to words by replay time (modulo the
    session length for looped replays)."""
    day_dir.mkdir(parents=True, exist_ok=True)
    words = _KEYWORD_ORDER * reps
    seconds, code_spans, _ = _trial_layout(len(words), trial_s=2.0,
                                           gap_s=3.0, shoulder_s=0.0)
    signal, code, _audio = _speech_session(rng, seconds, code_spans, words,
                                           bank, patterns)
    stimuli = np.array([["Enter", "Right"], ["1", "2"]], dtype=object)
    savemat(str(day_dir / "KeywordSynthesis_Overt_R01.mat"),
            _mat_dict(signal, code, stimuli))
    return words, code_spans, seconds


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
    parser.add_argument("--speech", action="store_true",
                        help="Embed formant-synthesized KEYWORD SPEECH in "
                             "the sessions (audio track + keyword-"
                             "patterned ECoG) so the trained closed "
                             "loop's reco wavs are scoreable keyword "
                             "speech; writes word_order.txt for the "
                             "online session.")
    parser.add_argument("--reps", type=int, default=2,
                        help="--speech: keyword repetitions per training "
                             "day (trials/day = 6*reps).")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    base = Path(args.base)
    rng = np.random.default_rng(args.seed)
    if args.speech:
        bank = _keyword_bank()
        patterns = _keyword_patterns()
        for day in DAYS:
            make_speech_keyword_day(base / "KeywordReading" / day, rng,
                                    bank, patterns, reps=args.reps,
                                    tight_dir=(base / "KeywordReadingTight"
                                               / day))
            make_syllable_day(base / "SyllableRepetition" / day, rng)
        words, spans, session_s = make_speech_online_session(
            base / "KeywordReading" / "online_sessions" / ONLINE_DAY, rng,
            bank, patterns)
        import json as _json

        (base / "word_order.json").write_text(_json.dumps({
            "session_seconds": session_s,
            "words": [{"word": w, "t0": t0, "t1": t1}
                      for w, (t0, t1) in zip(words, spans)],
        }, indent=1))
        kw_dir = base / "keyword_templates"
        kw_dir.mkdir(exist_ok=True)
        from make_speech_corpus import KEYWORDS, synth_word

        tpl_rng = np.random.default_rng(777_000)
        for w, wav in bank.items():
            # Variant 0 is the exact session render; 1-2 are same-speaker
            # prosodic re-renders (f0 +-10%).  Nearest-template keyword-ID
            # over variants measures word identity, not prosody luck: a
            # single fixed-prosody template misclassified smoothed-but-
            # intelligible decoded renderings that a 5-variant shifted set
            # identified correctly.
            variants = [wav]
            for f0 in (108.0, 134.0):
                v = synth_word(KEYWORDS[w], tpl_rng, f0=f0)
                variants.append((v / (np.max(np.abs(v)) + 1e-9)
                                 * 0.6).astype(np.float32))
            for i, v in enumerate(variants):
                pcm = v * 32767 * 0.55
                # Template room tone at the SESSIONS' relative floor (tone
                # RMS 40 under word scale 24000): bare-silence closures
                # against the sessions' room tone cost ~2.3 dB DTW on a
                # bit-identical word — enough to flip keyword-ID (the
                # round-2 floor lesson, measured again here: 2.29 ->
                # 0.32 dB once matched).
                tone = rng.normal(0.0, 40.0 * 32767 * 0.55 / 24000.0,
                                  len(pcm))
                wavwrite(str(kw_dir / f"kw_{w}_{i}.wav"), FS_AUDIO,
                         np.clip(pcm + tone, -32767, 32767).astype(np.int16))
    else:
        for day in DAYS:
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
