"""Code-independent speech generator: harmonic-plus-noise keyword corpus.

PURPOSE (VERDICT r3 item 3): every quality number in this repo used to be
scored on corpora from tools/make_speech_corpus.py — a formant source-filter
synthesizer — against templates from that SAME generator, so the evaluation
graded the builder's homework with the builder's answer key.  This module is
a SECOND speech synthesizer that shares no code and no parameter tables with
it, for out-of-family evaluation of the shipped vocoder checkpoints:

* synthesis model: sinusoidal (harmonic) additive synthesis with continuous
  per-harmonic phase accumulation plus FFT-shaped noise, NOT time-domain
  resonator filtering of a glottal pulse train;
* vowel targets: average male formant measurements from Hillenbrand et al.
  (1995) "Acoustic characteristics of American English vowels" — a
  different dataset than the Peterson-Barney table the training generator
  uses;
* spectral envelope: log-amplitude Gaussian bumps at the vowel targets with
  a -6 dB/octave tilt, evaluated per harmonic — no LPC, no biquads;
* its own phoneme inventory, duration model and prosody scheme.

The six deployed keywords (reference eval/figure_2ab.py:11) are rendered as
kw_<word>_<n>.wav plus sentence_<n>.wav files, the exact layout
eval/keyword_intelligibility.py consumes, so the shipped checkpoints'
resynthesis can be scored against material their training distribution
never produced.  Honest caveat (MIGRATION.md): this is still synthetic
speech — no recorded human speech exists in this environment — but the two
generators fail differently, which is what breaks the circularity.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

SR = 16000

# ---------------------------------------------------------------------------
# Phone inventory (uppercase keys: this module's own naming scheme)
# ---------------------------------------------------------------------------

# Hillenbrand et al. (1995), Table V, men: (F1, F2, F3) steady-state means.
VOWEL_TARGETS = {
    "IY": (342, 2322, 3000),
    "IH": (427, 2034, 2684),
    "EH": (580, 1799, 2605),
    "AE": (588, 1952, 2601),
    "AH": (623, 1200, 2550),
    "AA": (768, 1333, 2522),
    "AO": (652, 997, 2538),
    "UH": (469, 1122, 2434),
    "UW": (378, 997, 2343),
    "ER": (474, 1379, 1710),
}

# Hillenbrand et al. (1995), women: a SECOND f0/formant register for the
# out-of-family eval (VERDICT r4 item 4) — approximate steady-state means
# from the same study's female speakers, nothing shared with the training
# generator's single-speaker tables.
VOWEL_TARGETS_FEMALE = {
    "IY": (437, 2761, 3372),
    "IH": (483, 2365, 3053),
    "EH": (731, 2058, 2979),
    "AE": (669, 2349, 2972),
    "AH": (753, 1426, 2933),
    "AA": (936, 1551, 2815),
    "AO": (781, 1136, 2824),
    "UH": (519, 1225, 2827),
    "UW": (459, 1105, 2735),
    "ER": (523, 1588, 1929),
}

# (vowel table, sonorant/voice-bar formant scale, base f0 Hz)
REGISTERS = {
    "male": (VOWEL_TARGETS, 1.0, 112.0),
    "female": (VOWEL_TARGETS_FEMALE, 1.17, 205.0),
}

# Diphthongs as start/end vowel target pairs (Hillenbrand's /ai/, /au/ style
# trajectories approximated by endpoint interpolation).
DIPHTHONG_TRAJ = {
    "AY": ("AA", "IY"),
    "AW": ("AA", "UH"),
    "EY": ("EH", "IY"),
    "OW": ("AO", "UW"),
}

# Sonorant consonants: (F1, F2, F3) plus a harmonic-energy scale.
SONORANT_TARGETS = {
    "L": (360, 1100, 2800, 0.55),
    "R": (340, 1200, 1600, 0.55),
    "W": (330, 800, 2300, 0.5),
    "Y": (300, 2200, 3000, 0.5),
    "N": (280, 1500, 2600, 0.35),
    "M": (270, 1000, 2500, 0.35),
    "NG": (280, 2000, 2700, 0.35),
}

# Obstruents: noise band (lo, hi Hz), noise level, voiced flag,
# closure duration in seconds (0 = continuant).
OBSTRUENTS = {
    "S":  (4200, 7800, 0.30, False, 0.0),
    "SH": (2200, 6500, 0.32, False, 0.0),
    "F":  (1400, 7500, 0.16, False, 0.0),
    "TH": (1800, 7600, 0.14, False, 0.0),
    "V":  (1200, 6800, 0.12, True, 0.0),
    "Z":  (4000, 7600, 0.20, True, 0.0),
    "P":  (700, 2200, 0.30, False, 0.065),
    "T":  (3200, 7200, 0.34, False, 0.060),
    "K":  (1700, 3600, 0.32, False, 0.070),
    "B":  (600, 2000, 0.26, True, 0.050),
    "D":  (2800, 6800, 0.28, True, 0.045),
    "G":  (1500, 3200, 0.26, True, 0.055),
}

# The deployed vocabulary in this module's own phone spelling.
WORDS = {
    "enter": ["EH", "N", "T", "ER"],
    "right": ["R", "AY", "T"],
    "back":  ["B", "AE", "K"],
    "up":    ["AH", "P"],
    "left":  ["L", "EH", "F", "T"],
    "down":  ["D", "AW", "N"],
}

FILLER_WORDS = [
    ["M", "IY"], ["T", "UW"], ["S", "OW"], ["G", "EY", "T"],
    ["W", "AA", "SH"], ["Y", "EH", "S"], ["N", "OW"], ["D", "IH", "G"],
    ["SH", "UH", "K"], ["V", "ER", "B"], ["K", "AY", "N", "D"],
    ["TH", "IH", "N"], ["P", "AO", "Z"], ["B", "ER", "D"],
]


def _phone_dur(ph: str, rng: np.random.Generator, last: bool) -> float:
    """Independent duration model: base + jitter, final lengthening."""
    if ph in VOWEL_TARGETS:
        d = 0.13 + 0.05 * rng.random()
    elif ph in DIPHTHONG_TRAJ:
        d = 0.17 + 0.06 * rng.random()
    elif ph in SONORANT_TARGETS:
        d = 0.07 + 0.03 * rng.random()
    else:
        lo, hi, lvl, voiced, closure = OBSTRUENTS[ph]
        d = closure + 0.055 + 0.035 * rng.random()
    return d * (1.25 if last else 1.0)


# ---------------------------------------------------------------------------
# Harmonic part: additive synthesis, envelope evaluated PER HARMONIC as
# log-amplitude Gaussian bumps at the formant targets over a -6 dB/oct tilt
# (no filtering anywhere — the spectral shape is imposed amplitude-wise)
# ---------------------------------------------------------------------------

def _harmonics(n: int, f0_track: np.ndarray, formant_track,
               amp_track: np.ndarray) -> np.ndarray:
    """Sum of harmonics with continuous phase accumulation; per-sample
    amplitudes follow the time-varying formant envelope.

    f0_track [nfr], formant_track: three [nfr] arrays, amp_track [nfr]."""
    out = np.zeros(n, np.float64)
    idx = np.minimum((np.arange(n) * len(f0_track)) // max(n, 1),
                     len(f0_track) - 1)
    f0 = f0_track[idx]                                  # per sample
    f_at = np.stack([ft[idx] for ft in formant_track])  # [3, n]
    max_h = int(7600 // max(float(np.min(f0_track)), 60.0))
    peaks_db = (22.0, 16.0, 10.0)
    for h in range(1, max_h + 1):
        fh = h * f0
        audible = fh < 7600.0
        if not np.any(audible):
            break
        env_db = -6.0 * np.log2(np.maximum(fh, 60.0)
                                / np.maximum(f_at[0], 120.0))
        for i in range(3):
            width = 90.0 + 0.06 * f_at[i]
            bump = peaks_db[i] - 0.5 * ((fh - f_at[i]) / width) ** 2 * 8.686
            env_db = np.maximum(env_db, bump)
        amp = 10.0 ** (env_db / 20.0) * audible
        phase0 = 0.37 * h * (h + 1)  # fixed offsets decohere the buzz
        phases = phase0 + np.cumsum(2.0 * np.pi * fh / SR)
        out += amp * np.sin(phases)
    return out * amp_track[idx]


def _shaped_noise(n: int, lo: float, hi: float, level: float,
                  rng: np.random.Generator) -> np.ndarray:
    """Band-shaped noise via FFT masking with soft (raised-cosine) edges."""
    white = rng.standard_normal(n + 256)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(len(white), 1.0 / SR)
    ramp = 300.0
    mask = np.clip((f - (lo - ramp)) / ramp, 0.0, 1.0) \
        * np.clip(((hi + ramp) - f) / ramp, 0.0, 1.0)
    shaped = np.fft.irfft(spec * mask, n=len(white))[:n]
    peak = np.max(np.abs(shaped)) + 1e-9
    return shaped / peak * level


def _fade(n: int, up: int, down: int) -> np.ndarray:
    w = np.ones(n)
    up = min(up, n)
    down = min(down, n)
    if up:
        w[:up] = 0.5 - 0.5 * np.cos(np.pi * np.arange(up) / up)
    if down:
        w[n - down:] = 0.5 + 0.5 * np.cos(np.pi * np.arange(down) / down)
    return w


def synth_word_hnm(phones, rng: np.random.Generator,
                   f0: float = 118.0,
                   register: str = "male") -> np.ndarray:
    """Render one word: per-phone segments, formant targets interpolated
    through voiced spans, declining F0 contour, HNM rendering.

    ``register`` selects the vowel-target table + sonorant formant scale
    (REGISTERS); callers set the matching f0."""
    vowels, son_scale, _ = REGISTERS[register]
    segs = []
    n_ph = len(phones)
    # Per-phone targets and durations.
    plan = []
    for i, ph in enumerate(phones):
        dur = _phone_dur(ph, rng, last=(i == n_ph - 1))
        plan.append((ph, dur))
    total = sum(d for _, d in plan)
    t_cursor = 0.0
    for i, (ph, dur) in enumerate(plan):
        n = int(dur * SR)
        frac0 = t_cursor / total
        frac1 = (t_cursor + dur) / total
        t_cursor += dur
        # Declination + final fall.
        f0_a = f0 * (1.08 - 0.18 * frac0)
        f0_b = f0 * (1.08 - 0.18 * frac1) * (0.92 if i == n_ph - 1 else 1.0)
        nfr = max(n // 80, 2)
        f0_tr = np.linspace(f0_a, f0_b, nfr)

        if ph in vowels or ph in DIPHTHONG_TRAJ \
                or ph in SONORANT_TARGETS:
            if ph in DIPHTHONG_TRAJ:
                a, b = DIPHTHONG_TRAJ[ph]
                fa, fb = vowels[a], vowels[b]
                scale = 1.0
            elif ph in vowels:
                fa = fb = vowels[ph]
                scale = 1.0
            else:
                t = SONORANT_TARGETS[ph]
                fa = fb = tuple(f * son_scale for f in t[:3])
                scale = t[3]
            track = [np.linspace(fa[k], fb[k], nfr) for k in range(3)]
            seg = _harmonics(n, f0_tr, track, np.full(nfr, 1.0))
            # Level-normalize the harmonic sum so voiced segments and
            # noise segments mix at speech-like relative levels (a raw
            # harmonic stack peaks ~40x above the noise recipes).
            seg = seg / (np.max(np.abs(seg)) + 1e-9) * scale
            # Nasals/sonorants get a soft aspiration floor for realism.
            seg = seg + _shaped_noise(n, 300, 4500, 0.012, rng)
            seg *= _fade(n, n // 8, n // 6)
        else:
            lo, hi, lvl, voiced, closure = OBSTRUENTS[ph]
            nc = int(closure * SR)
            burst = _shaped_noise(max(n - nc, 1), lo, hi, lvl, rng)
            if closure:  # stop: silence then burst with fast attack
                burst *= _fade(len(burst), 32, max((n - nc) // 3, 16))
                seg = np.concatenate([np.zeros(nc), burst])
            else:  # fricative
                burst *= _fade(len(burst), n // 6, n // 6)
                seg = np.concatenate([np.zeros(nc), burst])
            if voiced:  # voice bar
                bar_tr = [np.full(nfr, 250.0 * son_scale),
                          np.full(nfr, 1200.0 * son_scale),
                          np.full(nfr, 2400.0 * son_scale)]
                bar = _harmonics(n, f0_tr * 0.95, bar_tr,
                                 np.full(nfr, 1.0))[:len(seg)]
                seg = seg + 0.22 * bar / (np.max(np.abs(bar)) + 1e-9)
        segs.append(seg[:n])
    word = np.concatenate(segs)
    peak = np.max(np.abs(word)) + 1e-9
    word = word / peak * 0.42
    return word.astype(np.float32)


def _room_tone(n: int, rng: np.random.Generator) -> np.ndarray:
    """-60 dBFS noise floor (matches the deployment material's floor so
    log-domain metrics see silence the same way)."""
    return (1e-3 * rng.standard_normal(n)).astype(np.float32)


def render_utterance(words, rng: np.random.Generator,
                     f0: float = 118.0,
                     register: str = "male") -> np.ndarray:
    parts = [_room_tone(int(0.22 * SR), rng)]
    for w in words:
        parts.append(synth_word_hnm(w, rng,
                                    f0=f0 * (0.96 + 0.08 * rng.random()),
                                    register=register))
        parts.append(_room_tone(int((0.14 + 0.1 * rng.random()) * SR), rng))
    audio = np.concatenate(parts)
    # Ride the -60 dBFS room tone under everything: digital-zero stop
    # closures explode log-domain metrics against a vocoder's (correct)
    # trained noise floor — the round-2 keyword-fixture lesson.
    return (audio + _room_tone(len(audio), rng)).astype(np.float32)


def write_wav(path: str, audio: np.ndarray) -> None:
    from scipy.io import wavfile

    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    wavfile.write(path, SR, pcm)


def main() -> None:
    ap = argparse.ArgumentParser(
        "Generate the harmonic-plus-noise (code-independent) keyword "
        "corpus for out-of-family vocoder evaluation.")
    ap.add_argument("--out", default="/tmp/hnm_corpus")
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--variants", type=int, default=2,
                    help="prosodic variants per keyword (per register)")
    ap.add_argument("--sentences", type=int, default=4)
    ap.add_argument("--registers", default="male",
                    help="comma-separated REGISTERS subset; 'male,female' "
                         "doubles the keyword set with the women's "
                         "Hillenbrand targets at ~205 Hz (the second f0 "
                         "register the r4 out-of-family eval lacked). "
                         "Default 'male' keeps prior seeds byte-stable.")
    args = ap.parse_args()

    regs = [r.strip() for r in args.registers.split(",") if r.strip()]
    unknown = set(regs) - set(REGISTERS)
    if unknown:
        raise SystemExit(f"unknown registers: {sorted(unknown)}")

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n_files = 0
    for r_idx, reg in enumerate(regs):
        _, _, f0_base = REGISTERS[reg]
        for word, phones in WORDS.items():
            for v in range(args.variants):
                f0 = f0_base + 14.0 * v + 4.0 * rng.random()
                audio = render_utterance([phones], rng, f0=f0,
                                         register=reg)
                write_wav(os.path.join(
                    args.out,
                    f"kw_{word}_{r_idx * args.variants + v}.wav"), audio)
                n_files += 1
    for sidx in range(args.sentences):
        n_words = 3 + int(rng.integers(0, 3))
        ws = [FILLER_WORDS[int(rng.integers(0, len(FILLER_WORDS)))]
              for _ in range(n_words)]
        ws.insert(int(rng.integers(0, n_words)),
                  list(WORDS.values())[sidx % len(WORDS)])
        audio = render_utterance(ws, rng, register=regs[0])
        write_wav(os.path.join(args.out, f"sentence_{sidx}.wav"), audio)
        n_files += 1
    print(f"wrote {n_files} wavs to {args.out} "
          f"({len(WORDS)}x{args.variants}x{len(regs)} keywords "
          f"[{','.join(regs)}] + {args.sentences} sentences; "
          f"harmonic-plus-noise, Hillenbrand-1995 targets)")


if __name__ == "__main__":
    main()
