"""Generate a phoneme-driven formant-synthesis speech corpus.

The image ships no real speech recordings and has no network egress, so the
closest trainable stand-in for real speech is classic Klatt-style formant
synthesis driven by a real English phoneme inventory: vowels with
Peterson-Barney formant targets, diphthong glides, nasals with a murmur
anti-resonance, fricatives with place-shaped noise spectra, stops with
closure + burst + aspiration, coarticulated formant transitions between
segments, and utterance prosody (F0 declination, syllable accents, jitter,
shimmer, final lengthening).  Unlike tools/make_synthetic_corpus.py (random
source-filter texture), the output contains *linguistic* structure — the
consonant bursts, formant dynamics and voiced/unvoiced alternations a
vocoder must reproduce for intelligibility.

The six task keywords of the reference system ("Enter", "Right", "Back",
"Up", "Left", "Down" — reference eval/figure_2ab.py:11) are synthesized
both as held-out validation utterances and sprinkled through the training
text, so vocoder quality gates measure exactly the system's deployed
vocabulary.

Usage:
  python tools/make_speech_corpus.py OUT_DIR [--seconds 480] [--seed 0]
Writes utt_%04d.wav (training), kw_<word>_%d.wav (keyword validation) and
val_%02d.wav (held-out sentences).
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

FS = 16000
FRAME = 80  # 5 ms control frames


@dataclasses.dataclass(frozen=True)
class SpeakerShift:
    """Global speaker/production shifts applied on top of the phoneme
    inventory — held-out evaluation material for intelligibility tests
    (a vocoder gated only on same-generator draws could overfit to one
    speaker's formant geometry; see eval/keyword_intelligibility.py).

    ``formant``  vocal-tract length scale: multiplies every formant and
                 frication band edge (0.9 ~ longer/male-er tract,
                 1.1 ~ shorter/female-er).
    ``f0``       pitch scale on the F0 contour.
    ``rate``     speaking-rate scale on segment durations (>1 = slower).
    ``noise``    production-noise scale: breathiness, aspiration,
                 frication amplitude, and room-tone floor.

    The identity shift reproduces the default generator bit-for-bit (no
    extra rng draws on any path)."""

    formant: float = 1.0
    f0: float = 1.0
    rate: float = 1.0
    noise: float = 1.0


IDENTITY = SpeakerShift()

# Held-out evaluation speakers: substantial, plausible shifts in both
# directions.  NOT used for training corpora — only for `--shifted-val`
# keyword material scored by eval/keyword_intelligibility.py.
SHIFTED_SPEAKERS: Dict[str, SpeakerShift] = {
    "deep": SpeakerShift(formant=0.90, f0=0.80, rate=1.12, noise=0.8),
    "bright": SpeakerShift(formant=1.10, f0=1.30, rate=0.90, noise=1.6),
    # Harder presets (VERDICT r3 item 4): strong rate shifts in both
    # directions and a high-noise production, so the eval covers fast/slow
    # speakers and breathy/noisy material, not just tract-length scaling.
    "fast": SpeakerShift(formant=1.05, f0=1.10, rate=0.72, noise=1.2),
    "slow_breathy": SpeakerShift(formant=0.95, f0=0.88, rate=1.35,
                                 noise=2.5),
    "high_noisy": SpeakerShift(formant=1.15, f0=1.45, rate=0.95,
                               noise=3.0),
}


# ---------------------------------------------------------------------------
# Phoneme inventory
#
# Vowel formants: Peterson & Barney (1952) adult-male averages, lightly
# rounded.  Consonants: standard Klatt-synthesis recipes (burst/frication
# band centers by place of articulation).
# ---------------------------------------------------------------------------

VOWELS: Dict[str, Tuple[float, float, float]] = {
    "iy": (270, 2290, 3010),   # beet
    "ih": (390, 1990, 2550),   # bit
    "eh": (530, 1840, 2480),   # bet
    "ae": (660, 1720, 2410),   # bat
    "ah": (640, 1190, 2390),   # but
    "aa": (730, 1090, 2440),   # father
    "ao": (570, 840, 2410),    # bought
    "uh": (440, 1020, 2240),   # book
    "uw": (300, 870, 2240),    # boot
    "er": (490, 1350, 1690),   # bird
}

# Diphthongs: start/end vowel targets (glide over the vowel's duration).
DIPHTHONGS: Dict[str, Tuple[str, str]] = {
    "ay": ("aa", "iy"),   # bite
    "ey": ("eh", "iy"),   # bait
    "oy": ("ao", "iy"),   # boy
    "aw": ("aa", "uh"),   # bout
    "ow": ("ao", "uh"),   # boat
}

# Sonorant consonants: formant targets (they act like very short vowels).
SONORANTS: Dict[str, Tuple[float, float, float]] = {
    "w": (290, 610, 2150),
    "y": (260, 2070, 3020),
    "r": (310, 1060, 1380),
    "l": (360, 1300, 2880),
}

NASALS: Dict[str, Tuple[float, float, float]] = {
    "m": (250, 1000, 2200),
    "n": (250, 1450, 2500),
    "ng": (250, 1600, 2300),
}

# Fricatives: (noise band lo, hi, voiced?, amplitude)
FRICATIVES: Dict[str, Tuple[float, float, bool, float]] = {
    "s": (4200, 7800, False, 0.32),
    "sh": (2000, 5500, False, 0.38),
    "f": (1500, 7500, False, 0.12),
    "th": (1400, 7600, False, 0.10),
    "z": (4200, 7800, True, 0.22),
    "v": (1500, 7500, True, 0.10),
    "hh": (400, 6500, False, 0.16),  # aspiration through vowel tract
}

# Stops: (burst band lo, hi, voiced?, VOT seconds)
STOPS: Dict[str, Tuple[float, float, bool, float]] = {
    "p": (600, 2200, False, 0.050),
    "t": (3000, 7000, False, 0.055),
    "k": (1500, 3800, False, 0.060),
    "b": (400, 1800, True, 0.012),
    "d": (2800, 6500, True, 0.014),
    "g": (1400, 3400, True, 0.016),
}

# Locus frequencies for stop/nasal coarticulation by place (F2 pull).
PLACE_LOCUS_F2 = {"p": 900, "b": 900, "m": 900,
                  "t": 1800, "d": 1800, "n": 1800, "s": 1800, "z": 1800,
                  "th": 1600, "f": 1100, "v": 1100,
                  "k": 2300, "g": 2300, "ng": 2300, "sh": 2100}

# The deployed six-keyword vocabulary (reference eval/figure_2ab.py:11).
KEYWORDS: Dict[str, List[str]] = {
    "enter": ["eh", "n", "t", "er"],
    "right": ["r", "ay", "t"],
    "back": ["b", "ae", "k"],
    "up": ["ah", "p"],
    "left": ["l", "eh", "f", "t"],
    "down": ["d", "aw", "n"],
}

_ALL_VOWELS = list(VOWELS) + list(DIPHTHONGS)
_ONSETS = (list(STOPS) + list(FRICATIVES) + list(NASALS)
           + list(SONORANTS) + [""])
_CODAS = list(STOPS) + ["s", "z", "f", "n", "m", "ng", "l", "r", ""]


# ---------------------------------------------------------------------------
# Segment planning: phoneme string -> per-frame control tracks
# ---------------------------------------------------------------------------

def _vowel_formants(ph: str) -> Tuple[float, float, float]:
    if ph in VOWELS:
        return VOWELS[ph]
    if ph in DIPHTHONGS:
        return VOWELS[DIPHTHONGS[ph][0]]
    if ph in SONORANTS:
        return SONORANTS[ph]
    if ph in NASALS:
        return NASALS[ph]
    return (500, 1500, 2500)


def _segment_duration(ph: str, rng, final: bool) -> float:
    if ph in VOWELS or ph in DIPHTHONGS:
        d = rng.uniform(0.10, 0.17)
    elif ph in SONORANTS:
        d = rng.uniform(0.055, 0.085)
    elif ph in NASALS:
        d = rng.uniform(0.06, 0.09)
    elif ph in FRICATIVES:
        d = rng.uniform(0.08, 0.12)
    elif ph in STOPS:
        d = STOPS[ph][3] + rng.uniform(0.045, 0.065)  # closure + VOT
    else:
        d = 0.08
    return d * (1.35 if final else 1.0)


class _Tracks:
    """Per-5ms-frame control tracks for one utterance."""

    def __init__(self, n_frames: int):
        z = lambda v: np.full(n_frames, float(v))
        self.f1, self.f2, self.f3 = z(500), z(1500), z(2500)
        self.voiced = np.zeros(n_frames)        # voicing amplitude 0..1
        self.noise = np.zeros(n_frames)         # frication amplitude
        self.noise_lo = z(2000)
        self.noise_hi = z(6000)
        self.tract_noise = np.zeros(n_frames)   # aspiration through tract
        self.amp = np.zeros(n_frames)           # overall segment envelope
        self.nasal = np.zeros(n_frames)         # nasal murmur mix


def plan_word(phones: Sequence[str], rng,
              spk: SpeakerShift = IDENTITY) -> Tuple[_Tracks, float]:
    """Lay out segments with coarticulated formant transitions."""
    durs = [_segment_duration(p, rng, final=(i == len(phones) - 1))
            * spk.rate
            for i, p in enumerate(phones)]
    total = sum(durs)
    n = int(total * FS / FRAME) + 1
    tr = _Tracks(n)

    # Frame spans per segment.
    starts, t = [], 0.0
    for d in durs:
        starts.append(int(t * FS / FRAME))
        t += d
    starts.append(n)

    for i, ph in enumerate(phones):
        a, b = starts[i], max(starts[i] + 1, starts[i + 1])
        seg = slice(a, b)
        m = b - a
        if ph in VOWELS or ph in DIPHTHONGS or ph in SONORANTS:
            if ph in DIPHTHONGS:
                v0, v1 = DIPHTHONGS[ph]
                for k, (lo, hi) in enumerate(zip(VOWELS[v0], VOWELS[v1])):
                    getattr(tr, f"f{k + 1}")[seg] = np.linspace(lo, hi, m)
            else:
                f = _vowel_formants(ph)
                for k in range(3):
                    getattr(tr, f"f{k + 1}")[seg] = f[k]
            tr.voiced[seg] = 1.0
            tr.amp[seg] = 1.0 if (ph in VOWELS or ph in DIPHTHONGS) else 0.7
        elif ph in NASALS:
            f = NASALS[ph]
            for k in range(3):
                getattr(tr, f"f{k + 1}")[seg] = f[k]
            tr.voiced[seg] = 0.8
            tr.amp[seg] = 0.5
            tr.nasal[seg] = 1.0
        elif ph in FRICATIVES:
            lo, hi, voiced, ampl = FRICATIVES[ph]
            tr.noise[seg] = ampl
            tr.noise_lo[seg], tr.noise_hi[seg] = lo, hi
            if voiced:
                tr.voiced[seg] = 0.55
                tr.amp[seg] = 0.35
            if ph == "hh":
                tr.noise[seg] = 0.0
                tr.tract_noise[seg] = ampl
        elif ph in STOPS:
            lo, hi, voiced, vot = STOPS[ph]
            vot_f = max(1, int(vot * FS / FRAME))
            burst_f = max(1, int(0.010 * FS / FRAME))
            # closure: silence (or weak voice bar), then burst, then
            # aspiration until voicing onset.
            if voiced:
                tr.voiced[a:b - vot_f] = 0.25
                tr.amp[a:b - vot_f] = 0.12
            burst = slice(max(a, b - vot_f), min(b, b - vot_f + burst_f))
            tr.noise[burst] = 0.5
            tr.noise_lo[burst], tr.noise_hi[burst] = lo, hi
            if not voiced:
                asp = slice(min(b, b - vot_f + burst_f), b)
                tr.tract_noise[asp] = 0.18

    # Coarticulation: linear formant transitions across segment boundaries
    # (40-60 ms), pulling obstruent spans toward their place locus so CV/VC
    # transitions carry place cues.
    for i in range(len(phones) - 1):
        b = starts[i + 1]
        span = int(rng.uniform(0.040, 0.060) * FS / FRAME)
        lo, hi = max(0, b - span), min(n, b + span)
        if hi - lo < 2:
            continue
        left, right = phones[i], phones[i + 1]
        locus = PLACE_LOCUS_F2.get(left if right in _ALL_VOWELS else right)
        for name in ("f1", "f2", "f3"):
            track = getattr(tr, name)
            va, vb = track[lo], track[hi - 1]
            if name == "f2" and locus is not None:
                mid = 0.5 * (va + vb)
                vb_t = np.linspace(va, locus, (hi - lo) // 2 + 1)[:-1]
                va_t = np.linspace(locus, vb, hi - lo - len(vb_t))
                track[lo:hi] = np.concatenate([vb_t, va_t]) * 0.6 + \
                    np.linspace(va, vb, hi - lo) * 0.4
                del mid
            else:
                track[lo:hi] = np.linspace(va, vb, hi - lo)

    # Smooth every track a little (articulators are sluggish).
    kernel = np.ones(3) / 3.0
    for name in ("f1", "f2", "f3", "voiced", "amp", "tract_noise", "nasal"):
        v = getattr(tr, name)
        setattr(tr, name, np.convolve(v, kernel, mode="same"))

    if spk.formant != 1.0:
        # Vocal-tract length change: every resonance and frication band
        # scales together (deterministic — no rng draws).
        for name in ("f1", "f2", "f3", "noise_lo", "noise_hi"):
            setattr(tr, name, getattr(tr, name) * spk.formant)
    if spk.noise != 1.0:
        tr.noise = tr.noise * spk.noise
        tr.tract_noise = tr.tract_noise * spk.noise
    return tr, total


# ---------------------------------------------------------------------------
# Rendering: control tracks -> waveform
# ---------------------------------------------------------------------------

def _resonator_block(x: np.ndarray, freqs: np.ndarray, bw: float,
                     zi: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Two-pole resonator with per-5ms-frame coefficient updates."""
    out = np.empty_like(x)
    r = np.exp(-np.pi * bw / FS)
    for i in range(0, len(x), FRAME):
        f = freqs[min(i // FRAME, len(freqs) - 1)]
        theta = 2 * np.pi * np.clip(f, 90, 7000) / FS
        # Classic Klatt resonator: unity gain at DC, resonant peak ~Q.
        b1 = 2 * r * np.cos(theta)
        b2 = -r * r
        a0 = 1.0 - b1 - b2
        out[i:i + FRAME], zi = lfilter(
            np.array([a0]), np.array([1.0, -b1, -b2]),
            x[i:i + FRAME], zi=zi)
    return out, zi


def render(tr: _Tracks, rng, f0_start: float, f0_end: float,
           spk: SpeakerShift = IDENTITY) -> np.ndarray:
    n_frames = len(tr.amp)
    n = n_frames * FRAME

    # F0 contour: declination + jitter; voicing gates the pulse train.
    f0 = np.linspace(f0_start, f0_end, n_frames)
    f0 = f0 * np.exp(rng.normal(0, 0.01, n_frames))  # jitter
    f0_s = np.repeat(f0, FRAME)
    phase = np.cumsum(f0_s / FS)
    pulses = (np.diff(np.floor(phase), prepend=phase[0] // 1) > 0)
    pulses = pulses.astype(np.float64)

    # Glottal shaping: differentiated two-pole lowpass gives a -12 dB/oct
    # source with a soft corner (rough LF-model stand-in).
    rp = np.exp(-np.pi * 2 * 100.0 / FS)
    glottal = lfilter([1.0 - rp], [1.0, -rp], pulses)
    glottal = lfilter([1.0 - rp], [1.0, -rp], glottal)
    glottal = np.diff(glottal, prepend=0.0)
    # The (1-r)^2 lowpass gain buries the pulse train ~60 dB below the
    # noise paths; renormalize to unit peak (pulse peaks are uniform, so
    # this is level-stable across utterances).
    glottal = glottal / (np.abs(glottal).max() + 1e-12)

    shimmer = np.repeat(np.exp(rng.normal(0, 0.06, n_frames)), FRAME)
    voiced_g = np.repeat(tr.voiced, FRAME)
    voice_src = glottal * voiced_g * shimmer
    # Breathiness: pitch-synchronous aspiration in the open phase.
    breath = rng.normal(0, 1.0, n) * (0.5 + 0.5 * (np.cos(
        2 * np.pi * (phase % 1.0)) * -1 + 1) / 2)
    voice_src += 0.012 * spk.noise * breath * voiced_g

    # Aspiration routed through the vocal tract (h, stop release).
    voice_src += np.repeat(tr.tract_noise, FRAME) * rng.normal(0, 0.6, n)

    # Cascade formant synthesis (F1..F3 + fixed F4) on the voiced source.
    y = voice_src
    zi1 = zi2 = zi3 = zi4 = np.zeros(2)
    y, zi1 = _resonator_block(y, tr.f1, 90.0, zi1)
    y, zi2 = _resonator_block(y, tr.f2, 110.0, zi2)
    y, zi3 = _resonator_block(y, tr.f3, 170.0, zi3)
    y, zi4 = _resonator_block(y, np.full(n_frames, 3500.0), 250.0, zi4)

    # Nasal murmur: heavy lowpass + anti-resonance notch around 1 kHz.
    nasal_mix = np.repeat(tr.nasal, FRAME)
    if nasal_mix.any():
        rn = np.exp(-np.pi * 300.0 / FS)
        murmur = lfilter([1 - rn], [1.0, -rn], voice_src)
        theta = 2 * np.pi * 1000.0 / FS
        rz = 0.98
        murmur = lfilter([1.0, -2 * np.cos(theta), 1.0],
                         [1.0, -2 * rz * np.cos(theta), rz * rz], murmur)
        y = y * (1 - 0.7 * nasal_mix) + 2.2 * murmur * nasal_mix

    y = y * np.repeat(tr.amp, FRAME)

    # Frication: bandpassed noise with per-frame band edges (parallel path).
    if tr.noise.any():
        white = rng.normal(0, 1.0, n)
        fr = np.zeros(n)
        zi_a = np.zeros(2)
        zi_b = np.zeros(1)
        for i in range(0, n, FRAME):
            k = min(i // FRAME, n_frames - 1)
            if tr.noise[k] <= 1e-4:
                continue
            lo, hi = tr.noise_lo[k], tr.noise_hi[k]
            centre = np.sqrt(lo * hi)
            bw = max(200.0, hi - lo)
            r = np.exp(-np.pi * bw / FS)
            theta = 2 * np.pi * centre / FS
            a = np.array([1.0, -2 * r * np.cos(theta), r * r])
            b = np.array([1 - r])
            blk, zi_a = lfilter(b, a, white[i:i + FRAME], zi=zi_a)
            blk, zi_b = lfilter([1, -1], [1.0], blk, zi=zi_b)  # pre-emphasis
            fr[i:i + FRAME] = blk * tr.noise[k] * 2.2
        y = y + fr

    return y


def synth_word(phones: Sequence[str], rng, f0: float = 120.0,
               spk: SpeakerShift = IDENTITY) -> np.ndarray:
    tr, dur = plan_word(phones, rng, spk)
    return render(tr, rng, f0 * spk.f0 * rng.uniform(1.05, 1.25),
                  f0 * spk.f0 * rng.uniform(0.75, 0.95), spk)


def random_word(rng) -> List[str]:
    word: List[str] = []
    for _ in range(rng.integers(1, 4)):
        onset = _ONSETS[rng.integers(len(_ONSETS))]
        if onset:
            word.append(onset)
        word.append(_ALL_VOWELS[rng.integers(len(_ALL_VOWELS))])
        coda = _CODAS[rng.integers(len(_CODAS))]
        if coda and rng.random() < 0.5:
            word.append(coda)
    return word


def synth_utterance(rng, seconds: float, keyword_rate: float = 0.25
                    ) -> np.ndarray:
    """A sequence of words with pauses, totalling roughly ``seconds``."""
    pieces: List[np.ndarray] = []
    total = 0
    target = int(seconds * FS)
    kw = list(KEYWORDS.values())
    while total < target:
        if rng.random() < keyword_rate:
            phones = kw[rng.integers(len(kw))]
        else:
            phones = random_word(rng)
        w = synth_word(phones, rng, f0=rng.uniform(95, 150))
        pause = np.zeros(int(rng.uniform(0.08, 0.3) * FS))
        pieces += [w, pause]
        total += len(w) + len(pause)
    y = np.concatenate(pieces)[:target]
    peak = np.max(np.abs(y)) + 1e-9
    y = y / peak
    # Room-tone floor (~ -60 dBFS): silence in real recordings is never
    # digital zero, and free-running vocoders behave better when trained
    # with a nonzero floor.
    y = y + rng.normal(0, 1e-3, len(y))
    return (np.clip(y * 0.55, -1, 1) * 32767).astype(np.int16)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--seconds", type=float, default=480.0,
                        help="Training-corpus length (split into ~4 s wavs).")
    parser.add_argument("--val-sentences", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--shifted-val", action="store_true",
                        help="Also write speaker-shifted keyword wavs "
                             "(SHIFTED_SPEAKERS presets) to val_shifted/ — "
                             "held-out generator parameters for "
                             "intelligibility evaluation.  Does not change "
                             "the default train/val output for a given "
                             "seed.")
    args = parser.parse_args()

    out = Path(args.out_dir)
    train_dir, val_dir = out / "train", out / "val"
    train_dir.mkdir(parents=True, exist_ok=True)
    val_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_utts = max(1, int(round(args.seconds / 4.0)))
    for i in range(n_utts):
        wavfile.write(train_dir / f"utt_{i:04d}.wav", FS,
                      synth_utterance(rng, 4.0))

    # Held-out validation sentences (never trained on).
    val_rng = np.random.default_rng(args.seed + 10_000)
    for i in range(args.val_sentences):
        wavfile.write(val_dir / f"val_{i:02d}.wav", FS,
                      synth_utterance(val_rng, 4.0))

    # The six deployed keywords, two prosodic variants each (held out).
    for word, phones in KEYWORDS.items():
        for v in range(2):
            w = synth_word(phones, val_rng, f0=110.0 + 25.0 * v)
            peak = np.max(np.abs(w)) + 1e-9
            # Same room-tone floor as synth_utterance: digital-zero stop
            # closures are unrealistic and make log-domain spectral
            # metrics explode against any vocoder's (trained, correct)
            # noise floor — measured 21-24 dB "distortion" on keywords
            # whose voiced frames scored 1-2 dB, collapsing to 5-6 dB
            # once the closures carry room tone like the training data.
            y = w / peak + val_rng.normal(0, 1e-3, len(w))
            pcm = (np.clip(y * 0.55, -1, 1) * 32767).astype(np.int16)
            wavfile.write(val_dir / f"kw_{word}_{v}.wav", FS, pcm)

    if args.shifted_val:
        # AFTER all default writes (val_rng draw order up to here is
        # unchanged, so default output stays bit-identical per seed).
        shifted_dir = out / "val_shifted"
        shifted_dir.mkdir(parents=True, exist_ok=True)
        for v, (spk_name, spk) in enumerate(sorted(SHIFTED_SPEAKERS.items())):
            for word, phones in KEYWORDS.items():
                w = synth_word(phones, val_rng, f0=110.0 + 25.0 * (v % 2),
                               spk=spk)
                peak = np.max(np.abs(w)) + 1e-9
                y = w / peak + val_rng.normal(
                    0, 1e-3 * spk.noise, len(w))
                pcm = (np.clip(y * 0.55, -1, 1) * 32767).astype(np.int16)
                wavfile.write(shifted_dir / f"kw_{word}_{v}.wav", FS, pcm)
        print(f"wrote {len(SHIFTED_SPEAKERS) * len(KEYWORDS)} "
              f"speaker-shifted keyword wavs to {shifted_dir} "
              f"({', '.join(sorted(SHIFTED_SPEAKERS))})")

    print(f"wrote {n_utts} train utterances to {train_dir}; "
          f"{args.val_sentences} val sentences + {2 * len(KEYWORDS)} "
          f"keyword wavs to {val_dir}")


if __name__ == "__main__":
    main()
