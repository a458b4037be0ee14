"""Shared spectral definition of the vocoder: Bark-ish bands, cepstra, and
LPC recovery.

Feature contract (mirrors the reference's 20-of-36 LPCNet features,
LPCNet.pyx:47-48): features[0:18] are DCT-II cepstral coefficients of the
log10 energies of 18 triangular bands on an opus-style Bark-ish scale over
0-8 kHz; features[18] encodes the pitch period, features[19] the pitch
correlation (scalings defined in features.py).

LPC recovery follows the classic route the LPCNet C library takes
(freq.c semantics, re-derived): cepstrum -> band energies -> triangular
interpolation to a linear-frequency PSD -> inverse FFT autocorrelation ->
lag-windowed Levinson-Durbin -> 16 prediction coefficients.

Everything here is pure jax on static shapes; frames batch with vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

FRAME_SIZE = 160          # 10 ms @ 16 kHz
WINDOW_SIZE = 320         # 20 ms analysis window (2 frames)
FREQ_SIZE = WINDOW_SIZE // 2 + 1
NB_BANDS = 18
NB_FEATURES = 20
LPC_ORDER = 16
SAMPLE_RATE = 16000
PREEMPH = 0.85

# Band centers (Hz) on the opus/Bark-ish scale over 0..8 kHz.
BAND_CENTERS_HZ = np.array(
    [0, 200, 400, 600, 800, 1000, 1200, 1400, 1600, 2000, 2400, 2800,
     3200, 4000, 4800, 5600, 6800, 8000], dtype=np.float64
)
assert len(BAND_CENTERS_HZ) == NB_BANDS


def _band_matrix() -> np.ndarray:
    """[NB_BANDS, FREQ_SIZE] triangular interpolation weights.

    Every FFT bin's weight across bands sums to 1, so the matrix is both the
    analysis operator (band energy = W @ psd) and, transposed, the synthesis
    interpolator (psd = W.T @ band gains).
    """
    bin_hz = SAMPLE_RATE / 2.0 / (FREQ_SIZE - 1)
    freqs = np.arange(FREQ_SIZE) * bin_hz
    W = np.zeros((NB_BANDS, FREQ_SIZE))
    centers = BAND_CENTERS_HZ
    for b in range(NB_BANDS):
        lo = centers[b - 1] if b > 0 else centers[0]
        mid = centers[b]
        hi = centers[b + 1] if b < NB_BANDS - 1 else centers[-1]
        up = (freqs - lo) / max(mid - lo, bin_hz)
        down = (hi - freqs) / max(hi - mid, bin_hz)
        tri = np.minimum(np.clip(up, 0, 1), np.clip(down, 0, 1))
        if b == 0:
            tri[freqs <= mid] = 1.0
            tri[freqs > centers[1]] = 0.0
            down = (centers[1] - freqs) / (centers[1] - mid)
            sel = (freqs > mid) & (freqs <= centers[1])
            tri[sel] = down[sel]
        if b == NB_BANDS - 1:
            tri[freqs >= mid] = 1.0
            up = (freqs - centers[-2]) / (mid - centers[-2])
            sel = (freqs < mid) & (freqs >= centers[-2])
            tri[sel] = up[sel]
        W[b] = tri
    # Normalize so each bin distributes unit weight across bands.
    col = W.sum(axis=0)
    col[col == 0] = 1.0
    return W / col


BAND_MATRIX = _band_matrix()

# Orthonormal DCT-II basis over the 18 bands (scipy.fftpack.dct norm='ortho').
def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    M = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


DCT_MATRIX = _dct_matrix(NB_BANDS)

# Gaussian lag window applied to the autocorrelation before Levinson
# (standard spectral-smoothing regularization).
_LAG_WINDOW = np.exp(
    -0.5 * (2.0 * np.pi * 60.0 * np.arange(LPC_ORDER + 1) / SAMPLE_RATE) ** 2
)


def band_energies(spectrum_sq: jnp.ndarray) -> jnp.ndarray:
    """|X(f)|^2 [.., FREQ_SIZE] -> band energies [.., NB_BANDS]."""
    return spectrum_sq @ jnp.asarray(BAND_MATRIX, spectrum_sq.dtype).T


def psd_from_bands(bands: jnp.ndarray) -> jnp.ndarray:
    """Band energies -> interpolated linear-frequency PSD [.., FREQ_SIZE]."""
    return bands @ jnp.asarray(BAND_MATRIX, bands.dtype)


def cepstrum_from_bands(bands: jnp.ndarray, floor: float = 1e-9) -> jnp.ndarray:
    logE = jnp.log10(bands + floor)
    return logE @ jnp.asarray(DCT_MATRIX, bands.dtype).T


def bands_from_cepstrum(cepstrum: jnp.ndarray) -> jnp.ndarray:
    logE = cepstrum @ jnp.asarray(DCT_MATRIX, cepstrum.dtype)
    return jnp.power(10.0, logE)


def autocorr_from_psd(psd: jnp.ndarray, order: int = LPC_ORDER) -> jnp.ndarray:
    """PSD [FREQ_SIZE] -> autocorrelation r[0..order] via inverse rFFT."""
    r = jnp.fft.irfft(psd, n=WINDOW_SIZE)[: order + 1]
    return r * jnp.asarray(_LAG_WINDOW, psd.dtype)


def levinson(r: jnp.ndarray, order: int = LPC_ORDER):
    """Levinson-Durbin: autocorrelation -> (lpc a[1..order], residual energy).

    Prediction convention: pred[n] = -sum_k a[k] * x[n-k]; unrolled over the
    (static, small) order.
    """
    a = jnp.zeros(order, r.dtype)
    err = r[0] + 1e-9
    for i in range(order):
        acc = r[i + 1]
        for j in range(i):
            acc = acc + a[j] * r[i - j]
        k = -acc / err
        # a[j] += k * a[i-1-j] for j < i, then a[i] = k
        if i > 0:
            rev = a[:i][::-1]
            a = a.at[:i].add(k * rev)
        a = a.at[i].set(k)
        err = err * (1.0 - k * k)
    return a, err


@partial(jax.jit, static_argnames=())
def lpc_from_bands(bands: jnp.ndarray):
    """Band energies [NB_BANDS] -> (lpc [LPC_ORDER], residual energy)."""
    psd = psd_from_bands(bands)
    r = autocorr_from_psd(psd)
    return levinson(r)


@partial(jax.jit, static_argnames=())
def lpc_from_cepstrum(cepstrum: jnp.ndarray):
    return lpc_from_bands(bands_from_cepstrum(cepstrum))
