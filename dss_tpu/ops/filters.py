"""IIR filtering for the high-gamma front-end, TPU-native.

Parity target: reference local/units.py:124-132 designs an 8th-order
Butterworth band-pass (70-170 Hz) and band-stop (118-122 Hz) as second-order
sections and streams packets through ``scipy.signal.sosfilt`` with carried
per-channel state.

TPU design
----------
Each second-order section in transposed direct-form II is a 2-dimensional
linear state-space system::

    y_t  = b0 x_t + z0_{t-1}
    z0_t = b1 x_t - a1 y_t + z1_{t-1}
    z1_t = b2 x_t - a2 y_t

which, after substituting y, is the affine recurrence  z_t = A z_{t-1} + B x_t
with constant A = [[-a1, 1], [-a2, 0]] and B = [b1 - a1 b0, b2 - a2 b0].

Two execution strategies, bit-compatible up to float rounding:

* ``sosfilt_scan``   — ``lax.scan`` over time (sequential, minimal latency;
  used for small online packets).
* ``sosfilt_parallel`` — ``lax.associative_scan`` over the affine maps
  (O(log T) depth; used for long offline trials, where a sequential scan
  would serialize the TPU).

Both carry and return scipy-layout state ``zi [n_sections, 2, channels]`` so
online chunked filtering is exactly equivalent to one offline pass.
Filter design itself happens once on the host via scipy.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _sig


def design_bandpass(fs: float, l_freq: float, h_freq: float, order: int = 8) -> np.ndarray:
    """Butterworth band-pass as second-order sections (float64 design)."""
    return _sig.butter(order, [l_freq, h_freq], btype="bandpass", fs=fs, output="sos")


def design_bandstop(fs: float, l_freq: float, h_freq: float, order: int = 8) -> np.ndarray:
    """Butterworth band-stop as second-order sections (float64 design)."""
    return _sig.butter(order, [l_freq, h_freq], btype="bandstop", fs=fs, output="sos")


def design_hga_cascade(fs: float, l_freq: float = 70.0, h_freq: float = 170.0,
                       notch_low: float = 118.0, notch_high: float = 122.0,
                       order: int = 8) -> np.ndarray:
    """The full high-gamma front-end cascade: band-pass then band-stop.

    The reference applies the two filters back to back with separate states
    (local/units.py:151-152); as LTI systems in series they compose into one
    SOS cascade, which halves scan overhead on TPU.
    """
    bp = design_bandpass(fs, l_freq, h_freq, order)
    bs = design_bandstop(fs, notch_low, notch_high, order)
    return np.concatenate([bp, bs], axis=0)


def sosfilt_zi(sos: np.ndarray, nb_channels: int) -> np.ndarray:
    """Steady-state step-response initial conditions, tiled per channel.

    Matches the reference's initialization (local/units.py:128-132), which
    seeds streaming state with scipy's ``sosfilt_zi`` broadcast over
    electrodes. Shape: [n_sections, 2, nb_channels].
    """
    zi = _sig.sosfilt_zi(sos)  # [S, 2]
    return np.repeat(zi[:, :, None], nb_channels, axis=-1)


def zero_zi(sos: np.ndarray, nb_channels: int) -> np.ndarray:
    return np.zeros((sos.shape[0], 2, nb_channels))


def _state_space(sos: np.ndarray):
    """Per-section companion-form (A [S,2,2], B [S,2], b0 [S]), float64."""
    sos = np.asarray(sos, np.float64)
    b0, b1, b2 = sos[:, 0], sos[:, 1], sos[:, 2]
    a1, a2 = sos[:, 4], sos[:, 5]
    S = sos.shape[0]
    A = np.zeros((S, 2, 2))
    A[:, 0, 0] = -a1
    A[:, 0, 1] = 1.0
    A[:, 1, 0] = -a2
    B = np.stack([b1 - a1 * b0, b2 - a2 * b0], axis=-1)
    return A, B, b0


def _modal_sections(sos_bytes: bytes, shape):
    """Modal (eigenbasis) realization of each section, computed in float64.

    The companion matrix A = [[-a1, 1], [-a2, 0]] is severely non-normal for
    narrowband sections: ||A^k|| transiently peaks at O(Q) before decaying,
    which amplifies float32 rounding in the associative scan to ~1e-2.  In
    the (balanced) modal basis A becomes a scaled rotation (complex poles) or
    a diagonal (real poles), so ||A'^k|| = r^k <= 1 and the parallel scan is
    as well-conditioned as the sequential one.

    Returns (Am [S,2,2], Bm [S,2], Cm [S,2], b0 [S], P [S,2,2], Pinv) with
    z_df2 = P @ z_modal.
    """
    sos = np.frombuffer(sos_bytes, np.float64).reshape(shape)
    A, B, b0 = _state_space(sos)
    S = A.shape[0]
    Am = np.zeros_like(A)
    P = np.zeros_like(A)
    Pinv = np.zeros_like(A)
    Bm = np.zeros_like(B)
    Cm = np.zeros_like(B)
    C = np.array([1.0, 0.0])
    for s in range(S):
        w, V = np.linalg.eig(A[s])
        complex_pair = np.iscomplexobj(w) and np.abs(w.imag).max() > 1e-12
        if complex_pair:
            v = V[:, 0]
            T = np.stack([v.real, v.imag], axis=1)  # real modal basis
        else:
            w = w.real
            V = V.real
            if abs(np.linalg.det(V)) < 1e-12:  # defective: keep companion
                T = np.eye(2)
            else:
                T = V
        Tinv = np.linalg.inv(T)
        Bs = Tinv @ B[s]
        Cs = C @ T
        # Balance |B| ~ |C| to minimize roundoff.  A complex pair's A' is a
        # scaled rotation, preserved only under UNIFORM scaling — use one
        # scale for both coordinates; real (diagonal) modes may scale
        # per-coordinate.
        if complex_pair:
            d = np.full(
                2,
                np.sqrt((np.linalg.norm(Bs) + 1e-30)
                        / (np.linalg.norm(Cs) + 1e-30)),
            )
        else:
            d = np.sqrt((np.abs(Bs) + 1e-30) / (np.abs(Cs) + 1e-30))
        T = T @ np.diag(d)
        Tinv = np.diag(1.0 / d) @ Tinv
        Am[s] = Tinv @ A[s] @ T
        Bm[s] = Tinv @ B[s]
        Cm[s] = C @ T
        P[s] = T
        Pinv[s] = Tinv
    return Am, Bm, Cm, b0, P, Pinv


from functools import lru_cache as _lru_cache

_modal_sections = _lru_cache(maxsize=32)(_modal_sections)


def _modal_for(sos: np.ndarray):
    sos = np.ascontiguousarray(np.asarray(sos, np.float64))
    return _modal_sections(sos.tobytes(), sos.shape)


@partial(jax.jit, static_argnames=())
def sosfilt_scan(sos: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray):
    """Sequential cascade filter via ``lax.scan``.

    The per-timestep section chain runs as a ``fori_loop`` (compiled once,
    independent of section count) rather than a Python unroll — compile time
    on a 16-section cascade drops by an order of magnitude.

    x: [T, C]; zi: [S, 2, C]. Returns (y [T, C], zf [S, 2, C]).
    """
    sos = jnp.asarray(sos, x.dtype)
    b = sos[:, :3]
    a = sos[:, 4:6]
    n_sections = sos.shape[0]

    def step(z, x_t):
        # z: [S, 2, C]; x_t: [C]
        def section(s, carry):
            z_all, xs = carry
            y = b[s, 0] * xs + z_all[s, 0]
            z0 = b[s, 1] * xs - a[s, 0] * y + z_all[s, 1]
            z1 = b[s, 2] * xs - a[s, 1] * y
            z_all = z_all.at[s, 0].set(z0).at[s, 1].set(z1)
            return z_all, y

        z, y = jax.lax.fori_loop(0, n_sections, section, (z, x_t))
        return z, y

    zf, y = jax.lax.scan(step, jnp.asarray(zi, x.dtype), x)
    return y, zf


def _section_parallel(x: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray,
                      C: jnp.ndarray, b0, zi: jnp.ndarray):
    """One modal-basis section over [T, C] input via associative scan.

    Recurrence: z_t = A z_{t-1} + B x_t,  y_t = b0 x_t + C . z_{t-1},
    with A the (well-conditioned) modal state matrix and zi/zf in modal
    coordinates [2, channels].
    """
    T = x.shape[0]
    # Element t is the affine map z -> A z + B x_t. Composition:
    # (A2, b2) o (A1, b1) = (A2 A1, A2 b1 + b2).
    bvec = B[:, None, None] * x[None, :, :]         # [2, T, C]
    bvec = jnp.moveaxis(bvec, 1, 0)                 # [T, 2, C]
    A_t = jnp.broadcast_to(A, (T, 2, 2))

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        return (jnp.einsum("tij,tjk->tik", A2, A1),
                jnp.einsum("tij,tjc->tic", A2, b1) + b2)

    A_cum, b_cum = jax.lax.associative_scan(combine, (A_t, bvec))
    # z_t = A_cum_t @ zi + b_cum_t ;  y_t = b0 x_t + C . z_{t-1}
    z = jnp.einsum("tij,jc->tic", A_cum, zi) + b_cum        # [T, 2, C]
    z_prev = jnp.concatenate([zi[None], z[:-1]], axis=0)    # [T, 2, C]
    y = b0 * x + jnp.einsum("j,tjc->tc", C, z_prev)
    return y, z[-1]


def sosfilt_parallel(sos: np.ndarray, x: jnp.ndarray, zi: jnp.ndarray,
                     block_size: int = 512):
    """Cascade filter with O(T / block * log block) depth: ``lax.scan`` over
    blocks whose interior is a parallel ``lax.associative_scan``.

    Runs each section in its *modal* basis (see ``_modal_sections``) so the
    float32 parallel scan matches the sequential scan to ~1e-5 even for the
    narrowband notch sections.  External state stays in scipy DF-II layout
    [S, 2, C]; conversion happens at entry/exit.

    ``sos`` must be a concrete (design-time) array, not a traced value.
    x: [T, C]; zi: [S, 2, C]. Returns (y [T, C], zf [S, 2, C]).
    """
    Am, Bm, Cm, b0, P, Pinv = _modal_for(np.asarray(sos))
    return _sosfilt_parallel_jit(
        jnp.asarray(x), jnp.asarray(zi),
        jnp.asarray(Am, x.dtype), jnp.asarray(Bm, x.dtype),
        jnp.asarray(Cm, x.dtype), jnp.asarray(b0, x.dtype),
        jnp.asarray(P, x.dtype), jnp.asarray(Pinv, x.dtype),
        block_size=block_size,
    )


@partial(jax.jit, static_argnames=("block_size",))
def _sosfilt_parallel_jit(x, zi, Am, Bm, Cm, b0, P, Pinv, block_size: int):
    zi = zi.astype(x.dtype)
    # DF-II -> modal coordinates.
    z_modal = jnp.einsum("sij,sjc->sic", Pinv, zi)

    def cascade_block(z_all, x_blk):
        # Chain the sections with a scan (body compiles once): the carry is
        # the signal flowing through the cascade; per-section states are
        # scanned in/out.
        def one_section(x_cur, sec):
            A, B, C, b0_s, z_s = sec
            x_next, zf = _section_parallel(x_cur, A, B, C, b0_s, z_s)
            return x_next, zf

        x_blk, zfs = jax.lax.scan(one_section, x_blk,
                                  (Am, Bm, Cm, b0, z_all))
        return zfs, x_blk

    T, C = x.shape
    n_blocks, rem = divmod(T, block_size)
    if n_blocks:
        xb = x[: n_blocks * block_size].reshape(n_blocks, block_size, C)
        z, yb = jax.lax.scan(cascade_block, z_modal, xb)
        y = yb.reshape(n_blocks * block_size, C)
    else:
        z, y = z_modal, x[:0]
    if rem:
        z, y_rem = cascade_block(z, x[n_blocks * block_size:])
        y = jnp.concatenate([y, y_rem], axis=0)
    # Modal -> DF-II coordinates.
    zf = jnp.einsum("sij,sjc->sic", P, z)
    return y, zf


def sosfilt(sos, x, zi, parallel: bool = False):
    """Dispatch to the scan (streaming) or parallel (offline) path."""
    fn = sosfilt_parallel if parallel else sosfilt_scan
    return fn(jnp.asarray(sos), jnp.asarray(x), jnp.asarray(zi))
