"""Fused framing + log-power Pallas kernel.

Replaces the reference Cython kernel (extensions/hga/hga_optimized.pyx:27-47)
which loops O(windows x window_length x channels).  TPU formulation: window
length L is a multiple of the hop H, so each window is the sum of L/H
consecutive "hop groups"; the kernel squares a tile of samples once, reduces
each hop group (one [H, C] -> [C] reduction per group, all vectorized as a
reshape + sum), then forms every window by adding L/H shifted group-sum
slices.  Work per sample drops from L/H multiplies to ~1, and everything
stays in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# CPU-backed tests exercise the kernels through the Pallas interpreter.
_INTERPRET = os.environ.get("DSS_PALLAS_INTERPRET", "0") == "1"


from ..frames import LOG_POWER_EPS


def _log_power_kernel(x_ref, out_ref, *, hop: int, groups_per_window: int,
                      windows_per_tile: int, channels: int):
    w0 = pl.program_id(0) * windows_per_tile
    region_rows = (windows_per_tile + groups_per_window - 1) * hop
    region = x_ref[pl.ds(w0 * hop, region_rows), :]
    x2 = region * region
    groups = jnp.sum(
        x2.reshape(windows_per_tile + groups_per_window - 1, hop, channels),
        axis=1,
    )  # [tile_groups, C]
    acc = groups[0:windows_per_tile]
    for g in range(1, groups_per_window):  # static unroll (L/H is tiny)
        acc = acc + groups[g:g + windows_per_tile]
    window_len = groups_per_window * hop
    out_ref[...] = jnp.log(acc / float(window_len) + LOG_POWER_EPS)


@partial(jax.jit, static_argnames=("hop", "window_len", "num_win"))
def _log_power_call(data, hop: int, window_len: int, num_win: int):
    channels = data.shape[1]
    groups_per_window = window_len // hop
    windows_per_tile = min(256, num_win)
    num_tiles = -(-num_win // windows_per_tile)
    padded_windows = num_tiles * windows_per_tile
    needed_rows = (padded_windows - 1) * hop + window_len
    if needed_rows > data.shape[0]:
        data = jnp.pad(data, ((0, needed_rows - data.shape[0]), (0, 0)))

    out = pl.pallas_call(
        partial(
            _log_power_kernel,
            hop=hop,
            groups_per_window=groups_per_window,
            windows_per_tile=windows_per_tile,
            channels=channels,
        ),
        grid=(num_tiles,),
        # Whole input lives in VMEM: online packets are ~KBs and a 20 s
        # 64-channel trial is ~5 MB, well under the ~16 MB budget.
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (windows_per_tile, channels),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((padded_windows, channels), data.dtype),
        interpret=_INTERPRET,
    )(data)
    return out[:num_win]


def log_power_pallas(data: jnp.ndarray, starts: np.ndarray, length: int) -> jnp.ndarray:
    """Log-power features for windows of ``length`` samples at ``starts``.

    Requires uniformly strided starts with the stride dividing the window
    length (true for the canonical 50 ms / 10 ms @ 1 kHz config); callers
    fall back to the XLA gather path otherwise.
    """
    num_win = len(starts)
    if num_win == 0:
        return jnp.zeros((0, data.shape[1]), data.dtype)
    hop = int(starts[1] - starts[0]) if num_win > 1 else length
    uniform = num_win < 2 or bool(np.all(np.diff(starts) == hop))
    if not uniform or length % hop != 0 or starts[0] != 0:
        raise ValueError("log_power_pallas requires uniform starts from 0 with "
                         "hop dividing the window length")
    return _log_power_call(data, hop, length, num_win)
