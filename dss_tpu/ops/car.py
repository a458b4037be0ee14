"""Re-referencing and normalization transforms.

Parity targets: reference local/common.py:220-305 (``BadChannelCorrection``,
8-neighborhood grid patching), :308-364 (``CommonAverageReferencing``,
per-grid CAR with excluded channels), :367-376 (``ZScoreNormalization``).

All transforms resolve their channel index sets at construction time (host,
numpy) and apply as static gathers + reductions, so they trace into a single
fused XLA computation inside the feature front-end.  They accept numpy or JAX
arrays shaped [..., time, channels].
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import binary_dilation


class CommonAverageReferencing:
    """Subtract each grid's per-timepoint mean from that grid's channels.

    Channels listed in ``exclude_channels`` do not contribute to the mean but
    are still re-referenced.
    """

    def __init__(self, exclude_channels: Sequence[int], grids: List[np.ndarray],
                 layout: np.ndarray):
        self.grids = grids
        self.layout = np.asarray(layout)
        self.apply_idx: List[np.ndarray] = []
        self.compute_idx: List[np.ndarray] = []
        for grid in grids:
            in_grid = np.isin(self.layout, grid)
            apply_idx = np.flatnonzero(in_grid)
            excluded = np.isin(self.layout, [c for c in exclude_channels if c in grid])
            compute_idx = np.flatnonzero(in_grid & ~excluded)
            self.apply_idx.append(apply_idx.astype(np.int32))
            self.compute_idx.append(compute_idx.astype(np.int32))

    def __call__(self, data):
        xp = jnp if isinstance(data, jnp.ndarray) else np
        result = data
        for apply_idx, compute_idx in zip(self.apply_idx, self.compute_idx):
            mean = xp.mean(data[..., compute_idx], axis=-1, keepdims=True)
            if xp is jnp:
                result = result.at[..., apply_idx].add(-mean)
            else:
                result = np.array(result, copy=True) if result is data else result
                result[..., apply_idx] = result[..., apply_idx] - mean
        return result

    def __repr__(self) -> str:
        lines = [f"CommonAverageReferencing ({len(self.grids)} grids):"]
        for i, (appl, comp) in enumerate(zip(self.apply_idx, self.compute_idx)):
            lines.append(f"Grid {i}")
            lines.append(f"\tmask_appl: [{', '.join(map(str, self.layout[appl]))}]")
            lines.append(f"\tmask_comp: [{', '.join(map(str, self.layout[comp]))}]")
        return "\n".join(lines) + "\n"


class BadChannelCorrection:
    """Replace bad channels with the mean of their non-bad 8-neighborhood."""

    def __init__(self, bad_channels: Sequence[int], grids: List[np.ndarray],
                 layout: np.ndarray):
        self.layout = np.asarray(layout)
        good_masks = [np.ones(grid.shape, dtype=bool) for grid in grids]
        for bc in bad_channels:
            gi = self._grid_index(bc, grids)
            good_masks[gi][grids[gi] == bc] = False

        footprint = np.ones((3, 3), dtype=bool)
        footprint[1, 1] = False

        self.patches = []
        for bc in bad_channels:
            gi = self._grid_index(bc, grids)
            grid = grids[gi]
            seed = grid == bc
            neighborhood = binary_dilation(seed, structure=footprint) & good_masks[gi]
            neighbors = grid[neighborhood]
            bad_idx = np.flatnonzero(self.layout == bc).astype(np.int32)
            nbr_idx = np.concatenate(
                [np.flatnonzero(self.layout == n) for n in neighbors]
            ).astype(np.int32)
            self.patches.append((bad_idx, nbr_idx))

    @staticmethod
    def _grid_index(channel: int, grids: List[np.ndarray]) -> int:
        for i, grid in enumerate(grids):
            if channel in grid:
                return i
        raise IndexError("Channel could not be found in given grids.")

    def __call__(self, data):
        xp = jnp if isinstance(data, jnp.ndarray) else np
        result = data if xp is jnp else np.array(data, copy=True)
        for bad_idx, nbr_idx in self.patches:
            mean = xp.mean(data[..., nbr_idx], axis=-1, keepdims=True)
            if xp is jnp:
                result = result.at[..., bad_idx].set(mean)
            else:
                result[..., bad_idx] = mean
        return result

    def __len__(self) -> int:
        return len(self.patches)

    def __repr__(self) -> str:
        items = []
        for bad_idx, nbr_idx in self.patches:
            bc = int(self.layout[bad_idx][0])
            neighbors = [int(self.layout[i]) for i in nbr_idx]
            items.append(f"{bc} -> {neighbors}")
        return f"Correcting {len(self.patches)} bad channels: {', '.join(items)}"


class ZScoreNormalization:
    """(x - mean) / std per channel with precomputed day statistics."""

    def __init__(self, channel_means, channel_stds):
        self.channel_means = channel_means
        self.channel_stds = channel_stds

    def __call__(self, data):
        return (data - self.channel_means) / self.channel_stds
