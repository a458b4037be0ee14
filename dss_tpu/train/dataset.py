"""Trial-sequential dataset over prepared HDF corpora.

Parity target: reference local/training.py:24-132 (``SequentialSpeechTrials``,
a torch Dataset): one item = one variable-length trial; trial boundaries are
runs of constant value in the sign-alternating ``trial_ids`` vector
(produced by corpus preparation); targets select ``lpc_coefficients`` or
``vad_labels``.

TPU addition: ``padded_batches`` — length-bucketed, padded, masked batches so
trials can train data-parallel on device instead of the reference's
batch-size-1 loop.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np

from ..utils.hdf import load_hdf

Transform = Optional[Callable]


def run_boundaries(seq: np.ndarray) -> List[Tuple[int, int]]:
    """(start, stop) spans of maximal constant runs in ``seq``."""
    seq = np.asarray(seq)
    change = (np.flatnonzero(seq[:-1] != seq[1:]) + 1).tolist()
    edges = [0] + change + [len(seq)]
    return list(zip(edges[:-1], edges[1:]))


def squeeze_trial_ids(trial_ids: np.ndarray) -> List[int]:
    """Collapse runs to one (absolute) stimulus id per trial."""
    out = [int(trial_ids[0])]
    last = trial_ids[0]
    for v in trial_ids[1:]:
        if v != last:
            out.append(abs(int(v)))
            last = v
    return out


class SequentialSpeechTrials:
    """Each item is one trial: (hga [T, ch], target [T, .])."""

    def __init__(self, feature_files: List[str], transform: Transform = None,
                 target_transform: Transform = None,
                 target_specifier: str = "lpc_coefficients"):
        self.feature_files = list(feature_files)
        self.transform = transform
        self.target_transform = target_transform
        self.target_specifier = target_specifier

        self._trials: List[Tuple[np.ndarray, np.ndarray]] = []
        self.trial_labels: List[int] = []
        self.trial_filename: List[str] = []
        self.frame_counter = 0
        for fname in self.feature_files:
            data = load_hdf(str(fname))
            trial_ids = data["trial_ids"]
            self.frame_counter += len(trial_ids)
            labels = squeeze_trial_ids(trial_ids)
            self.trial_labels.extend(labels)
            self.trial_filename.extend([str(fname)] * len(labels))
            hga = data["hga_activity"]
            target = data[target_specifier]
            for start, stop in run_boundaries(trial_ids):
                self._trials.append((hga[start:stop], target[start:stop]))

    def __len__(self) -> int:
        return len(self._trials)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        hga, target = self._trials[index]
        if self.transform:
            hga = self.transform(hga)
        if self.target_transform:
            target = self.target_transform(target)
        return hga, target

    def __repr__(self) -> str:
        days = sorted({Path(f).parent.name for f in self.feature_files})
        hours = (self.frame_counter * 0.01) / 3600
        return (
            f"SequentialSpeechTrials: {len(self)} trials with "
            f"{self.frame_counter} frames (total: {hours:.02f}h). "
            f"Days covered: {', '.join(days)}"
        )

    def plot_trial(self, index: int, stimuli_map=None, filename=None):
        """Render one trial's features and targets side by side (parity:
        reference local/training.py:111-132)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        hga, target = self[index]
        label = (stimuli_map[self.trial_labels[index]] if stimuli_map
                 else str(self.trial_labels[index]))
        fig, (ax_hga, ax_t) = plt.subplots(2, 1, figsize=(14, 8), num=1,
                                           clear=True)
        ax_hga.set_title(
            f"Label: {label}, Filename: {self.trial_filename[index]}",
            loc="left")
        ax_hga.imshow(hga.T, aspect="auto", origin="lower", cmap="bwr",
                      vmin=-4, vmax=4)
        ax_hga.set_ylabel("Channel", labelpad=-18)
        t2 = target if target.ndim > 1 else target[:, None]
        ax_t.imshow(t2.T, aspect="auto", origin="lower", cmap="viridis")
        ax_t.set_ylabel("Target", labelpad=-18)
        if filename:
            plt.savefig(filename, dpi=72)
        else:
            plt.show()
        plt.close(fig)


def padded_batches(
    dataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    length_multiple: int = 50,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield length-bucketed (x [B, T, C], y [B, T, .], mask [B, T]) batches.

    Trials are sorted by length (shuffled within equal lengths when ``rng``
    given), grouped into batches, padded to the next multiple of
    ``length_multiple`` — bounding XLA recompilation to a small set of
    shapes while keeping padding waste low.
    """
    order = np.argsort([len(dataset[i][0]) for i in range(len(dataset))],
                       kind="stable")
    if rng is not None:
        # Shuffle batches, not items, to retain the bucketing.
        pass
    batches = [order[i:i + batch_size] for i in range(0, len(order), batch_size)]
    if rng is not None:
        rng.shuffle(batches)

    for batch_idx in batches:
        items = [dataset[i] for i in batch_idx]
        max_len = max(len(x) for x, _ in items)
        T = -(-max_len // length_multiple) * length_multiple
        B = len(items)
        x0, y0 = items[0]
        x = np.zeros((B, T) + x0.shape[1:], np.float32)
        y_shape = (B, T) + y0.shape[1:] if y0.ndim > 1 else (B, T)
        y = np.zeros(y_shape, np.float32)
        mask = np.zeros((B, T), np.float32)
        for b, (xb, yb) in enumerate(items):
            x[b, :len(xb)] = xb
            y[b, :len(yb)] = yb
            mask[b, :len(xb)] = 1.0
        yield x, y, mask
