"""HDF5 corpus container I/O.

Parity target: reference local/common.py:379-391 (``save_data_to_hdf``).
Containers hold the per-recording datasets
``{hga_activity, lpc_coefficients, vad_labels, trial_ids}``.
"""

from __future__ import annotations

import os
from typing import Dict

import h5py
import numpy as np


def save_data_to_hdf(
    filename: str, parameters: Dict[str, np.ndarray], overwrite: bool = False
) -> bool:
    """Store time-aligned neural and acoustic data into an .hdf container.

    Returns False (and writes nothing) when the file exists and overwrite is
    disabled, mirroring the reference's non-destructive default.
    """
    if os.path.exists(filename) and not overwrite:
        print(
            f"File {filename} already exists and overwrite is set to False. "
            f"Training data is not stored."
        )
        return False

    with h5py.File(filename, "w") as hf:
        for container_name, data in parameters.items():
            hf.create_dataset(container_name, data=data)

    return True


def load_hdf(filename: str) -> Dict[str, np.ndarray]:
    """Load every dataset of an .hdf container into memory."""
    with h5py.File(filename, "r") as hf:
        return {key: np.asarray(hf[key]) for key in hf.keys()}
