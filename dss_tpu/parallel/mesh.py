"""Device-mesh construction for sharded training and multi-stream serving.

The reference has no multi-device story (batch-size-1 torch loops); this is
the framework's native scale-out path: a ("data", "model") mesh where the
data axis parallelizes trials/streams and the model axis shards LSTM gate
blocks and vocoder GRU weights (tensor parallelism).  Collectives are
inserted by GSPMD from sharding annotations and ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 0) -> Mesh:
    """Build a ("data", "model") mesh over the first ``n_devices`` devices.

    model_parallel=0 picks the largest power-of-two model axis <= 2 that
    divides n (LSTM gate dims 4H are even; TP beyond 2-4 is not useful for
    these model sizes).
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = devices[:n]
    if model_parallel <= 0:
        model_parallel = 2 if n % 2 == 0 and n > 1 else 1
    data_parallel = n // model_parallel
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))
