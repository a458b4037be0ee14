"""Best-model checkpointing and training-state resume.

Parity target: reference local/training.py:136-162 (``StoreBestModel``):
keeps exactly one best weights file, updated when validation accuracy
improves (VAD) or validation loss improves (decoder); the two criteria are
mutually exclusive.  The online system consumes that single file
(local/units.py:421-424, 491-493).

File format: ``.npz`` of the torch-layout state_dict (torch-portable names),
or a real ``.pth`` when the filename asks for it and torch is importable —
so checkpoints interoperate with the reference's consumers in both
directions.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Optional, Tuple

import numpy as np

import jax

from ..models.torch_port import to_torch_state_dict

logger = logging.getLogger("dss_tpu.train.checkpoints")


def save_params(filename: str, params, head_name: str) -> None:
    state_dict = to_torch_state_dict(params, head_name)
    if str(filename).endswith(".pth"):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state_dict.items()}, filename)
    else:
        np.savez(filename, **state_dict)


class StoreBestModel:
    """Store the best parameters (by val accuracy OR val loss) to one file."""

    def __init__(self, filename: str, head_name: str = "classifier",
                 info: Optional[dict] = None):
        self.current_best_validation_acc = -np.inf
        self.current_best_validation_loss = np.inf
        self.filename = str(filename)
        self.head_name = head_name
        self.optional_info = info

    def update(self, params, validation_acc: Optional[float] = None,
               validation_loss: Optional[float] = None,
               info: Optional[dict] = None) -> bool:
        if validation_acc is not None and validation_loss is not None:
            raise ValueError("Class can only be used for either accuracy or loss.")

        updated = False
        if validation_acc is not None and \
                validation_acc > self.current_best_validation_acc:
            save_params(self.filename, params, self.head_name)
            self.current_best_validation_acc = validation_acc
            logger.info(f"Updated best model weights for a score of {validation_acc}.")
            self.optional_info = info
            updated = True

        if validation_loss is not None and \
                validation_loss < self.current_best_validation_loss:
            save_params(self.filename, params, self.head_name)
            self.current_best_validation_loss = validation_loss
            logger.info(f"Updated best model weights for a score of {validation_loss}.")
            updated = True
        return updated


# ---------------------------------------------------------------------------
# Training-state checkpointing (resume support the reference lacks —
# SURVEY.md §5.4: "no optimizer-state checkpointing, no resume").
# ---------------------------------------------------------------------------

def save_train_state(filename: str, params, opt_state,
                     extra: Optional[dict] = None) -> None:
    """Persist the full training state (params + optimizer + metadata)."""
    blob = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "extra": extra or {},
    }
    with open(filename, "wb") as f:
        pickle.dump(blob, f)


def load_train_state(filename: str) -> Tuple[Any, Any, dict]:
    with open(filename, "rb") as f:
        blob = pickle.load(f)
    import jax.numpy as jnp

    params = jax.tree.map(jnp.asarray, blob["params"])
    opt_state = jax.tree.map(jnp.asarray, blob["opt_state"])
    return params, opt_state, blob.get("extra", {})
