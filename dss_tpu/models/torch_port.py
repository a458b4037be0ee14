"""Port PyTorch ``state_dict`` checkpoints into dss_tpu parameter pytrees.

The reference trains torch LSTMs and the online system loads a single
``best_model.pth`` (reference local/units.py:421-424, 491-493).  This module
maps those checkpoints (``lstm.weight_ih_l{k}[_reverse]``,
``lstm.{weight,bias}_{ih,hh}_l{k}``, ``classifier.*`` / ``regressor.*``) onto
our pytree layout so models trained with either stack interoperate.

Checkpoints are read without torch when possible (torch.load requires torch;
we use it if importable, else numpy ``.npz`` twins written by our trainers).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def from_torch_state_dict(state_dict: Dict, num_layers: int,
                          bidirectional: bool, head_name: str):
    """Build {'lstm': ..., head_key: ...} params from a torch state_dict.

    head_name: 'classifier' (VAD) or 'regressor' (decoder).
    """
    directions = 2 if bidirectional else 1
    suffixes = ["", "_reverse"] if bidirectional else [""]
    lstm = []
    for layer in range(num_layers):
        dirs = []
        for d in range(directions):
            sfx = suffixes[d]
            dirs.append({
                "w_ih": jnp.asarray(_to_numpy(state_dict[f"lstm.weight_ih_l{layer}{sfx}"])),
                "w_hh": jnp.asarray(_to_numpy(state_dict[f"lstm.weight_hh_l{layer}{sfx}"])),
                "b_ih": jnp.asarray(_to_numpy(state_dict[f"lstm.bias_ih_l{layer}{sfx}"])),
                "b_hh": jnp.asarray(_to_numpy(state_dict[f"lstm.bias_hh_l{layer}{sfx}"])),
            })
        lstm.append(dirs)
    head = {
        "weight": jnp.asarray(_to_numpy(state_dict[f"{head_name}.weight"])),
        "bias": jnp.asarray(_to_numpy(state_dict[f"{head_name}.bias"])),
    }
    return {"lstm": lstm, head_name: head}


def to_torch_state_dict(params, head_name: str) -> Dict[str, np.ndarray]:
    """Inverse mapping: our pytree -> torch-layout state_dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    lstm = params["lstm"]
    directions = len(lstm[0])
    suffixes = ["", "_reverse"] if directions == 2 else [""]
    for layer, dirs in enumerate(lstm):
        for d, p in enumerate(dirs):
            sfx = suffixes[d]
            out[f"lstm.weight_ih_l{layer}{sfx}"] = np.asarray(p["w_ih"])
            out[f"lstm.weight_hh_l{layer}{sfx}"] = np.asarray(p["w_hh"])
            out[f"lstm.bias_ih_l{layer}{sfx}"] = np.asarray(p["b_ih"])
            out[f"lstm.bias_hh_l{layer}{sfx}"] = np.asarray(p["b_hh"])
    out[f"{head_name}.weight"] = np.asarray(params[head_name]["weight"])
    out[f"{head_name}.bias"] = np.asarray(params[head_name]["bias"])
    return out


def load_checkpoint(path: str, num_layers: int, bidirectional: bool,
                    head_name: str):
    """Load a ``.pth`` (torch) or ``.npz`` (ours) checkpoint into params."""
    if str(path).endswith(".npz"):
        state_dict = dict(np.load(path))
    else:
        import torch  # CPU torch is available in this image

        state_dict = torch.load(path, map_location="cpu")
    return from_torch_state_dict(state_dict, num_layers, bidirectional,
                                 head_name)
