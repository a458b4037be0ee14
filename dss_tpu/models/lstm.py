"""Multi-layer (bi)directional LSTM as jitted ``lax.scan`` networks.

Parity target: reference local/models.py:11-58 builds both models on
``torch.nn.LSTM``.  We reproduce torch's exact cell semantics so trained
PyTorch checkpoints port over losslessly:

* gate order i, f, g, o in the stacked [4H, .] weight matrices;
* two bias vectors (b_ih + b_hh);
* layer k>0 consumes the (direction-concatenated) output of layer k-1;
* dropout applied to every layer output except the last (training only);
* state layout [num_layers * num_directions, batch, hidden].

TPU design: the input projection for a whole sequence is hoisted out of the
scan as one large [T*B, in] x [in, 4H] MXU matmul; the scan body only carries
the recurrent [B, H] x [H, 4H] matmul.  Batched trials (vmap/pjit over B)
keep the MXU fed; weights can be sharded over the 4H axis for tensor
parallelism (see dss_tpu.parallel).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LstmState = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c): [L*D, B, H] each
Params = Dict[str, jnp.ndarray]


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def lstm_init(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = False,
) -> List[List[Params]]:
    """Initialize like torch.nn.LSTM: U(-1/sqrt(H), 1/sqrt(H)) everywhere.

    Returns params[layer][direction] with keys w_ih [4H, in], w_hh [4H, H],
    b_ih [4H], b_hh [4H].
    """
    directions = 2 if bidirectional else 1
    bound = 1.0 / np.sqrt(hidden_size)
    params: List[List[Params]] = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size * directions
        dirs = []
        for _ in range(directions):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            dirs.append({
                "w_ih": _uniform(k1, (4 * hidden_size, in_size), bound),
                "w_hh": _uniform(k2, (4 * hidden_size, hidden_size), bound),
                "b_ih": _uniform(k3, (4 * hidden_size,), bound),
                "b_hh": _uniform(k4, (4 * hidden_size,), bound),
            })
        params.append(dirs)
    return params


def _cell_scan(p: Params, x: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray,
               reverse: bool, mask: Optional[jnp.ndarray] = None,
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One direction of one layer. x: [T, B, in] -> (y [T, B, H], hT, cT).

    ``mask`` [T, B] (1 = valid): masked steps pass (h, c) through unchanged,
    so right-padded batches produce exactly the unpadded results — critical
    for the *backward* direction of the bidirectional decoder, which would
    otherwise integrate the padding's bias dynamics before reaching data.
    """
    # Hoist the input projection out of the recurrence: single MXU matmul.
    x_proj = jnp.einsum("tbi,gi->tbg", x, p["w_ih"]) + p["b_ih"] + p["b_hh"]
    w_hh_t = p["w_hh"].T  # [H, 4H]

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp
        gates = xp_t + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m_t is not None:
            m = m_t[:, None]
            h_new = jnp.where(m > 0, h_new, h)
            c_new = jnp.where(m > 0, c_new, c)
        return (h_new, c_new), h_new

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), (x_proj, mask),
                                reverse=reverse)
    return ys, hT, cT


def lstm_apply(
    params: List[List[Params]],
    x: jnp.ndarray,
    state: LstmState,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, LstmState]:
    """Run the stacked LSTM. x: [B, T, in] (batch-first, like the reference).

    state: (h, c) each [L*D, B, H]; mask [B, T] gates state updates (see
    ``_cell_scan``). Returns (y [B, T, D*H], (hT, cT)).
    """
    num_layers = len(params)
    directions = len(params[0])
    h0, c0 = state

    xt = jnp.swapaxes(x, 0, 1)  # [T, B, in]
    mt = jnp.swapaxes(mask, 0, 1) if mask is not None else None
    h_out, c_out = [], []
    for layer in range(num_layers):
        outs = []
        for d in range(directions):
            idx = layer * directions + d
            ys, hT, cT = _cell_scan(
                params[layer][d], xt, h0[idx], c0[idx], reverse=(d == 1),
                mask=mt,
            )
            outs.append(ys)
            h_out.append(hT)
            c_out.append(cT)
        xt = outs[0] if directions == 1 else jnp.concatenate(outs, axis=-1)
        if train and dropout > 0.0 and layer < num_layers - 1:
            if dropout_rng is None:
                raise ValueError("dropout_rng required when train and dropout>0")
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, xt.shape)
            xt = jnp.where(keep, xt / (1.0 - dropout), 0.0)

    y = jnp.swapaxes(xt, 0, 1)  # [B, T, D*H]
    return y, (jnp.stack(h_out), jnp.stack(c_out))


def linear_init(key: jax.Array, in_features: int, out_features: int) -> Params:
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / np.sqrt(in_features)
    k1, k2 = jax.random.split(key)
    return {
        "weight": _uniform(k1, (out_features, in_features), bound),
        "bias": _uniform(k2, (out_features,), bound),
    }


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["weight"].T + p["bias"]


def zeros_state(num_layers: int, directions: int, batch_size: int,
                hidden_size: int, dtype=jnp.float32) -> LstmState:
    shape = (num_layers * directions, batch_size, hidden_size)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
