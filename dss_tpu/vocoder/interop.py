"""Weight interop with the xiph LPCNet ecosystem.

The reference compiles the released xiph-LPCNet trained model into its C
extension (reference extensions/lpcnet/setup.py:34-36 links ``nnet_data.c``;
the Cython API is extensions/lpcnet/LPCNet.pyx:6-40).  Those released
weights originate from a Keras checkpoint (``lpcnet*.h5``); this module maps
that layer layout into :class:`dss_tpu.vocoder.net.LPCNetModel` parameters —
so a deployment that owns the released (or any retrained) LPCNet ``.h5`` can
run it through this framework's synthesis stack — and back out, so native
checkpoints round-trip through the same container.

Layer mapping (upstream layer names from xiph/LPCNet ``lpcnet.py`` /
``dump_lpcnet.py``):

  ==================  ==========================================
  xiph layer          LPCNetModel params
  ==================  ==========================================
  embed_sig           emb_sig, emb_pred, emb_exc (ONE shared
                      [256, E] table upstream; fanned out to our
                      three slots — numerically identical)
  embed_pitch         emb_pitch [256, 64] (frame net consumes
                      concat(features, embed_pitch(period)) with
                      period = round(50*f[18] + 100); see
                      net.LPCNetModel.condition)
  feature_conv1/2     conv1_w/b, conv2_w/b (Conv1D kernel
                      [W, in, out] -> [W*in, out], oldest tap
                      first; upstream pads 'same', flagged by the
                      emb_pitch presence)
  feature_dense1/2    fc1_w/b, fc2_w/b
  gru_a               gru_a_wx/wh/bx/bh — Keras gate order
                      (z, r, h) reordered to ours (r, z, n);
                      reset_after bias [2, 3H] -> bx, bh
  gru_b               gru_b_wx/wh/bx/bh (same reorder)
  dual_fc (MDense)    fc_out{1,2}_w [in,256], per-channel INSIDE
                      biases fc_out{1,2}_b, factors fc_out{1,2}_g;
                      fc_out_b (our outside bias) set to zeros
  ==================  ==========================================

Both GRUs must be ``reset_after`` (CuDNN-compatible — upstream trains them
that way); a 1-D GRU bias is rejected because the reset-before recurrence
computes a different candidate state.

Imported checkpoints run the same fast paths as native ones: the Pallas
sampler kernels implement the inner (pre-tanh) dual-FC biases behind a
static flag (ops/pallas/sampler.py), so xiph-trained models get the full
kernel speed, not a scan fallback.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from .lpc import NB_FEATURES
from .mulaw import MULAW_LEVELS
from .net import CONV_WIDTH, LPCNetModel

logger = logging.getLogger("dss_tpu.vocoder.interop")

PITCH_EMBED_DIM = 64

# Keras gate order is (z, r, h); LPCNetModel uses (r, z, n).
_KERAS_TO_NATIVE = (1, 0, 2)


def _reorder_gates(w: np.ndarray, units: int, order=_KERAS_TO_NATIVE
                   ) -> np.ndarray:
    """Permute the 3 gate blocks along the last axis."""
    blocks = [w[..., k * units:(k + 1) * units] for k in order]
    return np.concatenate(blocks, axis=-1)


def _collect_datasets(group, out: Dict[str, np.ndarray], prefix="") -> None:
    import h5py

    for name, item in group.items():
        path = f"{prefix}/{name}" if prefix else name
        if isinstance(item, h5py.Dataset):
            out[path] = np.asarray(item)
        else:
            _collect_datasets(item, out, path)


def _layer_weights(all_ds: Dict[str, np.ndarray], layer: str
                   ) -> Dict[str, np.ndarray]:
    """All datasets under a layer name, keyed by their weight kind."""
    out = {}
    for path, arr in all_ds.items():
        parts = path.split("/")
        if layer in parts:
            kind = parts[-1].split(":")[0]  # 'kernel:0' -> 'kernel'
            out[kind] = arr
    return out


def import_lpcnet_h5(path: str, strict: bool = True):
    """Load a Keras LPCNet checkpoint -> (params dict, LPCNetModel).

    Accepts both full-model saves (weights under ``model_weights/``) and
    weights-only saves.  The returned params run through the standard
    synthesis stack (``LPCNet(backend='net', weights=params)``).
    ``strict=False`` relaxes the upstream-shape validation (used when
    re-importing native exports, whose frame net has no pitch input and
    whose bunched GRU-A input is wider)."""
    import h5py

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        all_ds: Dict[str, np.ndarray] = {}
        _collect_datasets(root, all_ds)

    def layer(name):
        w = _layer_weights(all_ds, name)
        if not w:
            raise ValueError(f"layer '{name}' not found in {path} "
                             f"(have: {sorted(set(p.split('/')[0] for p in all_ds))})")
        return w

    emb_sig = layer("embed_sig")["embeddings"]
    assert emb_sig.shape[0] == MULAW_LEVELS, emb_sig.shape
    embed_dim = emb_sig.shape[1]

    emb_pitch = layer("embed_pitch")["embeddings"]

    conv1 = layer("feature_conv1")
    conv2 = layer("feature_conv2")
    k1 = conv1["kernel"]  # [W, in, out]
    k2 = conv2["kernel"]
    assert k1.shape[0] == CONV_WIDTH, k1.shape
    cond_dim = k1.shape[2]
    # A pitch-conditioned (upstream) frame net concatenates the pitch
    # embedding onto the 20 features; a native export consumes the
    # features directly (its placeholder pitch table is all-zero).
    uses_pitch = k1.shape[1] == NB_FEATURES + emb_pitch.shape[1]
    if strict and not uses_pitch:
        raise ValueError(
            f"feature_conv1 expects concat(features[{NB_FEATURES}], "
            f"pitch_embed[{emb_pitch.shape[1]}]), got input {k1.shape[1]}")

    d1 = layer("feature_dense1")
    d2 = layer("feature_dense2")

    def gru(name):
        w = layer(name)
        kern, rec = w["kernel"], w["recurrent_kernel"]
        units = rec.shape[0]
        bias = w["bias"]
        if bias.ndim != 2 or bias.shape[0] != 2:
            raise ValueError(
                f"{name}: expected reset_after GRU bias [2, 3H], got "
                f"{bias.shape} — reset-before GRUs have different "
                f"candidate-state semantics and cannot be mapped exactly")
        return {
            "wx": _reorder_gates(kern, units),
            "wh": _reorder_gates(rec, units),
            "bx": _reorder_gates(bias[0], units),
            "bh": _reorder_gates(bias[1], units),
            "units": units,
        }

    gru_a = gru("gru_a")
    gru_b = gru("gru_b")

    md = layer("dual_fc")
    kern = md["kernel"]  # [in, 256, 2]
    if kern.ndim != 3 or kern.shape[1:] != (MULAW_LEVELS, 2):
        raise ValueError(f"dual_fc kernel shape {kern.shape} != "
                         f"[in, {MULAW_LEVELS}, 2]")
    md_bias = md["bias"]      # [256, 2]
    md_factor = md["factor"]  # [256, 2]

    f32 = lambda a: np.asarray(a, np.float32)
    params = {
        "emb_sig": f32(emb_sig),
        "emb_pred": f32(emb_sig),   # upstream shares ONE table
        "emb_exc": f32(emb_sig),
        "conv1_w": f32(k1.reshape(-1, cond_dim)),
        "conv1_b": f32(conv1["bias"]),
        "conv2_w": f32(k2.reshape(-1, cond_dim)),
        "conv2_b": f32(conv2["bias"]),
        "fc1_w": f32(d1["kernel"]),
        "fc1_b": f32(d1["bias"]),
        "fc2_w": f32(d2["kernel"]),
        "fc2_b": f32(d2["bias"]),
        "gru_a_wx": f32(gru_a["wx"]),
        "gru_a_wh": f32(gru_a["wh"]),
        "gru_a_bx": f32(gru_a["bx"]),
        "gru_a_bh": f32(gru_a["bh"]),
        "gru_b_wx": f32(gru_b["wx"]),
        "gru_b_wh": f32(gru_b["wh"]),
        "gru_b_bx": f32(gru_b["bx"]),
        "gru_b_bh": f32(gru_b["bh"]),
        "fc_out1_w": f32(kern[:, :, 0]),
        "fc_out2_w": f32(kern[:, :, 1]),
        "fc_out1_b": f32(md_bias[:, 0]),
        "fc_out2_b": f32(md_bias[:, 1]),
        "fc_out1_g": f32(md_factor[:, 0]),
        "fc_out2_g": f32(md_factor[:, 1]),
        "fc_out_b": np.zeros(MULAW_LEVELS, np.float32),
        "gru_a_mask": np.ones(
            (gru_a["units"], 3 * gru_a["units"]), np.float32),
    }
    if uses_pitch:
        params["emb_pitch"] = f32(emb_pitch)

    expected_in = 3 * embed_dim + cond_dim
    if strict and params["gru_a_wx"].shape[0] != expected_in:
        raise ValueError(
            f"gru_a input {params['gru_a_wx'].shape[0]} != "
            f"3*embed + cond = {expected_in}")

    model = LPCNetModel(gru_a_units=gru_a["units"], gru_b_units=gru_b["units"],
                        cond_dim=cond_dim, embed_dim=embed_dim)
    logger.info(
        f"imported LPCNet h5: gru_a={gru_a['units']} gru_b={gru_b['units']} "
        f"cond={cond_dim} embed={embed_dim} (shared embed table; "
        f"inner-bias head runs the Pallas fast path)")
    return params, model


def export_lpcnet_h5(params, path: str) -> None:
    """Write params into the xiph Keras layer layout (weights-only file).

    Exact round trip through :func:`import_lpcnet_h5` — including native
    checkpoints, whose outside dual-FC bias and per-slot embeddings have no
    upstream slot and therefore travel in a ``dss_tpu_extra`` group that
    upstream consumers simply ignore (a warning notes the approximation
    they would see)."""
    import h5py

    p = {k: np.asarray(v) for k, v in params.items()}
    ga = p["gru_a_wh"].shape[0]
    gb = p["gru_b_wh"].shape[0]

    per_slot_emb = not (np.array_equal(p["emb_sig"], p["emb_pred"])
                        and np.array_equal(p["emb_sig"], p["emb_exc"]))
    outer_bias = bool(np.any(p["fc_out_b"]))
    if per_slot_emb or outer_bias:
        logger.warning(
            "export_lpcnet_h5: native checkpoint features (per-slot "
            "embeddings / outside dual-FC bias) have no upstream slot; "
            "they are stored under dss_tpu_extra for exact re-import, but "
            "third-party Keras consumers will approximate this model")

    native = (1, 0, 2)  # (r,z,n) -> (z,r,h)

    def to_keras(w, units):
        return _reorder_gates(w, units, order=native)

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def put(layer, kind, arr):
            g = mw.require_group(layer).require_group(layer)
            g.create_dataset(f"{kind}:0", data=np.asarray(arr, np.float32))

        put("embed_sig", "embeddings", p["emb_sig"])
        pitch = p.get("emb_pitch",
                      np.zeros((MULAW_LEVELS, PITCH_EMBED_DIM), np.float32))
        put("embed_pitch", "embeddings", pitch)

        cond_dim = p["fc1_w"].shape[0]
        in1 = p["conv1_w"].shape[0] // CONV_WIDTH
        put("feature_conv1", "kernel",
            p["conv1_w"].reshape(CONV_WIDTH, in1, cond_dim))
        put("feature_conv1", "bias", p["conv1_b"])
        in2 = p["conv2_w"].shape[0] // CONV_WIDTH
        put("feature_conv2", "kernel",
            p["conv2_w"].reshape(CONV_WIDTH, in2, cond_dim))
        put("feature_conv2", "bias", p["conv2_b"])
        put("feature_dense1", "kernel", p["fc1_w"])
        put("feature_dense1", "bias", p["fc1_b"])
        put("feature_dense2", "kernel", p["fc2_w"])
        put("feature_dense2", "bias", p["fc2_b"])

        for name, units in (("gru_a", ga), ("gru_b", gb)):
            put(name, "kernel", to_keras(p[f"{name}_wx"], units))
            put(name, "recurrent_kernel", to_keras(p[f"{name}_wh"], units))
            put(name, "bias", np.stack([to_keras(p[f"{name}_bx"], units),
                                        to_keras(p[f"{name}_bh"], units)]))

        put("dual_fc", "kernel",
            np.stack([p["fc_out1_w"], p["fc_out2_w"]], axis=-1))
        put("dual_fc", "bias",
            np.stack([p.get("fc_out1_b", np.zeros(MULAW_LEVELS)),
                      p.get("fc_out2_b", np.zeros(MULAW_LEVELS))], axis=-1))
        put("dual_fc", "factor",
            np.stack([p["fc_out1_g"], p["fc_out2_g"]], axis=-1))

        import re

        extra = f.create_group("dss_tpu_extra")
        bunched = re.compile(r"_(l|b)\d+$")
        for key in sorted(p):
            if key in ("emb_pred", "emb_exc", "fc_out_b", "gru_a_mask") \
                    or bunched.search(key):
                extra.create_dataset(key, data=np.asarray(p[key], np.float32))


def reimport_native_h5(path: str):
    """Inverse of :func:`export_lpcnet_h5` for native checkpoints: the
    upstream-layout layers plus the ``dss_tpu_extra`` group reproduce the
    original params exactly."""
    import h5py

    params, model = import_lpcnet_h5(path, strict=False)
    with h5py.File(path, "r") as f:
        if "dss_tpu_extra" in f:
            for key, ds in f["dss_tpu_extra"].items():
                params[key] = np.asarray(ds)
    # Native checkpoints use the outside-bias head; exported zero inner
    # biases are placeholders, dropping them restores the Pallas-eligible
    # native form.
    if "fc_out1_b" in params and not (np.any(params["fc_out1_b"])
                                      or np.any(params["fc_out2_b"])):
        del params["fc_out1_b"]
        del params["fc_out2_b"]
    return params, LPCNetModel.from_params(params)
