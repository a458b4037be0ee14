"""xiph-LPCNet weight interop: format round trip + semantics goldens.

The mappings that could silently corrupt an imported model — Keras (z,r,h)
gate order into our (r,z,n), reset_after bias split, MDense inner-bias
head, shared embedding fan-out, pitch-embedding frame net — are each pinned
against an independent numpy implementation of the UPSTREAM semantics.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dss_tpu.vocoder.interop import (  # noqa: E402
    export_lpcnet_h5,
    import_lpcnet_h5,
    reimport_native_h5,
)
from dss_tpu.vocoder.lpcnet import LPCNet, params_require_scan  # noqa: E402
from dss_tpu.vocoder.net import LPCNetModel  # noqa: E402


def _small_model(bunch=1):
    return LPCNetModel(gru_a_units=32, gru_b_units=8, cond_dim=16,
                       embed_dim=8, bunch=bunch)


def test_native_roundtrip_exact(tmp_path):
    model = _small_model()
    params = {k: np.asarray(v)
              for k, v in model.init(jax.random.PRNGKey(0)).items()}
    path = str(tmp_path / "native.h5")
    export_lpcnet_h5(params, path)
    back, model2 = reimport_native_h5(path)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), params[k],
                                      err_msg=k)
    assert model2.gru_a_units == model.gru_a_units
    assert model2.bunch == 1


def test_native_roundtrip_bunched(tmp_path):
    model = _small_model(bunch=2)
    params = {k: np.asarray(v)
              for k, v in model.init(jax.random.PRNGKey(1)).items()}
    path = str(tmp_path / "native_b2.h5")
    export_lpcnet_h5(params, path)
    back, model2 = reimport_native_h5(path)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), params[k],
                                      err_msg=k)
    assert model2.bunch == 2


def _keras_gru_step(x, h, kernel, rec_kernel, bias):
    """Upstream semantics: Keras reset_after GRU, gate order (z, r, h)."""
    units = h.shape[-1]
    gx = x @ kernel + bias[0]
    gh = h @ rec_kernel + bias[1]
    z = 1 / (1 + np.exp(-(gx[:, :units] + gh[:, :units])))
    r = 1 / (1 + np.exp(-(gx[:, units:2 * units] + gh[:, units:2 * units])))
    hh = np.tanh(gx[:, 2 * units:] + r * gh[:, 2 * units:])
    return z * h + (1 - z) * hh


def test_gru_gate_mapping_matches_keras_semantics():
    from dss_tpu.vocoder.interop import _reorder_gates

    rng = np.random.default_rng(0)
    units, din, B = 8, 12, 3
    kernel = rng.normal(size=(din, 3 * units)).astype(np.float32)
    rec = rng.normal(size=(units, 3 * units)).astype(np.float32)
    bias = rng.normal(size=(2, 3 * units)).astype(np.float32)
    x = rng.normal(size=(B, din)).astype(np.float32)
    h = rng.normal(size=(B, units)).astype(np.float32)

    want = _keras_gru_step(x, h, kernel, rec, bias)

    model = _small_model()
    got = model._gru(jnp.asarray(x), jnp.asarray(h),
                     jnp.asarray(_reorder_gates(kernel, units)),
                     jnp.asarray(_reorder_gates(rec, units)),
                     jnp.asarray(_reorder_gates(bias[0], units)),
                     jnp.asarray(_reorder_gates(bias[1], units)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _mdense_forward(x, kernel, bias, factor):
    """Upstream MDense: sum over 2 channels of tanh(x@K_c + b_c) * f_c."""
    out = 0.0
    for c in range(kernel.shape[-1]):
        out = out + np.tanh(x @ kernel[:, :, c] + bias[:, c]) * factor[:, c]
    return out


def _foreign_h5(tmp_path, rng, gru_a=32, gru_b=8, cond=16, embed=8,
                pitch_dim=4):
    """A synthetic checkpoint in the upstream Keras layout."""
    import h5py

    path = str(tmp_path / "foreign.h5")
    r = lambda *s: (rng.normal(size=s) * 0.3).astype(np.float32)
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def put(layer, kind, arr):
            g = mw.require_group(layer).require_group(layer)
            g.create_dataset(f"{kind}:0", data=arr)

        put("embed_sig", "embeddings", r(256, embed))
        put("embed_pitch", "embeddings", r(256, pitch_dim))
        put("feature_conv1", "kernel", r(3, 20 + pitch_dim, cond))
        put("feature_conv1", "bias", r(cond))
        put("feature_conv2", "kernel", r(3, cond, cond))
        put("feature_conv2", "bias", r(cond))
        put("feature_dense1", "kernel", r(cond, cond))
        put("feature_dense1", "bias", r(cond))
        put("feature_dense2", "kernel", r(cond, cond))
        put("feature_dense2", "bias", r(cond))
        put("gru_a", "kernel", r(3 * embed + cond, 3 * gru_a))
        put("gru_a", "recurrent_kernel", r(gru_a, 3 * gru_a))
        put("gru_a", "bias", r(2, 3 * gru_a))
        put("gru_b", "kernel", r(gru_a + cond, 3 * gru_b))
        put("gru_b", "recurrent_kernel", r(gru_b, 3 * gru_b))
        put("gru_b", "bias", r(2, 3 * gru_b))
        put("dual_fc", "kernel", r(gru_b, 256, 2))
        put("dual_fc", "bias", r(256, 2))
        put("dual_fc", "factor", r(256, 2))
    return path


def test_foreign_import_synthesizes(tmp_path):
    rng = np.random.default_rng(2)
    path = _foreign_h5(tmp_path, rng)
    params, model = import_lpcnet_h5(path)

    assert params_require_scan(params)  # inner-bias head -> scan path
    np.testing.assert_array_equal(params["emb_sig"], params["emb_pred"])
    np.testing.assert_array_equal(params["emb_sig"], params["emb_exc"])

    voc = LPCNet(backend="net", model=model, weights=params)
    assert voc.use_pallas is False
    feats = (rng.normal(size=(4, 20)) * 0.1).astype(np.float32)
    feats[:, 18] = 0.2  # period ~ 110 samples
    pcm = voc.synthesize_frames(feats)
    assert pcm.shape == (4 * 160,)
    assert np.isfinite(pcm).all()


def test_foreign_pitch_embedding_conditions_frame_net(tmp_path):
    rng = np.random.default_rng(3)
    path = _foreign_h5(tmp_path, rng)
    params, model = import_lpcnet_h5(path)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    feats = jnp.asarray((rng.normal(size=(1, 3, 20)) * 0.1), jnp.float32)
    c1 = model.condition(params, feats.at[..., 18].set(0.0))   # period 100
    c2 = model.condition(params, feats.at[..., 18].set(2.0))   # period 200
    assert float(jnp.abs(c1 - c2).max()) > 1e-4  # table actually consulted


def test_mdense_mapping_matches_upstream(tmp_path):
    import h5py

    rng = np.random.default_rng(4)
    path = _foreign_h5(tmp_path, rng)
    params, model = import_lpcnet_h5(path)
    with h5py.File(path, "r") as f:
        g = f["model_weights"]["dual_fc"]["dual_fc"]
        kernel = np.asarray(g["kernel:0"])
        bias = np.asarray(g["bias:0"])
        factor = np.asarray(g["factor:0"])

    x = rng.normal(size=(5, kernel.shape[0])).astype(np.float32)
    want = _mdense_forward(x, kernel, bias, factor)
    got = model.sample_logits({k: jnp.asarray(v) for k, v in params.items()},
                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_foreign_reexport_roundtrip(tmp_path):
    """Foreign import -> export -> import is the identity (the h5 container
    is a faithful interchange format in both directions)."""
    rng = np.random.default_rng(5)
    path = _foreign_h5(tmp_path, rng)
    params, model = import_lpcnet_h5(path)
    path2 = str(tmp_path / "reexport.h5")
    export_lpcnet_h5(params, path2)
    back, _ = reimport_native_h5(path2)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(params[k]), err_msg=k)
