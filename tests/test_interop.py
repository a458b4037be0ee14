"""xiph-LPCNet weight interop: format round trip + semantics goldens.

The mappings that could silently corrupt an imported model — Keras (z,r,h)
gate order into our (r,z,n), reset_after bias split, MDense inner-bias
head, shared embedding fan-out, pitch-embedding frame net — are each pinned
against an independent numpy implementation of the UPSTREAM semantics.
"""

import os

# Must be set before dss_tpu.ops.pallas.sampler imports (CPU runs the
# kernels through the Pallas interpreter).
os.environ["DSS_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dss_tpu.vocoder.interop import (  # noqa: E402
    export_lpcnet_h5,
    import_lpcnet_h5,
    reimport_native_h5,
)
from dss_tpu.vocoder.lpcnet import LPCNet  # noqa: E402
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

    np.testing.assert_array_equal(params["emb_sig"], params["emb_pred"])
    np.testing.assert_array_equal(params["emb_sig"], params["emb_exc"])

    voc = LPCNet(backend="net", model=model, weights=params)
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


@pytest.mark.parametrize("sparse", [False, True])
def test_foreign_inner_bias_pallas_matches_scan(tmp_path, sparse):
    """An imported xiph-style checkpoint (per-channel dual-FC biases inside
    the tanh) must run the Pallas kernel bit-identically to the scan path —
    the imported-model fast path, dense and tile-sparse."""
    from dss_tpu.ops.pallas.sampler import (
        sampler_frames_pallas,
        tile_sparse_pattern,
    )

    rng = np.random.default_rng(11)
    # gru_a=128 -> wh [128, 384] is tile-divisible; gru_b=16 as upstream.
    path = _foreign_h5(tmp_path, rng, gru_a=128, gru_b=16, cond=16, embed=8)
    params, model = import_lpcnet_h5(path)
    assert "fc_out1_b" in params and np.any(params["fc_out1_b"])
    params = {k: jnp.asarray(v) for k, v in params.items()}

    if sparse:
        keep = np.random.default_rng(12).random((8, 3)) < 0.5
        keep[0, :] = True
        mask = np.repeat(np.repeat(keep.astype(np.float32), 16, 0), 128, 1)
        pattern, kept = tile_sparse_pattern(mask)
        assert pattern is not None and kept < 1.0
        params = dict(params, gru_a_mask=jnp.asarray(mask))
    else:
        pattern = None

    B, T, F = 1, 2, 16
    cond = jnp.asarray(rng.normal(size=(B, T, 16)) * 0.3, jnp.float32)
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)) * 0.05, jnp.float32)
    temp = -jnp.ones((B, T, 1), jnp.float32)  # greedy
    carry0 = (jnp.zeros((B, 128)), jnp.zeros((B, 16)), jnp.zeros((B, 16)),
              jnp.full((B,), 128, jnp.int32))

    def frame_body(carry, frame_in):
        cond_t, lpc_t, temp_t = frame_in

        def step(c, _):
            c, (sample, _, _) = model.sample_step(
                params, c, cond_t, lpc_t,
                jnp.zeros((B, 256), jnp.float32), temp_t)
            return c, sample

        carry, samples = jax.lax.scan(step, carry, jnp.arange(F))
        return carry, samples

    want_carry, want = jax.lax.scan(
        frame_body, carry0,
        (jnp.moveaxis(cond, 1, 0), jnp.moveaxis(lpc, 1, 0),
         jnp.moveaxis(temp, 1, 0)))
    want = np.asarray(jnp.moveaxis(want.reshape(T * F, B), 0, 1))

    got_carry, got = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp,
        seeds=jnp.arange(T, dtype=jnp.int32), frame_size=F,
        stochastic=False, weight_dtype=jnp.float32, sparse_pattern=pattern)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_carry[3]),
                                  np.asarray(want_carry[3]))


def test_bunched_inner_bias_pallas_matches_scan():
    """Defensive coverage: inner dual-FC biases on bunched heads (head 0
    and sub-heads) flow through the bunched kernel identically to scan."""
    from dss_tpu.ops.pallas.sampler import sampler_frames_bunched_pallas
    from dss_tpu.vocoder.net import FRAME_SIZE

    rng = np.random.default_rng(13)
    S = 2
    model = LPCNetModel(bunch=S)
    params = model.init(jax.random.PRNGKey(0))
    params = dict(
        params,
        fc_out1_b=jnp.asarray(rng.normal(size=256) * 0.3, jnp.float32),
        fc_out2_b=jnp.asarray(rng.normal(size=256) * 0.3, jnp.float32),
        fc_out1_b_b1=jnp.asarray(rng.normal(size=256) * 0.3, jnp.float32),
        fc_out2_b_b1=jnp.asarray(rng.normal(size=256) * 0.3, jnp.float32),
    )

    B, T = 1, 2
    cond = jnp.asarray(rng.normal(size=(B, T, 128)) * 0.1, jnp.float32)
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)) * 0.01, jnp.float32)
    temp = jnp.full((B, T, 1), -1.0, jnp.float32)
    carry = (jnp.zeros((B, 384)), jnp.zeros((B, 32)), jnp.zeros((B, 16)),
             jnp.full((B, S), 128, jnp.int32))

    gum = jnp.zeros((B, S, 256))
    outs = []
    c = carry
    for t in range(T):
        def step(cc, _):
            cc, (smp, _) = model.bunch_step(params, cc, cond[:, t],
                                            lpc[:, t], gum, temp[:, t])
            return cc, smp

        c, smp = jax.lax.scan(step, c, jnp.arange(FRAME_SIZE // S))
        outs.append(np.asarray(smp).transpose(1, 0, 2).reshape(B, -1))
    ref = np.concatenate(outs, axis=1)

    _, got = sampler_frames_bunched_pallas(
        model, params, carry, cond, lpc, temp,
        seeds=jnp.arange(T, dtype=jnp.int32), frame_size=FRAME_SIZE,
        stochastic=False, weight_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


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
