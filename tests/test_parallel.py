"""Sharding tests on the virtual 8-device CPU mesh: mesh construction,
dp x tp training steps, and the multi-chip dry run entry point."""

import numpy as np
import pytest

import jax

from dss_tpu.parallel import make_mesh, shard_lstm_params, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8, model_parallel=1)
    assert mesh.shape == {"data": 8, "model": 1}


def test_shard_lstm_params_placement():
    from dss_tpu.models import BidirectionalSpeechSynthesisModel

    mesh = make_mesh(8)
    model = BidirectionalSpeechSynthesisModel(2, 100, 64)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_lstm_params(mesh, params, 100)
    w = sharded["lstm"][0][0]["w_ih"]
    # Gate axis (400) split over 2 model shards.
    assert w.sharding.shard_shape(w.shape) == (200, 64)
    head = sharded["regressor"]["weight"]
    assert head.sharding.shard_shape(head.shape) == head.shape  # replicated


def test_sharded_decoder_train_step():
    from dss_tpu.parallel import sharded_decoder_train_step

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    B, T = 8, 50
    x = rng.normal(size=(B, T, 16)).astype(np.float32)
    y = rng.normal(size=(B, T, 20)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    loss = sharded_decoder_train_step(mesh, x, y, mask, hidden=8)
    assert np.isfinite(float(loss))


def test_sharded_matches_single_device():
    """The sharded decoder forward must equal the single-device forward."""
    from dss_tpu.models import BidirectionalSpeechSynthesisModel

    mesh = make_mesh(8)
    model = BidirectionalSpeechSynthesisModel(1, 8, 6, nb_outputs=4)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 20, 6)).astype(np.float32)

    want, _ = model.apply(params, x)

    with mesh:
        sp = shard_lstm_params(mesh, params, 8)
        xb = shard_batch(mesh, x)
        got, _ = model.apply(sp, xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_forward():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 100, 20)


def test_sharded_batched_vocoder():
    """8 vocoder streams sharded across the mesh's data axis synthesize in
    one SPMD program and match the unsharded result."""
    import jax.numpy as jnp

    from dss_tpu.parallel import batched_vocoder_sharding
    from dss_tpu.vocoder.net import (
        LPCNetModel,
        net_synthesize_frames,
        net_vocoder_init,
    )

    model = LPCNetModel(gru_a_units=16, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(8, 2, 20)) * 0.1, jnp.float32)

    state = net_vocoder_init(model, batch=8)
    want, _ = net_synthesize_frames(model, params, state, feats)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        sstate, sfeats = batched_vocoder_sharding(
            mesh, net_vocoder_init(model, batch=8), np.asarray(feats))
        got, _ = net_synthesize_frames(model, params, sstate, sfeats)

    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape
    assert np.all(np.abs(got) <= 1.0)
    # The autoregressive sampling loop is chaotic: partitioned compilation
    # changes fusion at the FP-noise level and any flipped mu-law sample
    # cascades. Identical keys still keep the overwhelming majority of the
    # trajectory in lockstep; require that rather than bitwise equality.
    agreement = float((np.abs(got - want) < 1e-5).mean())
    assert agreement > 0.6, f"sharded trajectory agreement {agreement:.2f}"


def test_sharded_vad_train_step():
    from dss_tpu.parallel import sharded_vad_train_step

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    B, T = 8, 100
    x = rng.normal(size=(B, T, 16)).astype(np.float32)
    y = (rng.random((B, T)) > 0.5).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    loss = sharded_vad_train_step(mesh, x, y, mask, hidden=8)
    assert np.isfinite(float(loss))


def test_sharded_vocoder_train_step_matches_single_device():
    """Data-parallel vocoder training: replicated params + batch sharded
    over the data axis must produce the same loss and parameters as the
    plain single-device step (GSPMD inserts the gradient psum)."""
    import jax.numpy as jnp

    from dss_tpu.parallel.shard import sharded_vocoder_train_step
    from dss_tpu.train.trainer_vocoder import VocoderTrainer
    from dss_tpu.vocoder.net import LPCNetModel

    model = LPCNetModel()
    trainer = VocoderTrainer(model, learning_rate=1e-3, noise_level=0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, T = 8, 2
    feats = jnp.asarray(rng.normal(size=(B, T, 20)) * 0.1, jnp.float32)
    sig = jnp.asarray(rng.normal(size=(B, T * 160)) * 0.05, jnp.float32)
    key = jax.random.PRNGKey(1)

    _, _, ref_loss = trainer.train_step(params, opt_state, feats, sig, key)
    ref_grad = jax.grad(lambda p: trainer._loss(p, feats, sig, key))(params)

    mesh = make_mesh(8, model_parallel=1)  # pure data parallel
    sh_params, sh_opt, sh_loss = sharded_vocoder_train_step(
        mesh, trainer, params, opt_state, feats, sig, key)
    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-5)
    # The step must actually move the parameters (replicated layout).
    assert not np.allclose(np.asarray(sh_params["gru_b_wx"]),
                           np.asarray(params["gru_b_wx"]))

    # Gradient equivalence under the sharded layout (the psum GSPMD
    # inserts): identical up to cross-shard fp reduction order.  Post-Adam
    # params are NOT compared — the first-step update is sign(grad)-scaled,
    # so reduction noise on near-zero gradients flips update signs.
    from jax.sharding import NamedSharding, PartitionSpec as P

    with mesh:
        pr = jax.tree.map(
            lambda l: jax.device_put(np.asarray(l), NamedSharding(mesh, P())),
            params)
        fb, sb = shard_batch(mesh, feats, sig)
        sh_grad = jax.grad(lambda p: trainer._loss(p, fb, sb, key))(pr)
    np.testing.assert_allclose(np.asarray(sh_grad["gru_a_wh"]),
                               np.asarray(ref_grad["gru_a_wh"]), atol=1e-5)


def test_sharded_batched_vocoder_bunched():
    """The serving shard placement is shape-generic: a bunched model's
    stream state (incl. the [B, S] excitation history) lands on the data
    axis and synthesizes in one SPMD program."""
    import jax.numpy as jnp

    from dss_tpu.parallel import batched_vocoder_sharding
    from dss_tpu.vocoder.net import (
        LPCNetModel,
        net_synthesize_frames,
        net_vocoder_init,
    )

    model = LPCNetModel(gru_a_units=16, gru_b_units=8, cond_dim=8,
                        embed_dim=8, bunch=2)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(8, 2, 20)) * 0.1, jnp.float32)

    state = net_vocoder_init(model, batch=8)
    want, _ = net_synthesize_frames(model, params, state, feats)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        sstate, sfeats = batched_vocoder_sharding(
            mesh, net_vocoder_init(model, batch=8), np.asarray(feats))
        got, _ = net_synthesize_frames(model, params, sstate, sfeats)

    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape
    assert np.all(np.abs(got) <= 1.0)
    agreement = float((np.abs(got - want) < 1e-5).mean())
    assert agreement > 0.6, f"sharded trajectory agreement {agreement:.2f}"
