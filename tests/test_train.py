"""Trainer tests: torch-matched RMSprop, TBPTT step, decoder step,
mask-exactness of padded training, best-model checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dss_tpu.models import (
    BidirectionalSpeechSynthesisModel,
    UnidirectionalVoiceActivityDetector,
)
from dss_tpu.train import StoreBestModel, torch_rmsprop
from dss_tpu.train.trainer_decoder import DecoderTrainer, masked_mse
from dss_tpu.train.trainer_vad import VadTrainer, masked_cross_entropy


def test_rmsprop_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.1, -0.2, 0.3], np.float32),
             np.array([-0.05, 0.1, 0.2], np.float32)]

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.RMSprop([p], lr=1e-2)
    for g in grads:
        p.grad = torch.tensor(g)
        opt.step()
    want = p.detach().numpy()

    tx = torch_rmsprop(1e-2)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), want, atol=1e-6)


def test_masked_losses():
    logits = jnp.asarray([[[2.0, 0.0], [0.0, 2.0], [5.0, 5.0]]])
    labels = jnp.asarray([[0.0, 1.0, 0.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    loss = masked_cross_entropy(logits, labels, mask)
    want = -np.log(np.exp(2) / (np.exp(2) + 1))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    pred = jnp.ones((1, 3, 2))
    target = jnp.zeros((1, 3, 2))
    m = jnp.asarray([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(masked_mse(pred, target, m)), 1.0)


def test_vad_tbptt_reduces_loss(rng):
    model = UnidirectionalVoiceActivityDetector(1, 8, 4)
    trainer = VadTrainer(model, learning_rate=1e-2, chunk=10)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    x = rng.normal(size=(30, 4)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float32)
    xp, yp, m = trainer.pad_trial(x, y)

    loss0, *_ = trainer.evaluate(params, xp, yp, m)
    key = jax.random.PRNGKey(1)
    for _ in range(20):
        key, dk = jax.random.split(key)
        params, opt_state, _ = trainer.tbptt_trial(params, opt_state,
                                                   xp, yp, m, dk)
    loss1, *_ = trainer.evaluate(params, xp, yp, m)
    assert float(loss1) < float(loss0)


def test_decoder_padding_is_exact(rng):
    """Masked bidirectional inference on a padded batch == unpadded."""
    model = BidirectionalSpeechSynthesisModel(1, 6, 4, nb_outputs=3)
    trainer = DecoderTrainer(model, length_multiple=10)
    params, _ = trainer.init(jax.random.PRNGKey(0))

    x = rng.normal(size=(17, 4)).astype(np.float32)
    unpadded = np.asarray(trainer.predict(params, x[None]))[0]

    xp = np.zeros((1, 20, 4), np.float32)
    xp[0, :17] = x
    m = np.zeros((1, 20), np.float32)
    m[0, :17] = 1.0
    padded = np.asarray(trainer.predict(params, xp, m))[0, :17]
    np.testing.assert_allclose(padded, unpadded, atol=1e-5)


def test_decoder_train_step_reduces_loss(rng):
    model = BidirectionalSpeechSynthesisModel(1, 6, 4, nb_outputs=3)
    trainer = DecoderTrainer(model, length_multiple=10)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    x = rng.normal(size=(20, 4)).astype(np.float32)
    y = rng.normal(size=(20, 3)).astype(np.float32) * 0.1
    xp, yp, m = trainer.pad_trial(x, y)
    loss0 = float(trainer.evaluate(params, xp, yp, m))
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, dk = jax.random.split(key)
        params, opt_state, _ = trainer.train_step(params, opt_state,
                                                  xp, yp, m, dk)
    assert float(trainer.evaluate(params, xp, yp, m)) < loss0


def test_store_best_model(tmp_path):
    model = UnidirectionalVoiceActivityDetector(1, 4, 2)
    params = model.init(jax.random.PRNGKey(0))
    fn = tmp_path / "best.npz"
    store = StoreBestModel(str(fn), head_name="classifier")
    assert store.update(params, validation_acc=0.5)
    assert not store.update(params, validation_acc=0.4)
    assert store.update(params, validation_acc=0.6)
    with pytest.raises(ValueError):
        store.update(params, validation_acc=0.5, validation_loss=0.5)

    # Round-trips through the torch-layout npz.
    from dss_tpu.models import load_checkpoint

    loaded = load_checkpoint(str(fn), 1, False, "classifier")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip(tmp_path, rng):
    from dss_tpu.train import load_train_state, save_train_state

    model = UnidirectionalVoiceActivityDetector(1, 8, 4)
    trainer = VadTrainer(model, learning_rate=1e-2, chunk=10)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    x = rng.normal(size=(20, 4)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float32)
    xp, yp, m = trainer.pad_trial(x, y)
    params, opt_state, _ = trainer.tbptt_trial(params, opt_state, xp, yp, m,
                                               jax.random.PRNGKey(1))

    fn = tmp_path / "train_state.pkl"
    save_train_state(str(fn), params, opt_state, extra={"epoch": 3})
    p2, o2, extra = load_train_state(str(fn))
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Resumed state continues training identically.
    r1 = trainer.tbptt_trial(params, opt_state, xp, yp, m,
                             jax.random.PRNGKey(2))
    r2 = trainer.tbptt_trial(p2, o2, xp, yp, m, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(r1[2]), float(r2[2]), rtol=1e-6)
