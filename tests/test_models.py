"""Model tests: torch weight-port parity, state carrying, shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dss_tpu.models import (
    BidirectionalSpeechSynthesisModel,
    UnidirectionalVoiceActivityDetector,
    from_torch_state_dict,
    to_torch_state_dict,
)

torch = pytest.importorskip("torch")


class _TorchVAD(torch.nn.Module):
    def __init__(self, nb_layer=2, nb_hidden_units=16, nb_electrodes=8):
        super().__init__()
        self.lstm = torch.nn.LSTM(nb_electrodes, nb_hidden_units, nb_layer,
                                  batch_first=True)
        self.classifier = torch.nn.Linear(nb_hidden_units, 2)

    def forward(self, x, state):
        y, new_state = self.lstm(x, state)
        return self.classifier(y), new_state


class _TorchDecoder(torch.nn.Module):
    def __init__(self, nb_layer=2, nb_hidden_units=12, nb_electrodes=8):
        super().__init__()
        self.lstm = torch.nn.LSTM(nb_electrodes, nb_hidden_units, nb_layer,
                                  batch_first=True, bidirectional=True)
        self.regressor = torch.nn.Linear(2 * nb_hidden_units, 20)

    def forward(self, x, state):
        y, new_state = self.lstm(x, state)
        return self.regressor(y), new_state


def test_vad_matches_torch(rng):
    tm = _TorchVAD().eval()
    model = UnidirectionalVoiceActivityDetector(2, 16, 8)
    params = from_torch_state_dict(tm.state_dict(), 2, False, "classifier")

    x = rng.normal(size=(3, 17, 8)).astype(np.float32)
    h0 = torch.zeros(2, 3, 16)
    with torch.no_grad():
        want, (h_want, c_want) = tm(torch.from_numpy(x), (h0, h0))

    got, (h, c) = model.apply(params, jnp.asarray(x))
    # XLA's approximate transcendentals (tanh/sigmoid) deviate from libm by
    # ~1e-6 per step and amplify through the recurrence; torch matches f64
    # to 1e-7. 5e-3 bounds the accumulated gap over these sequence lengths.
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(h), h_want.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(c), c_want.numpy(), atol=5e-3)


def test_decoder_matches_torch(rng):
    tm = _TorchDecoder().eval()
    model = BidirectionalSpeechSynthesisModel(2, 12, 8)
    params = from_torch_state_dict(tm.state_dict(), 2, True, "regressor")

    x = rng.normal(size=(2, 23, 8)).astype(np.float32)
    h0 = torch.zeros(4, 2, 12)
    with torch.no_grad():
        want, (h_want, c_want) = tm(torch.from_numpy(x), (h0, h0))

    got, (h, c) = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(h), h_want.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(c), c_want.numpy(), atol=5e-3)


def test_vad_streaming_state_carry(rng):
    """Chunked inference with carried state == full-sequence inference —
    the contract the online FilterSpeechSegments unit relies on."""
    model = UnidirectionalVoiceActivityDetector(2, 16, 8)
    params = model.init(jax.random.PRNGKey(0))
    x = rng.normal(size=(1, 40, 8)).astype(np.float32)

    full, _ = model.apply(params, jnp.asarray(x))

    state = model.create_new_initial_state(1)
    outs = []
    for s in range(0, 40, 4):
        y, state = model.apply(params, jnp.asarray(x[:, s:s + 4]), state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(full), atol=1e-5)


def test_roundtrip_state_dict():
    model = BidirectionalSpeechSynthesisModel(2, 12, 8)
    params = model.init(jax.random.PRNGKey(1))
    sd = to_torch_state_dict(params, "regressor")
    back = from_torch_state_dict(sd, 2, True, "regressor")
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_counts_match_deployed_config():
    """Deployed sizes from the reference logs: nVAD ~311k params (150 hidden,
    64 in), decoder ~378k (100 hidden bi, 20 out)."""
    vad = UnidirectionalVoiceActivityDetector(2, 150, 64)
    dec = BidirectionalSpeechSynthesisModel(2, 100, 64)
    n_vad = sum(np.asarray(p).size for p in jax.tree.leaves(vad.init(jax.random.PRNGKey(0))))
    n_dec = sum(np.asarray(p).size for p in jax.tree.leaves(dec.init(jax.random.PRNGKey(0))))
    # torch equivalents
    tm_vad = torch.nn.ModuleDict({
        "lstm": torch.nn.LSTM(64, 150, 2, batch_first=True),
        "classifier": torch.nn.Linear(150, 2),
    })
    tm_dec = torch.nn.ModuleDict({
        "lstm": torch.nn.LSTM(64, 100, 2, batch_first=True, bidirectional=True),
        "regressor": torch.nn.Linear(200, 20),
    })
    assert n_vad == sum(p.numel() for p in tm_vad.parameters())
    assert n_dec == sum(p.numel() for p in tm_dec.parameters())
