"""Scale-up configuration tests (BASELINE.json config 5): 256-channel ECoG,
2x-width decoder, 8 concurrent streams — correctness on CPU, throughput is
bench.py's job."""

import numpy as np

import jax
import jax.numpy as jnp

from dss_tpu.models import (
    BidirectionalSpeechSynthesisModel,
    UnidirectionalVoiceActivityDetector,
)
from dss_tpu.ops import HighGammaExtractor


def test_multi_stream_frontend_matches_single(rng):
    """vmapped 8-stream packet step == 8 independent single-stream steps."""
    streams, channels = 8, 256
    ex = HighGammaExtractor(fs=1000, nb_electrodes=channels)
    packets = rng.normal(size=(streams, 40, channels)).astype(np.float32)

    fe_state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (streams,) + l.shape), ex.init_state()
    )
    feats_multi, _ = jax.jit(
        jax.vmap(lambda s, p: ex.packet_step(s, p))
    )(fe_state, jnp.asarray(packets))

    for s in range(0, streams, 3):
        feats_one, _ = ex.packet_step(ex.init_state(),
                                      jnp.asarray(packets[s]))
        np.testing.assert_allclose(np.asarray(feats_multi[s]),
                                   np.asarray(feats_one), atol=1e-5)


def test_wide_decoder_batched_streams(rng):
    """2x-width decoder on 8 concurrent segments produces per-stream results
    identical to separate runs."""
    model = BidirectionalSpeechSynthesisModel(2, 200, 256)
    params = model.init(jax.random.PRNGKey(0))
    x = rng.normal(size=(8, 30, 256)).astype(np.float32)

    batch_out, _ = model.apply(params, jnp.asarray(x))
    one_out, _ = model.apply(params, jnp.asarray(x[3:4]))
    np.testing.assert_allclose(np.asarray(batch_out[3]),
                               np.asarray(one_out[0]), atol=2e-4)
    assert batch_out.shape == (8, 30, 20)


def test_wide_vad_param_scaling():
    vad = UnidirectionalVoiceActivityDetector(2, 300, 256)
    params = vad.init(jax.random.PRNGKey(0))
    n = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    assert n > 1_000_000  # ~2x-width config is materially larger
