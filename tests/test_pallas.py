"""Pallas kernel tests (run through the interpreter on CPU).

Must set DSS_PALLAS_INTERPRET before the kernels import, hence the env
mutation at module import time.
"""

import os

os.environ["DSS_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_log_power_pallas_matches_xla(rng):
    from dss_tpu.ops import log_power_frames

    data = jnp.asarray(rng.normal(size=(437, 8)), jnp.float32)
    want = np.asarray(log_power_frames(data, 1000, 0.05, 0.01))
    got = np.asarray(log_power_frames(data, 1000, 0.05, 0.01, use_pallas=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_log_power_pallas_many_windows(rng):
    """More windows than one tile (exercises the grid + padding path)."""
    from dss_tpu.ops import log_power_frames

    data = jnp.asarray(rng.normal(size=(3010, 4)), jnp.float32)
    want = np.asarray(log_power_frames(data, 1000, 0.05, 0.01))
    got = np.asarray(log_power_frames(data, 1000, 0.05, 0.01, use_pallas=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sampler_greedy_matches_jax_scan(rng):
    """Greedy (temperature < 0) synthesis must match the lax.scan sampler
    sample-for-sample — the two paths implement the same network."""
    from dss_tpu.ops.pallas.sampler import sampler_frames_pallas
    from dss_tpu.vocoder.net import LPCNetModel

    # Tiny model + short frames keep the interpreter fast.
    model = LPCNetModel(gru_a_units=16, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(0))

    B, T, F = 2, 3, 16  # frame_size=16 samples for test speed
    cond = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32) * 0.5
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32) * 0.05
    temp = -jnp.ones((B, T, 1), jnp.float32)

    h_a = jnp.zeros((B, 16))
    h_b = jnp.zeros((B, 8))
    sig_mem = jnp.zeros((B, 16))
    exc = jnp.full((B,), 128, jnp.int32)

    # Reference: jax scan path, greedy.
    def frame_body(carry, frame_in):
        cond_t, lpc_t, temp_t = frame_in

        def step(c, _):
            c, (sample, _, _) = model.sample_step(
                params, c, cond_t, lpc_t,
                jnp.zeros((B, 256), jnp.float32), temp_t)
            return c, sample

        carry, samples = jax.lax.scan(step, carry, jnp.arange(F))
        return carry, samples

    carry0 = (h_a, h_b, sig_mem, exc)
    want_carry, want = jax.lax.scan(
        frame_body, carry0,
        (jnp.moveaxis(cond, 1, 0), jnp.moveaxis(lpc, 1, 0),
         jnp.moveaxis(temp, 1, 0)),
    )
    want = np.asarray(jnp.moveaxis(want.reshape(T * F, B), 0, 1))

    got_carry, got = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp,
        seeds=jnp.arange(T, dtype=jnp.int32), frame_size=F,
        stochastic=False,  # the CPU interpreter lacks the TPU PRNG
        weight_dtype=jnp.float32,  # bitwise comparison vs the f32 scan
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_carry[0]),
                               np.asarray(want_carry[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_carry[2]),
                               np.asarray(want_carry[2]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_carry[3]),
                                  np.asarray(want_carry[3]))


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="TPU PRNG has no CPU-interpreter implementation")
def test_sampler_stochastic_is_plausible(rng):
    """Stochastic sampling produces in-range, non-constant output."""
    from dss_tpu.ops.pallas.sampler import sampler_frames_pallas
    from dss_tpu.vocoder.net import LPCNetModel

    model = LPCNetModel(gru_a_units=16, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(0))
    B, T, F = 2, 2, 16
    cond = jnp.zeros((B, T, 8), jnp.float32)
    lpc = jnp.zeros((B, T, 16), jnp.float32)
    temp = jnp.ones((B, T, 1), jnp.float32)
    carry0 = (jnp.zeros((B, 16)), jnp.zeros((B, 8)), jnp.zeros((B, 16)),
              jnp.full((B,), 128, jnp.int32))
    _, sig = sampler_frames_pallas(model, params, carry0, cond, lpc, temp,
                                   seeds=jnp.arange(T, dtype=jnp.int32),
                                   frame_size=F)
    sig = np.asarray(sig)
    assert sig.shape == (B, T * F)
    assert np.all(np.abs(sig) <= 1.0)
    assert np.std(sig) > 0.0


def test_sampler_sparse_matches_dense(rng):
    """Tile-sparse GRU-A compute (static keep-pattern + compacted slab)
    must reproduce the dense masked path sample-for-sample."""
    from dss_tpu.ops.pallas.sampler import (
        sampler_frames_pallas,
        tile_sparse_pattern,
    )
    from dss_tpu.vocoder.net import LPCNetModel

    # gru_a=128 -> wh [128, 384]: 8 row blocks x 3 col groups of 128.
    model = LPCNetModel(gru_a_units=128, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(1))

    # Prune ~half the [16, 128] tiles.
    keep = rng.random((8, 3)) < 0.5
    keep[0, :] = True  # keep at least one block per group
    mask = np.repeat(np.repeat(keep.astype(np.float32), 16, axis=0),
                     128, axis=1)
    params = dict(params, gru_a_mask=jnp.asarray(mask))

    pattern, kept = tile_sparse_pattern(mask)
    assert pattern is not None and 0.0 < kept < 1.0
    assert all(len(g) >= 1 for g in pattern)

    B, T, F = 2, 2, 8
    cond = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32) * 0.5
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32) * 0.05
    temp = -jnp.ones((B, T, 1), jnp.float32)
    carry0 = (jnp.zeros((B, 128)), jnp.zeros((B, 8)), jnp.zeros((B, 16)),
              jnp.full((B,), 128, jnp.int32))
    kw = dict(seeds=jnp.arange(T, dtype=jnp.int32), frame_size=F,
              stochastic=False, weight_dtype=jnp.float32)

    dense_carry, dense = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp, **kw)
    sparse_carry, sparse = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp, sparse_pattern=pattern, **kw)

    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse_carry[0]),
                               np.asarray(dense_carry[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sparse_carry[3]),
                                  np.asarray(dense_carry[3]))


def test_sampler_prerec_matches_default(rng):
    """pre_rec reorders the recurrent projections onto the loop carry but
    computes the identical dots — greedy output must match exactly, dense
    and tile-sparse."""
    from dss_tpu.ops.pallas.sampler import (
        sampler_frames_pallas,
        tile_sparse_pattern,
    )
    from dss_tpu.vocoder.net import LPCNetModel

    model = LPCNetModel(gru_a_units=128, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(2))
    keep = rng.random((8, 3)) < 0.5
    keep[0, :] = True
    mask = np.repeat(np.repeat(keep.astype(np.float32), 16, axis=0),
                     128, axis=1)
    params = dict(params, gru_a_mask=jnp.asarray(mask))
    pattern, _ = tile_sparse_pattern(mask)

    B, T, F = 2, 2, 8
    cond = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32) * 0.5
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32) * 0.05
    temp = -jnp.ones((B, T, 1), jnp.float32)
    carry0 = (jnp.zeros((B, 128)), jnp.zeros((B, 8)), jnp.zeros((B, 16)),
              jnp.full((B,), 128, jnp.int32))
    kw = dict(seeds=jnp.arange(T, dtype=jnp.int32), frame_size=F,
              stochastic=False, weight_dtype=jnp.float32)

    for pat in (None, pattern):
        base_carry, base = sampler_frames_pallas(
            model, params, carry0, cond, lpc, temp, sparse_pattern=pat, **kw)
        pr_carry, pr = sampler_frames_pallas(
            model, params, carry0, cond, lpc, temp, sparse_pattern=pat,
            pre_rec=True, **kw)
        np.testing.assert_array_equal(np.asarray(pr), np.asarray(base))
        np.testing.assert_array_equal(np.asarray(pr_carry[0]),
                                      np.asarray(base_carry[0]))
        np.testing.assert_array_equal(np.asarray(pr_carry[3]),
                                      np.asarray(base_carry[3]))


def test_argmax_packed_matches_argmax(rng):
    """The single-reduction packed argmax must agree with jnp.argmax on
    generic scores; on exact ties it breaks toward the HIGHEST lane (the
    documented deviation, measure-zero under Gumbel noise)."""
    from dss_tpu.ops.pallas.sampler import _argmax_packed

    for _ in range(20):
        s = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32) * 5 - 2)
        np.testing.assert_array_equal(
            np.asarray(_argmax_packed(s))[:, 0],
            np.asarray(jnp.argmax(s, axis=1)))
    # Edge cases: monotone ramps and the all-equal tie.
    ramp = jnp.asarray(np.linspace(-100, 100, 256, np.float32)[None])
    assert int(_argmax_packed(ramp)[0, 0]) == 255
    assert int(_argmax_packed(-ramp)[0, 0]) == 0
    assert int(_argmax_packed(jnp.full((1, 256), -3.0))[0, 0]) == 255


def test_tile_sparse_pattern_edges():
    from dss_tpu.ops.pallas.sampler import tile_sparse_pattern

    # All-ones mask -> dense (no pattern).
    assert tile_sparse_pattern(np.ones((128, 384))) == (None, 1.0)
    # Non-tile-divisible mask -> dense.
    assert tile_sparse_pattern(np.ones((16, 48))) == (None, 1.0)
    # One zero tile is detected.
    m = np.ones((128, 384), np.float32)
    m[:16, :128] = 0.0
    pattern, kept = tile_sparse_pattern(m)
    assert pattern is not None and abs(kept - 23 / 24) < 1e-6
    assert 0 not in pattern[0] and 0 in pattern[1]


def test_sampler_vpu_emb_bit_identical(rng):
    """The VPU masked-sublane-sum embedding gather (default) is
    bit-identical to the MXU one-hot dot it replaced: both sum the same
    picked rows plus exact zeros."""
    from dss_tpu.ops.pallas.sampler import (
        sampler_frames_pallas,
        tile_sparse_pattern,
    )
    from dss_tpu.vocoder.net import LPCNetModel

    model = LPCNetModel(gru_a_units=128, gru_b_units=8, cond_dim=8,
                        embed_dim=8)
    params = model.init(jax.random.PRNGKey(2))
    keep = rng.random((8, 3)) < 0.5
    keep[0, :] = True
    mask = np.repeat(np.repeat(keep.astype(np.float32), 16, axis=0),
                     128, axis=1)
    params = dict(params, gru_a_mask=jnp.asarray(mask))
    pattern, _ = tile_sparse_pattern(mask)

    B, T, F = 1, 2, 8
    cond = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32) * 0.5
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32) * 0.05
    temp = -jnp.ones((B, T, 1), jnp.float32)
    carry0 = (jnp.zeros((B, 128)), jnp.zeros((B, 8)), jnp.zeros((B, 16)),
              jnp.full((B,), 128, jnp.int32))
    kw = dict(seeds=jnp.arange(T, dtype=jnp.int32), frame_size=F,
              stochastic=False, weight_dtype=jnp.float32,
              sparse_pattern=pattern)

    _, vpu = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp, vpu_emb=True, **kw)
    _, mxu = sampler_frames_pallas(
        model, params, carry0, cond, lpc, temp, vpu_emb=False, **kw)
    assert np.array_equal(np.asarray(vpu), np.asarray(mxu))
