"""CAR / bad-channel correction / z-score tests against numpy oracles."""

import jax.numpy as jnp
import numpy as np

from dss_tpu.ops import (
    BadChannelCorrection,
    CommonAverageReferencing,
    ZScoreNormalization,
)
from dss_tpu.utils import default_layout, motor_grid, speech_grid


def test_car_per_grid_mean(rng):
    data = rng.normal(size=(11, 128))
    car = CommonAverageReferencing(
        exclude_channels=[19, 38, 48, 52],
        grids=[speech_grid(), motor_grid()],
        layout=default_layout(),
    )
    out = car(data)

    # Oracle: per grid, mean over non-excluded channels subtracted from all.
    want = data.copy()
    for lo, hi in [(0, 64), (64, 128)]:
        cols = np.arange(lo, hi)
        comp = [c for c in cols if (c + 1) not in (19, 38, 48, 52)]
        mean = data[:, comp].mean(axis=1, keepdims=True)
        want[:, cols] -= mean
    np.testing.assert_allclose(out, want, atol=1e-12)

    # Excluded channels don't contribute to the mean but ARE re-referenced.
    assert not np.allclose(out[:, 18], data[:, 18])

    # JAX path agrees with numpy path.
    out_jax = car(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(out_jax), want, atol=1e-6)


def test_bad_channel_correction_corner_and_interior():
    layout = default_layout()
    grids = [speech_grid(), motor_grid()]
    data = np.arange(128, dtype=np.float64)[None, :].repeat(3, axis=0)

    # Channel 1 sits at grid position (7, 0): neighbors 2, 9, 10.
    corr = BadChannelCorrection(bad_channels=[1], grids=grids, layout=layout)
    out = corr(data)
    np.testing.assert_allclose(out[:, 0], np.mean([1, 8, 9]))  # 0-based values

    # Interior channel 19 at (5,2): 8 neighbors 10,11,12,18,20,26,27,28.
    corr = BadChannelCorrection(bad_channels=[19], grids=grids, layout=layout)
    out = corr(data)
    want = np.mean([9, 10, 11, 17, 19, 25, 26, 27])
    np.testing.assert_allclose(out[:, 18], want)
    assert len(corr) == 1


def test_bad_channels_excluded_from_neighborhoods():
    """A bad channel adjacent to another bad channel must not be used."""
    layout = default_layout()
    grids = [speech_grid(), motor_grid()]
    data = np.arange(128, dtype=np.float64)[None, :]
    corr = BadChannelCorrection(bad_channels=[19, 20], grids=grids, layout=layout)
    out = corr(data)
    # For 19, neighbor 20 is bad -> excluded.
    want_19 = np.mean([9, 10, 11, 17, 25, 26, 27])
    np.testing.assert_allclose(out[:, 18], want_19)


def test_zscore():
    data = np.array([[2.0, 4.0], [4.0, 8.0]])
    z = ZScoreNormalization(np.array([2.0, 4.0]), np.array([2.0, 4.0]))
    np.testing.assert_allclose(z(data), [[0.0, 0.0], [1.0, 1.0]])
