"""Pallas probe kernel vs jnp.searchsorted (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hyrise_tpu.kernels.pallas_join import PROBE_SUB, probe_ranges_pallas


def test_probe_ranges_matches_searchsorted():
    rng = np.random.default_rng(0)
    size = 1 << 12
    tile = PROBE_SUB * size
    n_valid = 3000
    build = np.full(size, np.iinfo(np.int32).max, dtype=np.int32)
    build[:n_valid] = np.sort(rng.integers(0, 5000, n_valid).astype(np.int32))
    probe = rng.integers(-10, 5200, tile * 2).astype(np.int32)

    lo, hi = probe_ranges_pallas(jnp.asarray(build), jnp.asarray(probe),
                                 interpret=True)
    exp_lo = np.searchsorted(build, probe, side="left")
    exp_hi = np.searchsorted(build, probe, side="right")
    np.testing.assert_array_equal(np.asarray(lo), exp_lo)
    np.testing.assert_array_equal(np.asarray(hi), exp_hi)


def test_probe_ranges_duplicates():
    size = 1 << 10
    tile = PROBE_SUB * size
    build = np.full(size, np.iinfo(np.int32).max, dtype=np.int32)
    build[:6] = [2, 2, 2, 5, 5, 9]
    probe = np.resize(np.array([1, 2, 3, 5, 9, 10], dtype=np.int32),
                      tile)
    lo, hi = probe_ranges_pallas(jnp.asarray(build), jnp.asarray(probe),
                                 interpret=True)
    lo, hi = np.asarray(lo)[:6], np.asarray(hi)[:6]
    assert list(lo) == [0, 0, 3, 3, 5, 6]
    assert list(hi) == [0, 3, 3, 5, 6, 6]
