"""Pallas kernel tests (interpret mode on CPU) against the jnp reference."""

import numpy as np
import jax.numpy as jnp

from hyrise_tpu.kernels.pallas_scan import TILE_ROWS, q6_pallas
from hyrise_tpu.kernels.q6 import q6_compute


def test_q6_pallas_matches_jnp():
    rng = np.random.default_rng(0)
    n = TILE_ROWS * 4
    ship = jnp.asarray(rng.integers(0, 2557, n).astype(np.int32))
    disc = jnp.asarray((rng.integers(0, 11, n) / 100).astype(np.float32))
    qty = jnp.asarray(rng.integers(1, 51, n).astype(np.float32))
    price = jnp.asarray((rng.random(n) * 1e5).astype(np.float32))
    live = jnp.asarray(np.arange(n) < n - 100)
    lo, hi = jnp.int32(731), jnp.int32(1096)

    ref = float(q6_compute(ship, disc, qty, price, live, lo, hi))
    got = float(q6_pallas(ship, disc, qty, price, live, lo, hi,
                          interpret=True))
    assert abs(got - ref) / max(abs(ref), 1) < 1e-5


def test_q6_pallas_chain_matches_single():
    from hyrise_tpu.kernels.pallas_scan import q6_pallas_chain

    rng = np.random.default_rng(1)
    n = TILE_ROWS * 2
    ship = jnp.asarray(rng.integers(0, 2557, n).astype(np.int32))
    disc = jnp.asarray((rng.integers(0, 11, n) / 100).astype(np.float32))
    qty = jnp.asarray(rng.integers(1, 51, n).astype(np.float32))
    price = jnp.asarray((rng.random(n) * 1e5).astype(np.float32))
    live = jnp.asarray(np.arange(n) < n - 7)
    lo, hi = jnp.int32(731), jnp.int32(1096)

    single = float(q6_pallas(ship, disc, qty, price, live, lo, hi,
                             interpret=True))
    # salt=0 -> even acc -> bit perturbation 0 on the first iteration
    one = float(q6_pallas_chain(ship, disc, qty, price, live, lo, hi,
                                jnp.int32(0), jnp.int32(1), interpret=True))
    assert abs(one - single) / max(abs(single), 1) < 1e-5
    # k iterations really run k times (values differ by the perturbation
    # but the magnitude must scale with k)
    k5 = float(q6_pallas_chain(ship, disc, qty, price, live, lo, hi,
                               jnp.int32(0), jnp.int32(5), interpret=True))
    assert 4.0 < k5 / max(single, 1e-9) < 6.0
