"""Encoded-at-rest Q6 kernel: exact-int revenue vs the dense-f32 kernel and
a host int64 oracle (kernels/q6.py q6_encoded_chain).

The encoded layout streams 8 bytes/row (int16 date codes, int8 discount
cents, int8 quantity, int32 price cents) vs 17 for dense f32 — the bench.py
headline path. Reference analogue: ValueID-rewritten dictionary scans,
single_column_table_scan_impl.cpp:88-195.
"""

import numpy as np
import jax.numpy as jnp

from hyrise_tpu.kernels.q6 import q6_compute, q6_encoded_chain_jit


def _data(n, seed=0, dead_tail=16):
    rng = np.random.default_rng(seed)
    ship = rng.integers(0, 2557, n).astype(np.int16)
    ship[n - dead_tail:] = -1  # dead rows carry an out-of-range code
    dc = rng.integers(0, 11, n).astype(np.int8)
    qty = rng.integers(1, 51, n).astype(np.int8)
    ec = rng.integers(90_000, 10_495_000, n).astype(np.int32)
    return ship, dc, qty, ec


def test_encoded_matches_host_int64_oracle():
    n = 2048
    ship, dc, qty, ec = _data(n)
    lo, hi = 731, 1096
    m = ((ship >= lo) & (ship < hi) & (dc >= 5) & (dc <= 7) & (qty < 24))
    exact = int((ec[m].astype(np.int64) * dc[m]).sum())
    got = int(q6_encoded_chain_jit(
        jnp.asarray(ship), jnp.asarray(dc), jnp.asarray(qty),
        jnp.asarray(ec), jnp.int32(lo), jnp.int32(hi),
        jnp.int64(1), jnp.int32(1)))
    assert got == exact  # bit-exact: integer arithmetic throughout


def test_encoded_matches_f32_kernel_semantics():
    n = 4096
    ship, dc, qty, ec = _data(n, seed=3)
    lo, hi = 100, 2000
    f32 = float(q6_compute(
        jnp.asarray(ship.astype(np.int32)),
        jnp.asarray(dc.astype(np.float32) / 100),
        jnp.asarray(qty.astype(np.float32)),
        jnp.asarray(ec.astype(np.float32) / 100),
        jnp.asarray(ship >= 0), jnp.int32(lo), jnp.int32(hi)))
    enc = int(q6_encoded_chain_jit(
        jnp.asarray(ship), jnp.asarray(dc), jnp.asarray(qty),
        jnp.asarray(ec), jnp.int32(lo), jnp.int32(hi),
        jnp.int64(1), jnp.int32(1))) * 1e-4
    assert abs(enc - f32) / max(abs(f32), 1.0) < 1e-5


def test_encoded_chain_scales_with_k():
    n = 1024
    ship, dc, qty, ec = _data(n, seed=7)
    args = (jnp.asarray(ship), jnp.asarray(dc), jnp.asarray(qty),
            jnp.asarray(ec), jnp.int32(0), jnp.int32(2557))
    one = int(q6_encoded_chain_jit(*args, jnp.int64(2), jnp.int32(1)))
    k5 = int(q6_encoded_chain_jit(*args, jnp.int64(2), jnp.int32(5)))
    assert 4.0 < k5 / max(one, 1e-9) < 6.0
