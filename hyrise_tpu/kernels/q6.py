"""Standalone fused Q6 kernel — the flagship single-chip program.

One XLA program: 4-predicate scan + masked product-sum over lineitem
(BASELINE config 1). Dates are dictionary codes, so date range predicates are
integer compares (the reference's ValueID rewrite). Kept free of engine
types so __graft_entry__ and bench.py can feed raw arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def q6_compute(shipdate_codes: jax.Array,   # int32 dictionary codes
               discount: jax.Array,         # float32
               quantity: jax.Array,         # float32
               extendedprice: jax.Array,    # float32
               live: jax.Array,             # bool
               date_lo: jax.Array,          # int32 scalar: code('1994-01-01')
               date_hi: jax.Array,          # int32 scalar: code('1995-01-01')
               ) -> jax.Array:
    mask = (live
            & (shipdate_codes >= date_lo)
            & (shipdate_codes < date_hi)
            & (discount >= jnp.float32(0.05))
            & (discount <= jnp.float32(0.07001))
            & (quantity < jnp.float32(24.0)))
    rev = extendedprice * discount
    masked = jnp.where(mask, rev, jnp.float32(0.0))
    # Blocked accumulation: float64 is software-emulated on TPU, so keep the
    # streaming pass in f32 (full HBM bandwidth) and pay f64 only for the
    # tiny cross-block reduction. Error: <= 512 f32 adds per block.
    block = 512
    n = masked.shape[0]
    pad = (-n) % block
    if pad:
        masked = jnp.pad(masked, (0, pad))
    partials = jnp.sum(masked.reshape(-1, block), axis=1)
    return jnp.sum(partials.astype(jnp.float64))


q6_jit = jax.jit(q6_compute)


def q6_chain(shipdate_codes, discount, quantity, extendedprice, live,
             date_lo, date_hi, salt, k):
    """Run the Q6 body k times sequentially inside ONE program, with a data
    dependence between iterations so XLA cannot hoist the body, and a runtime
    `salt` input so identical calls cannot be result-cached by the transport.

    Timing protocol (bench.py): the per-query device time is
    (t(k=K) - t(k=1)) / (K - 1) with a forced host read of the result after
    each call — robust against transport round-trip latency, pipelining, and
    caching.
    """

    def body(i, acc):
        # Every column read must feed an iteration-dependent computation,
        # otherwise XLA hoists the invariant sub-expressions out of the loop
        # and the chain under-counts the per-query work.
        bit = acc.astype(jnp.int64).astype(jnp.int32) & 1
        bitf = bit.astype(jnp.float32)
        lo = date_lo + bit
        mask = (live
                & (shipdate_codes >= lo)
                & (shipdate_codes < date_hi)
                & (discount >= jnp.float32(0.05) + bitf * jnp.float32(1e-9))
                & (discount <= jnp.float32(0.07001))
                & (quantity < jnp.float32(24.0) + bitf))
        rev = extendedprice * (discount + bitf * jnp.float32(1e-12))
        masked = jnp.where(mask, rev, jnp.float32(0.0))
        partials = jnp.sum(masked.reshape(-1, 512), axis=1)
        r = jnp.sum(partials.astype(jnp.float64))
        return acc + r

    # salt is runtime data >= 0, so minimum(salt, 0) == 0, but the compiler
    # must keep it -> distinct argument values defeat result caching.
    # k is a RUNTIME loop bound: one compilation serves every chain length.
    init = jnp.float64(jnp.minimum(salt, 0))
    return jax.lax.fori_loop(0, k, body, init)


q6_chain_jit = jax.jit(q6_chain)


def q6_encoded_chain(shipdate_codes,  # int16 dict codes; tail padded with -1
                     discount_cents,  # int8: discount * 100 (0..10)
                     quantity,        # int8: integral quantity value (1..50)
                     eprice_cents,    # int32: extendedprice * 100
                     date_lo, date_hi,  # int32 scalars (code space)
                     salt, k):
    """Q6 over the engine's encoded-at-rest column formats (storage/encoding.py
    narrow-dtype + decimal-scale codes): 8 bytes/row streamed from HBM vs 17
    for the dense-f32 layout, and the revenue sum is EXACT integer arithmetic
    (eprice_cents * discount_cents fits int32; block sums accumulate in int64;
    /10^4 applied once at the end in float64).

    The reference's ValueID-rewrite idea (single_column_table_scan_impl.cpp:
    88-195, compare codes not values) extends here to every Q6 column: all
    four predicates are small-int compares, no decode step exists at all.
    Dead tail rows carry shipdate code -1, so no separate live mask is read.

    Same chain/salt timing protocol as q6_chain.
    """

    def body(i, acc):
        bit = (acc & 1).astype(jnp.int32)
        lo = (date_lo + bit).astype(jnp.int16)
        hi = date_hi.astype(jnp.int16)
        mask = ((shipdate_codes >= lo)
                & (shipdate_codes < hi)
                & (discount_cents >= jnp.int8(5) + bit.astype(jnp.int8))
                & (discount_cents <= jnp.int8(7))
                & (quantity < jnp.int8(24)))
        # per-row product fits int32: eprice_cents <= ~1.05e7, cents <= 7
        prod = eprice_cents * discount_cents.astype(jnp.int32)
        masked = jnp.where(mask, prod, jnp.int32(0))
        # 512-row blocks summed in int64. (Two-level int32-then-int64 was
        # tried and is 11x SLOWER: a 16-wide minor-axis reduce breaks the
        # (8,128) lane tiling and forces a relayout; the emulated-int64
        # block sum on 512-wide lanes measures 466GB/s = 57% SoL.)
        partials = jnp.sum(masked.reshape(-1, 512).astype(jnp.int64), axis=1)
        return acc + jnp.sum(partials)

    init = jnp.int64(jnp.minimum(salt, 0))
    # returns the EXACT int64 total in (cents x cents); the 1e-4 decimal
    # scale is applied host-side — the TPU's software-emulated float64
    # multiply rounds differently from IEEE, so keeping the device result
    # integral makes the kernel bit-exact by construction
    return jax.lax.fori_loop(0, k, body, init)


q6_encoded_chain_jit = jax.jit(q6_encoded_chain)
