"""Pallas TPU kernels for the scan hot path.

The reference's hottest scan loop (SingleColumnTableScanImpl's typed inner
loop, single_column_table_scan_impl.cpp:38-61) becomes a Pallas grid over
row tiles: each grid step streams one VMEM tile of each predicate column
from HBM, evaluates the fused predicate + product on the VPU, and writes one
partial-sum tile — one HBM pass, no intermediate materialization.

`q6_pallas` is the Pallas twin of kernels/q6.q6_compute; tests compare both
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: 64 sublanes x 1024 lanes (x4 columns x4B = 1MB of
# VMEM tiles per step)
TILE_SUB = 64
TILE_LANE = 1024
TILE_ROWS = TILE_SUB * TILE_LANE


def _q6_scan_tile_kernel_v2(lo_ref, hi_ref, ship_ref, disc_ref, qty_ref, price_ref,
                    live_ref, out_ref):
    lo = lo_ref[0, 0]
    hi = hi_ref[0, 0]
    ship = ship_ref[...]
    disc = disc_ref[...]
    qty = qty_ref[...]
    price = price_ref[...]
    live = live_ref[...] != 0
    mask = (live & (ship >= lo) & (ship < hi)
            & (disc >= jnp.float32(0.05)) & (disc <= jnp.float32(0.07001))
            & (qty < jnp.float32(24.0)))
    prod = jnp.where(mask, price * disc, jnp.float32(0.0))
    # scalar reduction; the whole (grid, 1) output is the block (TPU grid
    # steps run sequentially), each step writes its own slot
    out_ref[pl.program_id(0), 0] = jnp.sum(prod)


@partial(jax.jit, static_argnames=("interpret",))
def q6_pallas(shipdate_codes, discount, quantity, extendedprice, live,
              date_lo, date_hi, interpret: bool = False):
    """Fused Q6 over 1-D columns (length must be a multiple of TILE_ROWS —
    capacities are power-of-two >= 2^16 at bench scale)."""
    n = shipdate_codes.shape[0]
    assert n % TILE_ROWS == 0, n
    grid = n // TILE_ROWS

    def reshape(a):
        return a.reshape(grid * TILE_SUB, TILE_LANE)

    tile_spec = pl.BlockSpec((TILE_SUB, TILE_LANE),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)

    # The engine runs with jax_enable_x64=True, but x64 trace mode breaks
    # Mosaic lowering (int64 leaks into index maps -> "failed to legalize
    # func.return"); trace the kernel under x32. All operands are
    # int32/f32/int8, so numerics are unchanged.
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _q6_scan_tile_kernel_v2,
            grid=(grid,),
            in_specs=[scalar_spec, scalar_spec, tile_spec, tile_spec,
                      tile_spec, tile_spec, tile_spec],
            out_specs=pl.BlockSpec((grid, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 1), jnp.float32),
            interpret=interpret,
        )(jnp.asarray([[date_lo]], dtype=jnp.int32),
          jnp.asarray([[date_hi]], dtype=jnp.int32),
          reshape(shipdate_codes), reshape(discount), reshape(quantity),
          reshape(extendedprice), reshape(live.astype(jnp.int8)))
    return jnp.sum(partials.astype(jnp.float64))


@partial(jax.jit, static_argnames=("interpret",))
def q6_pallas_chain(shipdate_codes, discount, quantity, extendedprice, live,
                    date_lo, date_hi, salt, k, interpret: bool = False):
    """k sequential Q6 Pallas executions with a data dependence between
    iterations — the same hoist-proof differenced-chain protocol as
    kernels/q6.q6_chain, for honest Pallas-vs-XLA timing on the tunnel.

    The iteration carry is an int32 LCG seeded from each iteration's data
    sum, so the kernel's scalar input (date_lo + bit) GENUINELY varies per
    iteration and every call is serially data-dependent on the previous
    one. The first version derived bit from an f32 accumulator whose
    magnitude (~4.5e8) made the low bit identically 0 — every call was
    runtime-identical and the measured slope (0.111 ms/iter = 1287 GB/s)
    exceeded the v5e HBM roofline by 57%; with a real dependence the same
    kernel measures ~0.19 ms/iter = ~90% of speed-of-light (r3 verdict
    weak #5: the impossible number was a degenerate-chain artifact, not
    transport caching)."""
    n = shipdate_codes.shape[0]
    assert n % TILE_ROWS == 0, n
    grid = n // TILE_ROWS

    def reshape(a):
        return a.reshape(grid * TILE_SUB, TILE_LANE)

    tile_spec = pl.BlockSpec((TILE_SUB, TILE_LANE),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    ship2, disc2, qty2, price2 = (reshape(a) for a in
                                  (shipdate_codes, discount, quantity,
                                   extendedprice))
    live2 = reshape(live.astype(jnp.int8))

    with jax.enable_x64(False):
        def body(i, carry):
            acc, lfsr = carry
            bit = lfsr & jnp.int32(1)
            partials = pl.pallas_call(
                _q6_scan_tile_kernel_v2,
                grid=(grid,),
                in_specs=[scalar_spec, scalar_spec, tile_spec, tile_spec,
                          tile_spec, tile_spec, tile_spec],
                out_specs=pl.BlockSpec((grid, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((grid, 1), jnp.float32),
                interpret=interpret,
            )(jnp.reshape(jnp.asarray(date_lo, jnp.int32) + bit, (1, 1)),
              jnp.reshape(jnp.asarray(date_hi, jnp.int32), (1, 1)),
              ship2, disc2, qty2, price2, live2)
            s = jnp.sum(partials)
            # data-dependent LCG step: the next call's scalar depends on
            # THIS call's full reduction — hoist- and elision-proof
            lfsr = (lfsr * jnp.int32(1103515245) + jnp.int32(12345)
                    + s.astype(jnp.int32))
            return acc + s, lfsr

        init = (jnp.float32(jnp.minimum(salt, 0)),
                jnp.asarray(salt, jnp.int32))
        acc, _ = jax.lax.fori_loop(0, jnp.asarray(k, jnp.int32), body, init)
        return acc
