"""Pallas TPU kernel for the join probe hot path.

The reference's hottest join loop is the per-partition hashtable probe
(join_hash.cpp:363-527). Our engine's probe is two vectorized binary
searches over the sorted build side (ops/join.py); this kernel fuses both
searches into one Pallas pass: the sorted build keys are held in VMEM
(the reference sizes partitions to L2 — join_hash.cpp:654-668 — here the
budget is VMEM), each grid step streams one probe tile from HBM and emits
(lo, hi) range bounds per probe row via a branch-free binary search on the
VPU (Mosaic supports 2D gathers only, so the build side is replicated
across the 8 sublanes and searched with take_along_axis).

Capacity: build sides up to MAX_BUILD keys.

STATUS: algorithmically verified in interpret mode (tests). The current
Mosaic compiler rejects the compiled form ("Not implemented: Multiple
source vregs along gather dimension" — take_along_axis gathers are limited
to one 128-lane vreg), so the production probe path stays on
jnp.searchsorted (XLA's native sort-based lowering) until Mosaic grows
wide-gather support; this kernel is the drop-in replacement for that day.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROBE_SUB = 8
MAX_BUILD = 1 << 13  # 8k keys: Mosaic 2D gather requires index shape ==
                     # operand shape, so the probe tile is sized to the
                     # build side — the small-build (broadcast-join) fast
                     # path, the common case after dimension filters


def _probe_tile_kernel(nbits_ref, build_ref, probe_ref, lo_ref, hi_ref):
    """Branch-free binary search: build_ref (8, size) rows are identical,
    sorted, padded to a power of two with int32 max. For each probe key:
    lo = first index with build >= key, hi = first index with build > key."""
    n_bits = nbits_ref[0, 0]
    probe = probe_ref[...]                      # (8, size)
    build = build_ref[...]                      # (8, size)
    size = build.shape[1]

    def search(side_gt):
        def body(i, pos):
            step = (size >> 1) >> i
            cand = pos + step
            vals = jnp.take_along_axis(
                build, jnp.clip(cand - 1, 0, size - 1), axis=1)
            if side_gt:
                go_right = vals <= probe
            else:
                go_right = vals < probe
            return jnp.where(go_right, cand, pos)

        return jax.lax.fori_loop(0, n_bits, body, jnp.zeros_like(probe))

    lo_ref[...] = search(False)
    hi_ref[...] = search(True)


@partial(jax.jit, static_argnames=("interpret",))
def probe_ranges_pallas(sorted_build: jax.Array, probe: jax.Array,
                        interpret: bool = False):
    """(lo, hi) contiguous match ranges of each probe key in sorted_build.

    sorted_build: int32, sorted ascending, length a power of two <=
    MAX_BUILD, padded with jnp.iinfo(int32).max. probe: int32, length a
    multiple of PROBE_TILE.
    """
    size = sorted_build.shape[0]
    assert 128 <= size <= MAX_BUILD and (size & (size - 1)) == 0, size
    tile = PROBE_SUB * size
    n = probe.shape[0]
    assert n % tile == 0, (n, tile)
    grid = n // tile
    n_bits = max(size.bit_length(), 1)

    build8 = jnp.broadcast_to(sorted_build, (PROBE_SUB, size))

    with jax.enable_x64(False):  # x64 trace mode breaks Mosaic lowering
        probe_spec = pl.BlockSpec((PROBE_SUB, size), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        lo, hi = pl.pallas_call(
            _probe_tile_kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((PROBE_SUB, size), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      probe_spec],
            out_specs=(probe_spec, probe_spec),
            out_shape=(jax.ShapeDtypeStruct((grid * PROBE_SUB, size),
                                            jnp.int32),
                       jax.ShapeDtypeStruct((grid * PROBE_SUB, size),
                                            jnp.int32)),
            interpret=interpret,
        )(jnp.asarray([[n_bits]], dtype=jnp.int32),
          build8,
          probe.reshape(grid * PROBE_SUB, size))
    return lo.reshape(n), hi.reshape(n)
