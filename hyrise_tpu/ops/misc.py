"""Small operators: Limit, UnionAll, UnionPositions, Difference, Alias.

Reference: src/lib/operators/{limit,union_all,union_positions,difference,
alias_operator}.cpp.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.column import Column, merge_dictionaries
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, bucket_capacity


class Limit(AbstractOperator):
    """Reference: limit.cpp (expression-valued row limit)."""

    name = "Limit"

    def __init__(self, input_op: AbstractOperator, n: int):
        super().__init__(input_op)
        self.n = int(n)

    def _on_execute(self, context) -> Table:
        t = self.input_table(0)
        n = (min(t.num_rows, self.n) if isinstance(t.num_rows, int)
             else jnp.minimum(t.num_rows, self.n))
        if t.live is not None:
            # masked layout: keep the first n live rows in the mask (MXU
            # prefix count — flat cumsum at table scale wrecks the remote
            # TPU compile, tpu_prims module header)
            from hyrise_tpu.kernels.tpu_prims import prefix_count_mxu
            live = t.live & (prefix_count_mxu(t.live) <= self.n)
            return Table(t.columns, n, name=t.name, live=live)
        return Table(t.columns, n, name=t.name)


class Alias(AbstractOperator):
    """Reference: alias_operator.cpp — reorder/rename output columns."""

    name = "Alias"

    def __init__(self, input_op: AbstractOperator, names: Sequence[str],
                 sources: Optional[Sequence[str]] = None):
        super().__init__(input_op)
        self.names = list(names)
        self.sources = list(sources) if sources is not None else None

    def _on_execute(self, context) -> Table:
        t = self.input_table(0)
        if self.sources is None:
            assert len(self.names) == len(t.columns)
            cols = [c.with_name(n) for c, n in zip(t.columns, self.names)]
        else:
            cols = [t.column(s).with_name(n)
                    for s, n in zip(self.sources, self.names)]
        return Table(cols, t.num_rows, name=t.name, live=t.live)


def _align_columns(a: Column, b: Column):
    """Make two columns concatenable: common dtype, merged dictionary."""
    if (a.dtype is DataType.STRING) != (b.dtype is DataType.STRING):
        raise TypeError("cannot union string with non-string")
    if a.dtype is DataType.STRING:
        if a.dictionary is b.dictionary or np.array_equal(a.dictionary, b.dictionary):
            return a, b, a.dictionary
        merged, ra, rb = merge_dictionaries(a.dictionary, b.dictionary)
        da = jnp.asarray(ra)[a.data]
        db = jnp.asarray(rb)[b.data]
        return (Column(a.name, a.dtype, da, a.validity, merged),
                Column(b.name, b.dtype, db, b.validity, merged), merged)
    if a.dtype != b.dtype:
        from hyrise_tpu.types import common_numeric_type
        dt = common_numeric_type(a.dtype, b.dtype)
        a = Column(a.name, dt, a.data.astype(dt.numpy_dtype), a.validity, None)
        b = Column(b.name, dt, b.data.astype(dt.numpy_dtype), b.validity, None)
    return a, b, None


class UnionAll(AbstractOperator):
    """Reference: union_all.cpp — concatenates the chunks of both inputs."""

    name = "UnionAll"

    def _on_execute(self, context) -> Table:
        from hyrise_tpu.ops.materialize import ensure_prefix
        from hyrise_tpu.plan.compiler import oracle_capacity
        lt, rt = self.input_table(0), self.input_table(1)
        lt, rt = ensure_prefix(lt), ensure_prefix(rt)
        assert len(lt.columns) == len(rt.columns)
        n, cap = oracle_capacity(
            jnp.asarray(lt.num_rows) + jnp.asarray(rt.num_rows),
            bound=lt.capacity + rt.capacity, label="union_all")
        # traceable concatenation: out[i] = left[i] if i < n_left else
        # right[i - n_left] (dynamic slice assignment would need host counts)
        idx = jnp.arange(cap)
        nl = jnp.asarray(lt.num_rows)
        from_left = idx < nl
        li = jnp.clip(idx, 0, lt.capacity - 1)
        ri = jnp.clip(idx - nl, 0, rt.capacity - 1)
        cols: List[Column] = []
        for ca, cb in zip(lt.columns, rt.columns):
            ca, cb, merged = _align_columns(ca, cb)
            data = jnp.where(from_left, jnp.take(ca.data, li, axis=0),
                             jnp.take(cb.data, ri, axis=0))
            if ca.validity is not None or cb.validity is not None:
                va = ca.validity if ca.validity is not None \
                    else jnp.ones(lt.capacity, dtype=bool)
                vb = cb.validity if cb.validity is not None \
                    else jnp.ones(rt.capacity, dtype=bool)
                v = jnp.where(from_left, jnp.take(va, li, axis=0),
                              jnp.take(vb, ri, axis=0))
            else:
                v = None
            cols.append(Column(ca.name, ca.dtype, data, v, merged if merged
                               is not None else ca.dictionary))
        return Table(cols, n, name=lt.name)


class UnionPositions(AbstractOperator):
    """Reference: union_positions.cpp — set union (dedup) of two same-schema
    inputs; realized as concat + DISTINCT over all columns."""

    name = "UnionPositions"

    def _on_execute(self, context) -> Table:
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.base import execute_plan
        from hyrise_tpu.ops.get_table import TableWrapper
        concat = UnionAll(self.inputs[0], self.inputs[1])
        concat.execute(context)
        t = concat.get_output()
        return execute_plan(Aggregate(TableWrapper(t), t.column_names, []),
                            context)


class Difference(AbstractOperator):
    """Reference: difference.cpp — rows of left not present in right (set
    difference by full-row equality, realized via multi-column ANTI logic:
    concatenate row-keys with a sort-based membership test)."""

    name = "Difference"

    def _on_execute(self, context) -> Table:
        from hyrise_tpu.ops.join import _build_side, _probe_ranges
        from hyrise_tpu.ops.materialize import filter_table
        from hyrise_tpu.types import PredicateCondition

        lt, rt = self.input_table(0), self.input_table(1)
        assert len(lt.columns) == len(rt.columns)
        # Align dictionaries/dtypes pairwise so codes are comparable, then
        # hash whole rows into one 64-bit key per side (the reference
        # concatenates the row as strings, difference.cpp).
        l_cols, r_cols = [], []
        for ca, cb in zip(lt.columns, rt.columns):
            ca, cb, _ = _align_columns(ca, cb)
            l_cols.append(ca)
            r_cols.append(cb)
        lk = _row_hash(Table(l_cols, lt.num_rows))
        rk = _row_hash(Table(r_cols, rt.num_rows))
        sorted_keys, perm, n_valid = _build_side(rk, rt.live_mask())
        lo, counts = _probe_ranges(sorted_keys, n_valid, lk, lt.live_mask(),
                                   PredicateCondition.EQUALS)
        return filter_table(lt, counts == 0)


def _row_hash(t: Table) -> jnp.ndarray:
    h = jnp.zeros(t.capacity, dtype=jnp.uint64)
    for c in t.columns:
        v = c.data
        if v.dtype.kind == "f":
            # exact triple-f32 decomposition: f64 = hi + mid + lo with each
            # part exactly representable in f32 (53 <= 3*24 mantissa bits),
            # so equal floats hash equal and distinct floats give distinct
            # triples. Only 32-bit bitcasts are used — the TPU compile
            # helper dies on ANY bitcast_convert involving 64-bit floats
            # (its X64-rewrite pass lacks f64 bitcast-convert; probed:
            # f64->i64 and f64->2xi32 both exit 1) and on jnp.frexp.
            #
            # The split is only exact when the value's exponent lies in
            # ~[-96, 127] (hi must be finite, lo must not hit f32's
            # subnormal floor). Values outside f32's range would otherwise
            # collapse (all |v|>3.4e38 -> (inf,-inf,nan)); so first rescale
            # by a per-band power of two (exact multiplication) chosen from
            # the value's approximate log2, and mix the band index into the
            # hash. Distinct f64s land either in different bands or in
            # distinct triples within a band; equal values always take the
            # same (deterministic) band.
            f = v.astype(jnp.float64)
            a = jnp.abs(f)
            e = jnp.log2(jnp.where(a > 0, a, 1.0))
            band = jnp.clip(jnp.floor((e + 1100.0) / 180.0),
                            0.0, 11.0).astype(jnp.int32)
            # scale = 2^(1020 - 180*band): maps band b's exponent range
            # [180b-1100, 180b-920) into [-80, 100) — all exponents at
            # which the triple split is exact. Built bit-by-bit from the
            # band index with exact power-of-two factors; every
            # intermediate stays within f64's exponent range (worst case
            # band 11: 2^1020 -> 2^840 -> 2^480 -> 2^-240 -> 2^-960).
            scale = jnp.float64(2.0) ** 1020
            scale = jnp.where(band & 1 == 1, scale * jnp.float64(2.0) ** -180,
                              scale)
            scale = jnp.where(band & 2 == 2, scale * jnp.float64(2.0) ** -360,
                              scale)
            scale = jnp.where(band & 4 == 4, scale * jnp.float64(2.0) ** -720,
                              scale)
            scale = jnp.where(band & 8 == 8,
                              scale * jnp.float64(2.0) ** -720
                              * jnp.float64(2.0) ** -720, scale)
            w = f * scale
            hi = w.astype(jnp.float32)
            r1 = w - hi.astype(jnp.float64)
            mid = r1.astype(jnp.float32)
            lo = (r1 - mid.astype(jnp.float64)).astype(jnp.float32)

            def b32(x):
                return jax.lax.bitcast_convert_type(x, jnp.int32) \
                    .astype(jnp.uint32).astype(jnp.uint64)

            v = (b32(hi) * jnp.uint64(0x100000001B3)
                 + b32(mid) * jnp.uint64(0x9E3779B97F4A7C15)
                 + b32(lo)
                 + band.astype(jnp.uint64) * jnp.uint64(0xC2B2AE3D27D4EB4F))
        else:
            v = v.astype(jnp.uint64)
        if c.validity is not None:
            v = jnp.where(c.validity, v, jnp.uint64(0x9E3779B97F4A7C15))
        h = h * jnp.uint64(1099511628211) + v + jnp.uint64(1)
    return h.astype(jnp.int64)
