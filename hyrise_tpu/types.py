"""Core type system.

TPU-native analogue of the reference's type layer
(reference: src/lib/types.hpp, src/lib/all_type_variant.hpp):

- The reference's 5-type `DataType` enum {int, long, float, double, string}
  (all_type_variant.hpp:35-40) maps to `DataType` below; strings are stored
  on device as order-preserving int32 dictionary codes.
- `PredicateCondition` (types.hpp:166) and `JoinMode` (types.hpp:189) are
  kept with identical semantics.
- The reference's RowID{chunk_id, chunk_offset} (types.hpp:97) collapses to a
  flat int32 row index into a partition's padded arrays; a PosList becomes a
  dense int32 index array + a host-known count.
"""

from __future__ import annotations

import enum

import numpy as np


class DataType(enum.Enum):
    INT32 = "int32"
    INT64 = "int64"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    STRING = "string"  # device repr: int32 order-preserving dictionary codes
    NULL = "null"      # type of an untyped NULL literal

    @property
    def numpy_dtype(self) -> np.dtype:
        if self is DataType.STRING:
            return np.dtype(np.int32)  # dictionary codes
        if self is DataType.NULL:
            return np.dtype(np.int32)
        return np.dtype(self.value)

    @property
    def is_floating(self) -> bool:
        return self in (DataType.FLOAT32, DataType.FLOAT64)

    @property
    def is_integral(self) -> bool:
        return self in (DataType.INT32, DataType.INT64)

    @property
    def is_numeric(self) -> bool:
        return self.is_floating or self.is_integral


def common_numeric_type(a: DataType, b: DataType) -> DataType:
    """Numeric type promotion for arithmetic / comparisons (C++-like)."""
    if a is DataType.NULL:
        return b
    if b is DataType.NULL:
        return a
    if not (a.is_numeric and b.is_numeric):
        if a is DataType.STRING and b is DataType.STRING:
            return DataType.STRING
        raise TypeError(f"no common type for {a} and {b}")
    if DataType.FLOAT64 in (a, b):
        return DataType.FLOAT64
    if DataType.FLOAT32 in (a, b):
        # int64 + float32 -> float64 to avoid precision loss (matches C++ rules
        # closely enough; Hyrise promotes via boost::variant arithmetic).
        if DataType.INT64 in (a, b):
            return DataType.FLOAT64
        return DataType.FLOAT32
    if DataType.INT64 in (a, b):
        return DataType.INT64
    return DataType.INT32


class PredicateCondition(enum.Enum):
    """Reference: src/lib/types.hpp:166 (enum class PredicateCondition)."""

    EQUALS = "="
    NOT_EQUALS = "<>"
    LESS_THAN = "<"
    LESS_THAN_EQUALS = "<="
    GREATER_THAN = ">"
    GREATER_THAN_EQUALS = ">="
    BETWEEN = "between"
    IN = "in"
    NOT_IN = "not in"
    LIKE = "like"
    NOT_LIKE = "not like"
    IS_NULL = "is null"
    IS_NOT_NULL = "is not null"

    def flipped(self) -> "PredicateCondition":
        """Condition with operand sides swapped (a ? b  ==  b ?' a)."""
        flip = {
            PredicateCondition.LESS_THAN: PredicateCondition.GREATER_THAN,
            PredicateCondition.LESS_THAN_EQUALS: PredicateCondition.GREATER_THAN_EQUALS,
            PredicateCondition.GREATER_THAN: PredicateCondition.LESS_THAN,
            PredicateCondition.GREATER_THAN_EQUALS: PredicateCondition.LESS_THAN_EQUALS,
        }
        return flip.get(self, self)


class JoinMode(enum.Enum):
    """Reference: src/lib/types.hpp:189 (enum class JoinMode)."""

    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    OUTER = "outer"
    CROSS = "cross"
    SEMI = "semi"
    ANTI = "anti"                          # AntiNullAsFalse (NOT EXISTS)
    ANTI_NULL_AS_TRUE = "anti_null_true"   # NOT IN: NULL key/probe rejects


# existence joins emit a filtered probe side, never build columns
EXISTENCE_MODES = (JoinMode.SEMI, JoinMode.ANTI, JoinMode.ANTI_NULL_AS_TRUE)
ANTI_MODES = (JoinMode.ANTI, JoinMode.ANTI_NULL_AS_TRUE)


class SortMode(enum.Enum):
    """Reference: OrderByMode in src/lib/types.hpp (Ascending/Descending ×
    NullsFirst/NullsLast)."""

    ASCENDING = "asc"               # nulls first (Hyrise default)
    DESCENDING = "desc"             # nulls first
    ASCENDING_NULLS_LAST = "asc_nulls_last"
    DESCENDING_NULLS_LAST = "desc_nulls_last"

    @property
    def ascending(self) -> bool:
        return self in (SortMode.ASCENDING, SortMode.ASCENDING_NULLS_LAST)

    @property
    def nulls_first(self) -> bool:
        return self in (SortMode.ASCENDING, SortMode.DESCENDING)


class AggregateFunction(enum.Enum):
    """Reference: AggregateFunction in src/lib/types.hpp (Min/Max/Sum/Avg/
    Count/CountDistinct, used by operators/aggregate.cpp)."""

    MIN = "min"
    MAX = "max"
    SUM = "sum"
    AVG = "avg"
    COUNT = "count"
    COUNT_DISTINCT = "count_distinct"


def aggregate_result_type(fn: AggregateFunction, input_type: DataType) -> DataType:
    """Result types, following the reference's aggregate_traits
    (src/lib/operators/aggregate/aggregate_traits.hpp): SUM widens integers to
    int64 and floats to their own type (we widen float32 sums to float64 for
    accuracy of the parallel reduction), AVG is always float64, COUNT int64.
    """
    if fn in (AggregateFunction.COUNT, AggregateFunction.COUNT_DISTINCT):
        return DataType.INT64
    if fn is AggregateFunction.AVG:
        return DataType.FLOAT64
    if fn is AggregateFunction.SUM:
        if input_type.is_integral:
            return DataType.INT64
        return DataType.FLOAT64
    # MIN / MAX keep their input type.
    return input_type


# Capacity bucketing ---------------------------------------------------------

# All variable-size device arrays are padded to one of these capacities so the
# set of shapes XLA compiles for stays small. Power-of-two buckets with a
# minimum of one VPU tile row block.
_MIN_CAPACITY = 1024


def bucket_capacity(n: int) -> int:
    """Smallest power-of-two >= n (and >= _MIN_CAPACITY)."""
    cap = _MIN_CAPACITY
    while cap < n:
        cap *= 2
    return cap


NULL_SENTINEL_STRING_CODE = np.int32(-1)
