"""Device-resident columns.

TPU-native analogue of the reference's column hierarchy
(reference: src/lib/storage/value_column.hpp:15, dictionary_column.hpp:20-48,
reference_column.hpp:19-51):

- Every column is ONE dense, fixed-capacity device array. There is no
  per-chunk type erasure: the "encoding" decision collapses to a dtype
  decision plus an optional host-side dictionary.
- Strings (reference: FixedStringDictionaryColumn) become order-preserving
  int32 dictionary codes: the dictionary is sorted, so <, <=, ORDER BY and
  range predicates operate directly on codes — the reference's
  "compare ValueIDs, not values" scan trick
  (single_column_table_scan_impl.cpp:88-195) is the default here.
- NULLs: optional boolean validity array (True = valid). The reference's
  optional null vector on ValueColumn (value_column.hpp:67-72) maps 1:1.
- The reference's ReferenceColumn (late materialization via PosList) maps to
  gather-index arrays applied by operators; see ops/materialize.py.

Capacity padding: arrays are padded to a power-of-two bucket
(types.bucket_capacity) so XLA compiles a bounded set of shapes. Tail rows
beyond `num_rows` (held by the owning Table) contain zeros and must be
masked via Table.live_mask().
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.types import DataType, bucket_capacity


def encode_strings(values: np.ndarray, dictionary: Optional[np.ndarray] = None):
    """Encode an object/str numpy array into (codes:int32, dictionary).

    The dictionary is sorted (order-preserving codes). If `dictionary` is
    given, values must all be present in it (used for re-encoding against a
    shared dictionary).  None entries map to code 0 with validity handled by
    the caller.
    """
    vals = np.asarray(values, dtype=object)
    none_mask = np.array([v is None for v in vals], dtype=bool)
    filler = ""
    safe = np.where(none_mask, filler, vals)
    safe = safe.astype(str)
    if dictionary is None:
        dictionary, codes = np.unique(safe, return_inverse=True)
    else:
        codes = np.searchsorted(dictionary, safe)
    codes = codes.astype(np.int32)
    codes[none_mask] = 0
    return codes, dictionary, none_mask


def merge_dictionaries(dict_a: np.ndarray, dict_b: np.ndarray):
    """Merge two sorted string dictionaries.

    Returns (merged, remap_a, remap_b) where remap_x maps old codes to merged
    codes. Used when two STRING columns with different dictionaries meet in a
    comparison, join, or union (host-side; dictionaries are small).
    """
    merged = np.unique(np.concatenate([dict_a, dict_b]))
    remap_a = np.searchsorted(merged, dict_a).astype(np.int32)
    remap_b = np.searchsorted(merged, dict_b).astype(np.int32)
    return merged, remap_a, remap_b


class Column:
    """A named, typed, device-resident column.

    data:      jax.Array of shape (capacity,) — dict codes for STRING.
               May be constructed LAZILY from a zero-arg thunk (late
               materialization, the ReferenceColumn role): the thunk runs on
               first access and the result is cached, so operators that
               gather N columns only pay for the ones actually read.
    validity:  optional jax.Array bool (capacity,), True = valid (not NULL);
               may also be a thunk. None means "no NULLs among live rows".
    dictionary: host numpy array of strings for STRING columns (sorted).
    """

    __slots__ = ("name", "dtype", "_data", "_validity", "dictionary",
                 "_capacity_hint", "encoded", "unique", "val_range")

    def __init__(self, name: str, dtype: DataType, data,
                 validity=None, dictionary: Optional[np.ndarray] = None,
                 capacity_hint: Optional[int] = None, encoded=None,
                 unique: bool = False, val_range=None):
        self.name = name
        self.dtype = dtype
        self._data = data
        self._validity = validity
        self.dictionary = dictionary
        self._capacity_hint = capacity_hint
        # storage/encoding.py: the encoded at-rest representation when this
        # column's dense form is a lazy decode thunk (RLE / FoR / narrow
        # codes); None for plain dense columns
        self.encoded = encoded
        # live values are pairwise distinct (primary keys, single-column
        # group-by outputs). Key-preserving operators (filters, renames,
        # probe-side passthrough of unique-build joins) keep the flag;
        # anything that can duplicate rows drops it. Drives the fused
        # lookup-join path (ops/join.py) — a wrong True produces wrong
        # JOIN results, so only provably-distinct sources set it.
        self.unique = unique
        # host-known (min, max) over live values, set at ingest for integer
        # base columns: sizes the direct-address LUT join without any
        # device reads (plan/compiler._col_bounds)
        self.val_range = val_range

    @property
    def data(self) -> jax.Array:
        if callable(self._data):
            self._data = self._data()
        return self._data

    @property
    def validity(self) -> Optional[jax.Array]:
        if callable(self._validity):
            self._validity = self._validity()
        return self._validity

    @property
    def is_lazy(self) -> bool:
        return callable(self._data) or callable(self._validity)

    @property
    def has_validity(self) -> bool:
        """Whether a validity mask exists, WITHOUT materializing it."""
        return self._validity is not None

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_numpy(
        name: str,
        dtype: DataType,
        values: np.ndarray,
        validity: Optional[np.ndarray] = None,
        dictionary: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
    ) -> "Column":
        n = len(values)
        cap = capacity if capacity is not None else bucket_capacity(n)
        if dtype is DataType.STRING and dictionary is None:
            codes, dictionary, none_mask = encode_strings(values)
            if none_mask.any():
                v = np.ones(n, dtype=bool) if validity is None else validity.copy()
                v[none_mask] = False
                validity = v
            values = codes
        arr = np.zeros(cap, dtype=dtype.numpy_dtype)
        arr[:n] = np.asarray(values, dtype=dtype.numpy_dtype)
        data = jnp.asarray(arr)
        vmask = None
        if validity is not None:
            v = np.zeros(cap, dtype=bool)
            v[:n] = validity
            vmask = jnp.asarray(v)
        vr = None
        if dtype.is_integral and n:
            live_vals = arr[:n] if validity is None \
                else arr[:n][np.asarray(validity, dtype=bool)]
            if len(live_vals):
                vr = (int(live_vals.min()), int(live_vals.max()))
        return Column(name=name, dtype=dtype, data=data, validity=vmask,
                      dictionary=dictionary, val_range=vr)

    # -- accessors -----------------------------------------------------------

    @property
    def capacity(self) -> int:
        if callable(self._data) and self._capacity_hint is not None:
            return self._capacity_hint
        return self.data.shape[0]

    def valid_mask(self) -> jax.Array:
        """Bool array: True where the row is not NULL (tail rows arbitrary)."""
        if self.validity is None:
            return jnp.ones(self.capacity, dtype=bool)
        return self.validity

    def decode(self, num_rows: int) -> np.ndarray:
        """Materialize the first num_rows to host, decoding dictionary codes
        and turning NULLs into None (object array) / NaN (floats)."""
        data = np.asarray(self.data[:num_rows])
        valid = (np.asarray(self.validity[:num_rows])
                 if self.validity is not None else np.ones(num_rows, dtype=bool))
        if self.dtype is DataType.STRING:
            out = np.empty(num_rows, dtype=object)
            decoded = self.dictionary[np.clip(data, 0, len(self.dictionary) - 1)] \
                if len(self.dictionary) else np.array([""] * num_rows, dtype=object)
            out[:] = decoded
            out[~valid] = None
            return out
        if not valid.all():
            out = np.empty(num_rows, dtype=object)
            out[:] = data
            out[~valid] = None
            return out
        return data

    def with_name(self, name: str) -> "Column":
        # shares the (possibly still-unmaterialized) payload; a rename
        # never transforms values, so value metadata survives
        return Column(name, self.dtype, self._data, self._validity,
                      self.dictionary, self._capacity_hint,
                      unique=self.unique, val_range=self.val_range)

    def code_for(self, value: str) -> Optional[int]:
        """Exact dictionary code of a string value, or None if absent."""
        assert self.dtype is DataType.STRING
        idx = int(np.searchsorted(self.dictionary, value))
        if idx < len(self.dictionary) and self.dictionary[idx] == value:
            return idx
        return None

    def lower_bound(self, value: str) -> int:
        """searchsorted-left on the dictionary — the reference's ValueID
        lower_bound (dictionary_column.hpp lower_bound/upper_bound)."""
        assert self.dtype is DataType.STRING
        return int(np.searchsorted(self.dictionary, value, side="left"))

    def upper_bound(self, value: str) -> int:
        assert self.dtype is DataType.STRING
        return int(np.searchsorted(self.dictionary, value, side="right"))
