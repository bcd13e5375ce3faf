"""Column encodings.

Reference: src/lib/storage/ encodings —
- DictionaryColumn / FixedStringDictionaryColumn: our STRING columns are
  always dictionary-coded (storage/column.py), so those two are the default.
- Vector compression (vector_compression/): fixed-size byte-aligned 1/2/4B
  codes and SIMD-BP128 bit packing. TPU equivalent: narrow device dtypes —
  `compress_attribute_vector` stores int8/int16 when the value range fits
  (BP128's sub-byte packing buys little on TPU, where int8 is the minimum
  vectorizable width).
- RunLengthColumn (run_length_column.hpp:29): (values, end_positions) pairs
  with a vectorized device decode (searchsorted expansion).
- FrameOfReferenceColumn (frame_of_reference_column.hpp:33): per-block frame
  + narrow offsets, decode = frame[block] + offset.

Encoded forms are storage-side representations; scans consume the dense
form (decode-to-dense normal form, SURVEY.md §2.1 "column iterables" note).
`ChunkEncoder.encode_column` mirrors encoding_type.hpp's EncodingType.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.storage.column import Column
from hyrise_tpu.types import DataType


class EncodingType(enum.Enum):
    """Reference: storage/encoding_type.hpp:20."""

    UNENCODED = "unencoded"
    DICTIONARY = "dictionary"
    RUN_LENGTH = "run_length"
    FIXED_STRING_DICTIONARY = "fixed_string_dictionary"
    FRAME_OF_REFERENCE = "frame_of_reference"


# -- narrow attribute vectors (fixed-size byte-aligned analogue) -------------


def compress_attribute_vector(data: np.ndarray) -> np.ndarray:
    """Store integer codes in the narrowest vectorizable dtype."""
    if data.dtype.kind not in "iu" or data.size == 0:
        return data
    lo, hi = int(data.min()), int(data.max())
    for dt in (np.int8, np.int16, np.int32):
        info = np.iinfo(dt)
        if info.min <= lo and hi <= info.max:
            return data.astype(dt)
    return data.astype(np.int64)


# -- run-length --------------------------------------------------------------


@dataclasses.dataclass
class RunLengthColumn:
    """values[i] spans rows [end_positions[i-1], end_positions[i])."""

    values: jax.Array
    end_positions: jax.Array  # int32, cumulative, last == num_rows
    num_rows: int

    def memory_rows(self) -> int:
        return self.values.shape[0]


def run_length_encode(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    if len(data) == 0:
        return data, np.zeros(0, dtype=np.int32)
    change = np.concatenate([[True], data[1:] != data[:-1]])
    values = data[change]
    starts = np.nonzero(change)[0]
    ends = np.concatenate([starts[1:], [len(data)]]).astype(np.int32)
    return values, ends


def run_length_decode(rle: RunLengthColumn) -> jax.Array:
    """Vectorized device decode: row r's value index =
    searchsorted(end_positions, r, 'right')."""
    rows = jnp.arange(rle.num_rows, dtype=jnp.int32)
    idx = jnp.searchsorted(rle.end_positions, rows, side="right")
    idx = jnp.clip(idx, 0, rle.values.shape[0] - 1)
    return jnp.take(rle.values, idx, axis=0)


# -- frame of reference ------------------------------------------------------

FOR_BLOCK = 2048  # reference: frame_of_reference_column.hpp block_size=2048


@dataclasses.dataclass
class FrameOfReferenceColumn:
    frames: jax.Array    # per-block minimum, original dtype
    offsets: jax.Array   # narrow unsigned offsets
    num_rows: int


def frame_of_reference_encode(data: np.ndarray) -> FrameOfReferenceColumn:
    n = len(data)
    n_blocks = max((n + FOR_BLOCK - 1) // FOR_BLOCK, 1)
    padded = np.zeros(n_blocks * FOR_BLOCK, dtype=data.dtype)
    padded[:n] = data
    if n:
        padded[n:] = data[-1] if n else 0
    blocks = padded.reshape(n_blocks, FOR_BLOCK)
    frames = blocks.min(axis=1)
    offsets = (blocks - frames[:, None])
    offsets = compress_attribute_vector(offsets.astype(np.int64).reshape(-1))
    return FrameOfReferenceColumn(jnp.asarray(frames), jnp.asarray(offsets), n)


def frame_of_reference_decode(forc: FrameOfReferenceColumn) -> jax.Array:
    off = forc.offsets.reshape(-1, FOR_BLOCK)
    dense = forc.frames[:, None] + off.astype(forc.frames.dtype)
    return dense.reshape(-1)[:forc.num_rows]


# -- encoded at-rest payloads -------------------------------------------------


@dataclasses.dataclass
class NarrowCodes:
    """Dictionary codes (string code space or a numeric dictionary) stored in
    the narrowest dtype — the fixed-size byte-aligned vector compression of
    the reference (vector_compression/fixed_size_byte_aligned/*)."""

    codes: jax.Array                      # int8/int16/int32
    dictionary: Optional[jax.Array]       # numeric dictionary or None

    def memory_bytes(self) -> int:
        n = self.codes.size * self.codes.dtype.itemsize
        if self.dictionary is not None:
            n += self.dictionary.size * self.dictionary.dtype.itemsize
        return n


# -- chunk encoder -----------------------------------------------------------


class ChunkEncoder:
    """Reference: storage/chunk_encoder.hpp:20-40 — re-encode columns with a
    per-column spec.

    Every encoding returns a regular Column whose at-rest device storage is
    the encoded form and whose dense form is a LAZY decode thunk (the
    decode-to-dense normal form of SURVEY §2.1): operators are encoding-
    oblivious, the encoded arrays are what lives in HBM until first touch,
    and the reference's per-encoding column iterables collapse into one
    vectorized decode kernel per encoding."""

    @staticmethod
    def encode_column(column: Column, encoding: EncodingType) -> Column:
        if encoding is EncodingType.UNENCODED:
            return column
        cap = column.capacity
        host = np.asarray(column.data)
        out_dtype = column.dtype.numpy_dtype

        if encoding in (EncodingType.DICTIONARY,
                        EncodingType.FIXED_STRING_DICTIONARY):
            if column.dtype is DataType.STRING:
                # already dictionary codes: narrow the attribute vector
                enc = NarrowCodes(jnp.asarray(compress_attribute_vector(host)),
                                  None)
            else:
                dictionary, codes = np.unique(host, return_inverse=True)
                enc = NarrowCodes(
                    jnp.asarray(compress_attribute_vector(codes.astype(np.int64))),
                    jnp.asarray(dictionary))

            def decode(e=enc, dt=out_dtype):
                codes = e.codes.astype(jnp.int32)
                if e.dictionary is None:
                    return codes
                return jnp.take(e.dictionary, codes, axis=0).astype(dt)

            return Column(column.name, column.dtype, decode, column.validity,
                          column.dictionary, capacity_hint=cap, encoded=enc)

        if encoding is EncodingType.RUN_LENGTH:
            values, ends = run_length_encode(host)
            enc = RunLengthColumn(jnp.asarray(values), jnp.asarray(ends), cap)
            return Column(column.name, column.dtype,
                          lambda e=enc: run_length_decode(e), column.validity,
                          column.dictionary, capacity_hint=cap, encoded=enc)

        if encoding is EncodingType.FRAME_OF_REFERENCE:
            assert column.dtype.is_integral, \
                "FrameOfReference requires an integral column"
            enc = frame_of_reference_encode(host)
            return Column(column.name, column.dtype,
                          lambda e=enc: frame_of_reference_decode(e)
                          .astype(out_dtype), column.validity,
                          column.dictionary, capacity_hint=cap, encoded=enc)
        raise ValueError(encoding)

    @staticmethod
    def encode_table(table, spec) -> "Table":
        """Re-encode a table's columns. `spec` is an EncodingType applied to
        every compatible column, or a {column_name: EncodingType} dict
        (reference: ChunkEncoder::encode_chunks with a ColumnEncodingSpec
        per column)."""
        from hyrise_tpu.storage.table import Table
        cols = []
        for c in table.columns:
            enc = spec.get(c.name) if isinstance(spec, dict) else spec
            if enc is None:
                cols.append(c)
                continue
            if enc is EncodingType.FRAME_OF_REFERENCE and \
                    not c.dtype.is_integral and c.dtype is not DataType.STRING:
                cols.append(c)  # FoR only applies to integral data
                continue
            if enc is EncodingType.FRAME_OF_REFERENCE and \
                    c.dtype is DataType.STRING:
                # string codes are integral: FoR the code vector
                host = np.asarray(c.data)
                payload = frame_of_reference_encode(host.astype(np.int64))
                cols.append(Column(
                    c.name, c.dtype,
                    lambda e=payload: frame_of_reference_decode(e)
                    .astype(jnp.int32), c.validity, c.dictionary,
                    capacity_hint=c.capacity, encoded=payload))
                continue
            cols.append(ChunkEncoder.encode_column(c, enc))
        t = Table(cols, table.num_rows, name=table.name)
        t.mvcc = table.mvcc
        # remembered at-rest spec: tasks.ChunkCompressionTask re-encodes
        # append-materialized columns back to this after Inserts
        prev = getattr(table, "encoding_spec", None)
        if isinstance(prev, dict) and isinstance(spec, dict):
            prev = dict(prev); prev.update(spec); t.encoding_spec = prev
        else:
            t.encoding_spec = spec
        return t


def encoded_memory_bytes(column: Column) -> int:
    """At-rest HBM bytes of a column (encoded form if present)."""
    e = column.encoded
    if e is None:
        d = column.data
        n = d.size * d.dtype.itemsize
    elif isinstance(e, RunLengthColumn):
        n = (e.values.size * e.values.dtype.itemsize
             + e.end_positions.size * e.end_positions.dtype.itemsize)
    elif isinstance(e, FrameOfReferenceColumn):
        n = (e.frames.size * e.frames.dtype.itemsize
             + e.offsets.size * e.offsets.dtype.itemsize)
    else:
        n = e.memory_bytes()
    if column.has_validity:
        n += column.capacity
    return n
