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


# -- chunk encoder -----------------------------------------------------------


class ChunkEncoder:
    """Reference: storage/chunk_encoder.hpp:20-40 — re-encode columns with a
    per-column spec. Here: applies narrow-dtype compression to dictionary
    code arrays and exposes RLE/FoR as analyzable alternatives."""

    @staticmethod
    def encode_column(column: Column, encoding: EncodingType):
        n = column.data.shape[0]
        host = np.asarray(column.data)
        if encoding is EncodingType.UNENCODED:
            return column
        if encoding in (EncodingType.DICTIONARY,
                        EncodingType.FIXED_STRING_DICTIONARY):
            if column.dtype is DataType.STRING:
                narrow = compress_attribute_vector(host)
                return Column(column.name, column.dtype, jnp.asarray(narrow),
                              column.validity, column.dictionary)
            # numeric dictionary encoding: build a dictionary + codes
            dictionary, codes = np.unique(host, return_inverse=True)
            codes = compress_attribute_vector(codes.astype(np.int64))
            c = Column(column.name, column.dtype, jnp.asarray(codes),
                       column.validity, None)
            c.numeric_dictionary = jnp.asarray(dictionary)
            return c
        if encoding is EncodingType.RUN_LENGTH:
            values, ends = run_length_encode(host)
            return RunLengthColumn(jnp.asarray(values), jnp.asarray(ends), n)
        if encoding is EncodingType.FRAME_OF_REFERENCE:
            assert column.dtype.is_integral
            return frame_of_reference_encode(host)
        raise ValueError(encoding)
