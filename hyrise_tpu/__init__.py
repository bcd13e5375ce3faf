"""hyrise_tpu — a TPU-native vectorized SQL query-execution engine.

A from-scratch reimagining of the capability set of Hyrise (reference:
/root/reference, an in-memory columnar SQL database in C++17) as a
JAX/XLA/Pallas engine:

- Storage: tables are sets of fixed-capacity, device-resident column arrays
  (dictionary codes for strings) with validity masks, hash-partitioned across
  a `jax.sharding.Mesh` for multi-host execution.
- Operators: scan / join / aggregate / sort / projection are jitted XLA
  programs (Pallas kernels on hot paths) over (values, validity) arrays.
- Variable-size results (filters, join fan-out) use count-then-allocate with
  power-of-two capacity bucketing so XLA sees a bounded set of static shapes.
- Distribution: all-to-all shuffle over ICI/DCN replaces the reference's
  NUMA-aware task scheduler (reference: src/lib/scheduler/).

See SURVEY.md for the reference structural analysis this build follows.
"""

__version__ = "0.1.0"

# A SQL engine needs real int64/float64 (SUM/COUNT accumulators, long keys).
# Must be set before any jax array is created.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: whole-plan query programs take minutes to
# compile through the remote-TPU tunnel but hit this cache in ~2s on any
# later process. Opt out with HYRISE_COMPILATION_CACHE=0 or point
# HYRISE_COMPILATION_CACHE_DIR elsewhere.
if _os.environ.get("HYRISE_COMPILATION_CACHE", "1") not in ("0", "false") \
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    # (cpu excluded: XLA:CPU cache entries are host-machine-feature AOT
    # binaries that do not relocate; the remote-TPU compiles are the ones
    # worth persisting)
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("HYRISE_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/hyrise_tpu_xla")))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hyrise_tpu.types import DataType, JoinMode, PredicateCondition, SortMode  # noqa: F401
from hyrise_tpu.storage.table import Table  # noqa: F401
from hyrise_tpu.storage.column import Column  # noqa: F401
from hyrise_tpu.storage.catalog import Catalog  # noqa: F401
