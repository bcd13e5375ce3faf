"""Device-side assertion support — the sanitizer story.

The reference relies on CI sanitizer builds (ASan/UBSan/TSan,
Jenkinsfile:102-146) plus DebugAssert macros (utils/assert.hpp). The failure
modes they catch (out-of-bounds access, use of stale memory) have XLA
analogues that are SILENT: out-of-range gather indices clamp or drop, so a
capacity/masking bug produces wrong answers instead of crashing.

`device_assert(cond_array, label)` is a checkify-style guard: when
HYRISE_DEVICE_ASSERTS=1 (tests / debug runs), the condition is reduced and
raised on the HOST via jax.debug.callback — works inside jit and under the
whole-plan compiler. In normal runs it is a no-op with zero overhead.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enabled() -> bool:
    return os.environ.get("HYRISE_DEVICE_ASSERTS", "0") not in ("0", "false")


class DeviceAssertionError(AssertionError):
    pass


def _raise_if(failed, label: str) -> None:
    if bool(failed):
        raise DeviceAssertionError(f"device assertion failed: {label}")


def device_assert(cond, label: str) -> None:
    """Assert that `cond` (bool array or scalar) holds everywhere. No-op
    unless HYRISE_DEVICE_ASSERTS=1."""
    if not enabled():
        return
    failed = ~jnp.all(cond)
    if isinstance(failed, jax.core.Tracer):
        jax.debug.callback(_raise_if, failed, label)
    else:
        _raise_if(failed, label)  # eager: check immediately


def assert_indices_in_range(indices, limit, label: str) -> None:
    """Gather-index bounds check (XLA would silently clamp)."""
    if not enabled():
        return
    device_assert((indices >= 0) & (indices < limit), label)
