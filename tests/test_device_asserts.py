"""Device-side assertion tests (utils/asserts.py) — the analogue of the
reference's sanitizer CI builds (Jenkinsfile:102-146): out-of-bounds gathers
are silent on XLA (clamp/drop), so debug runs guard them explicitly."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from hyrise_tpu.ops.materialize import gather_table
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils import asserts


@pytest.fixture()
def checked(monkeypatch):
    monkeypatch.setenv("HYRISE_DEVICE_ASSERTS", "1")
    yield


def _table(n=16):
    return Table.from_pandas("t", pd.DataFrame(
        {"a": np.arange(n, dtype=np.int64)}))


def test_in_range_gather_passes(checked):
    t = _table()
    out = gather_table(t, jnp.asarray([0, 3, 5], dtype=jnp.int32), 3,
                       lazy=False)
    assert out.rows() == [(0,), (3,), (5,)]


def test_out_of_range_gather_raises(checked):
    t = _table()
    with pytest.raises(Exception, match="device assertion failed"):
        gather_table(t, jnp.asarray([0, 5000], dtype=jnp.int32), 2,
                     lazy=False)
        # jax.debug.callback may be async; force materialization
        import jax
        jax.effects_barrier()


def test_disabled_by_default():
    t = _table()
    # silent clamp — documented XLA behavior the assert exists to catch
    out = gather_table(t, jnp.asarray([0, 5000], dtype=jnp.int32), 2,
                       lazy=False)
    assert out.num_rows == 2


def test_device_assert_inside_jit(checked):
    import jax

    @jax.jit
    def f(x):
        asserts.device_assert(x < 10, "x too big")
        return x + 1

    f(jnp.asarray([1, 2]))
    with pytest.raises(Exception, match="device assertion failed"):
        f(jnp.asarray([1, 22]))
        jax.effects_barrier()
