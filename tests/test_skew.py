import numpy as np
import pandas as pd

from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.parallel.skew import (detect_hot_keys, needs_rebalance,
                                      shard_imbalance, split_hot_keys)
from hyrise_tpu.storage.table import Table


def test_balanced_table_no_rebalance():
    mesh = make_mesh(8)
    t = Table.from_pandas("t", pd.DataFrame({
        "k": np.arange(1, 8001, dtype=np.int32)}))
    st = hash_partition(t, "k", mesh)
    assert shard_imbalance(st) < 0.2
    assert not needs_rebalance(st, threshold=0.5)


def test_skewed_table_detected_and_split():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    # 80% of rows share one key
    keys = np.where(rng.random(8000) < 0.8, 7,
                    rng.integers(1, 1000, 8000)).astype(np.int32)
    t = Table.from_pandas("t", pd.DataFrame({"k": keys}))
    st = hash_partition(t, "k", mesh)
    assert needs_rebalance(st)
    hot = detect_hot_keys(t, "k", 8)
    assert 7 in hot
    targets = split_hot_keys(t, "k", hot, 8)
    counts = np.bincount(targets, minlength=8)
    assert counts.max() / counts.mean() < 1.3  # spread evenly after salting
