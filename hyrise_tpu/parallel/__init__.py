from hyrise_tpu.parallel.mesh import make_mesh  # noqa: F401
from hyrise_tpu.parallel.partition import ShardedTable, hash_partition  # noqa: F401
from hyrise_tpu.parallel.exchange import (  # noqa: F401
    dist_filter_aggregate,
    dist_join_aggregate_step,
    repartition_by_key,
)
