from hyrise_tpu.ops.base import AbstractOperator, execute_plan  # noqa: F401
from hyrise_tpu.ops.get_table import GetTable, TableWrapper  # noqa: F401
from hyrise_tpu.ops.table_scan import TableScan  # noqa: F401
from hyrise_tpu.ops.projection import Projection  # noqa: F401
from hyrise_tpu.ops.aggregate import Aggregate  # noqa: F401
from hyrise_tpu.ops.sort import Sort  # noqa: F401
from hyrise_tpu.ops.join import (  # noqa: F401
    Join,
    JoinHash,
    JoinIndex,
    JoinMPSM,
    JoinNestedLoop,
    JoinSortMerge,
    Product,
)
from hyrise_tpu.ops.misc import (  # noqa: F401
    Alias,
    Difference,
    Limit,
    UnionAll,
    UnionPositions,
)
from hyrise_tpu.ops.rw_ops import (  # noqa: F401
    AddRowIds,
    Delete,
    Insert,
    Update,
    Validate,
)
from hyrise_tpu.ops.index_scan import IndexScan  # noqa: F401
from hyrise_tpu.ops.import_export import (  # noqa: F401
    ExportBinary,
    ExportCsv,
    ImportBinary,
    ImportCsv,
)
from hyrise_tpu.ops.print_op import Print  # noqa: F401
