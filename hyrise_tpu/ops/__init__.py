from hyrise_tpu.ops.base import AbstractOperator, execute_plan  # noqa: F401
from hyrise_tpu.ops.get_table import GetTable, TableWrapper  # noqa: F401
from hyrise_tpu.ops.table_scan import TableScan  # noqa: F401
from hyrise_tpu.ops.projection import Projection  # noqa: F401
