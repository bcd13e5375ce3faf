from hyrise_tpu.sql.parser import parse_sql  # noqa: F401
from hyrise_tpu.sql.pipeline import SQLPipeline, SQLPipelineBuilder  # noqa: F401
