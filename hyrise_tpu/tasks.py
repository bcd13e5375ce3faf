"""Maintenance tasks.

Reference: src/lib/tasks/ — most notably ChunkCompressionTask
(chunk_compression_task.{hpp,cpp}), which the reference schedules after a
chunk fills so appended data gets re-encoded to the table's at-rest
encodings (storage/chunk_encoder.hpp:20-40). Here tables have no chunk
axis (storage/table.py), so the granularity is the COLUMN: Insert's
copy-on-write append materializes touched columns to dense form and drops
their encoded at-rest representation; this task re-encodes exactly those
columns back to the table's remembered encoding spec.
"""

from __future__ import annotations

from typing import Optional

from hyrise_tpu.storage.catalog import Catalog, default_catalog
from hyrise_tpu.storage.encoding import ChunkEncoder, EncodingType


class ChunkCompressionTask:
    """Re-encode a table's appended (dense) columns to its at-rest spec.

    task = ChunkCompressionTask("lineitem")
    task.run()                       # direct execution
    JobTask(task.run).schedule()     # or through the scheduler, like the
                                     # reference's task queue

    The spec defaults to the one remembered by ChunkEncoder.encode_table
    (`table.encoding_spec`); a table never encoded is left untouched.
    Query results are unchanged: encodings are lossless and operators
    consume the decode-to-dense normal form.
    """

    def __init__(self, table_name: str, catalog: Optional[Catalog] = None,
                 spec=None):
        self.table_name = table_name
        self.catalog = catalog
        self.spec = spec

    def run(self):
        cat = self.catalog if self.catalog is not None else default_catalog()
        table = cat.get_table(self.table_name)
        spec = self.spec if self.spec is not None \
            else getattr(table, "encoding_spec", None)
        if spec is None:
            return table
        # only columns whose encoded at-rest form was dropped (appends
        # materialize to dense) need the re-encode pass — the reference's
        # "chunks marked by Insert" set, at column granularity
        todo = {}
        for c in table.columns:
            want = spec.get(c.name) if isinstance(spec, dict) else spec
            if want is None or want is EncodingType.UNENCODED:
                continue
            if c.encoded is None:
                todo[c.name] = want
        if not todo:
            return table
        out = ChunkEncoder.encode_table(table, todo)
        out.encoding_spec = spec
        cat.replace_table(self.table_name, out)
        return out
