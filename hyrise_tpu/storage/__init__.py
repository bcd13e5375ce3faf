from hyrise_tpu.storage.column import Column, encode_strings, merge_dictionaries  # noqa: F401
from hyrise_tpu.storage.table import Table, TableColumnDefinition  # noqa: F401
from hyrise_tpu.storage.catalog import Catalog  # noqa: F401
