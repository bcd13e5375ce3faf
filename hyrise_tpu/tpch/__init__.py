from hyrise_tpu.tpch.dbgen import generate_tables, load_into_catalog  # noqa: F401
