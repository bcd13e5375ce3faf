from hyrise_tpu.tpcc.generator import generate_tpcc_tables  # noqa: F401
