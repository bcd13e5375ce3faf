from hyrise_tpu.bench.runner import BenchmarkConfig, BenchmarkRunner  # noqa: F401
