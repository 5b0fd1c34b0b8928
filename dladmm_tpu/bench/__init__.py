from dladmm_tpu.bench.timing import time_chained  # noqa: F401
