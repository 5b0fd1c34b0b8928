from dladmm_tpu.baselines.ladmm import ladmm_run  # noqa: F401
