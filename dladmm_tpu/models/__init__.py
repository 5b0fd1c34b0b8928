from dladmm_tpu.models.unroll import (  # noqa: F401
    DLADMMParams,
    dladmm_forward,
    init_dladmm_params,
    spectral_norm_sq,
)
