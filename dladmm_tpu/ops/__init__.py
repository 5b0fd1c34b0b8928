from dladmm_tpu.ops.reference import (  # noqa: F401
    shrink,
    apply_dict,
    apply_B,
    dladmm_layer_step,
    LayerParams,
)
