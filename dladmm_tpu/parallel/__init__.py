from dladmm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings_tp,
)
from dladmm_tpu.parallel.memory import (  # noqa: F401
    audit_or_raise,
    per_chip_bytes,
    step_traffic_bytes,
)
