"""dladmm_tpu — a TPU-native differentiable linearized-ADMM framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
D-LADMM reference (xhchrn/D-LADMM, the code release for "Differentiable
Linearized ADMM", Xie et al., ICML 2019; see SURVEY.md — the reference mount
was empty, so parity citations point at SURVEY.md sections instead of
reference file:line).

Capability surface (SURVEY.md §1-2):
  * K-layer unrolled D-LADMM network for  min ||x||_1 + ||z||_1
    s.t. A x + B z = b  (robust sparse coding; B = I fast path),
    with per-layer learnable W1, W2, thresholds and penalty beta.
  * Classical LADMM baseline (fixed parameters) for parity curves.
  * Synthetic sparse-coding benchmark (NMSE(dB) per layer, constraint
    residual) and image-denoising benchmark (patch pipeline, PSNR).

TPU-native additions (SURVEY.md §3.2): lax.scan unroll, fused Pallas layer
kernel, jit+optax sharded training, Mesh/shard_map DP+TP parallelism,
multi-host support.
"""

__version__ = "0.1.0"

from dladmm_tpu.ops.reference import shrink  # noqa: F401
from dladmm_tpu.models.unroll import (  # noqa: F401
    DLADMMParams,
    dladmm_forward,
    init_dladmm_params,
)
