"""Fused Pallas TPU layer kernel (SURVEY.md N3, BASELINE.json:5).

One D-LADMM layer — both learned matvecs, the dictionary matvec, both
soft-threshold proximal updates, and the dual ascent — in a single Pallas
kernel, replacing the reference's cuBLAS-matmul + elementwise chain
(SURVEY.md §5.2, the hot kernel):

  * Grid over batch tiles; per-tile state (x, z, lam, b, Ax) lives in VMEM
    for the whole layer, so the intermediates u, v, and the shifted
    residual NEVER round-trip to HBM ("one HBM pass" goal).
  * Weights (A, W1, W2) use constant index_maps, so Mosaic keeps them
    resident in VMEM across batch tiles: fetched from HBM once per layer.
  * All matmuls hit the MXU via dot_general with fp32 accumulation;
    optional bf16 operand casting doubles/quadruples MXU throughput
    (matmul_dtype=jnp.bfloat16) while state stays fp32.
  * B = I specialization (both reference benchmarks; SURVEY.md §2 point 4).
    General B falls back to the pure-JAX golden op.

Backward: custom_vjp with rematerialization — residuals are the layer
inputs; the backward pass is the VJP of the (mathematically identical)
pure-JAX golden op, which XLA fuses well (SURVEY.md §9.1 hard-part (a),
option "fuse forward, XLA-differentiate the reference op").

VMEM budget: weights must fit residently —
  fp32: (m*n*2 + d*m) * 4 bytes;  bf16 operands: half that.
The wrapper asserts this and callers fall back to the reference step for
over-budget shapes (streamed-weight kernel is the planned follow-up).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dladmm_tpu.ops.reference import (
    LayerParams,
    dladmm_layer_step_cached,
)

# Conservative per-core VMEM budget for resident weights + one batch tile.
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _dot_t(a: Array, w: Array, matmul_dtype) -> Array:
    """(S, k) x (j, k) -> (S, j): contract w's second axis (w is stored in
    math convention, used transposed) with fp32 accumulation on the MXU."""
    if matmul_dtype is not None:
        a = a.astype(matmul_dtype)
        w = w.astype(matmul_dtype)
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _layer_kernel(
    # inputs
    x_ref,
    z_ref,
    lam_ref,
    b_ref,
    ax_ref,
    a_mat_ref,
    w1_ref,
    w2_ref,
    th1_ref,
    th2_ref,
    beta_ref,
    # outputs
    x1_ref,
    z1_ref,
    lam1_ref,
    ax1_ref,
    *,
    matmul_dtype,
):
    beta = jnp.maximum(beta_ref[0, 0], 1e-6)
    inv_beta = 1.0 / beta
    z = z_ref[:]
    lam = lam_ref[:]
    b = b_ref[:]
    # base/u/v are VMEM-resident temporaries — never written to HBM.
    base = z - b + lam * inv_beta
    u = ax_ref[:] + base
    th1 = jnp.maximum(th1_ref[:], 0.0)
    p1 = x_ref[:] - _dot_t(u, w1_ref[:], matmul_dtype)
    x1 = jnp.sign(p1) * jnp.maximum(jnp.abs(p1) - th1, 0.0)
    ax1 = _dot_t(x1, a_mat_ref[:], matmul_dtype)
    v = ax1 + base
    th2 = jnp.maximum(th2_ref[:], 0.0)
    p2 = z - _dot_t(v, w2_ref[:], matmul_dtype)
    z1 = jnp.sign(p2) * jnp.maximum(jnp.abs(p2) - th2, 0.0)
    x1_ref[:] = x1.astype(x1_ref.dtype)
    z1_ref[:] = z1.astype(z1_ref.dtype)
    lam1_ref[:] = (lam + beta * (ax1 + z1 - b)).astype(lam1_ref.dtype)
    ax1_ref[:] = ax1.astype(ax1_ref.dtype)


def weights_fit_vmem(
    m: int, n: int, d: int, block_s: int, matmul_dtype=None
) -> bool:
    wbytes = 4 if matmul_dtype is None else jnp.dtype(matmul_dtype).itemsize
    weights = (m * n + n * m + d * m) * wbytes
    state = block_s * (2 * n + 8 * m) * 4  # x/x1 + m-sized tiles & temps
    return weights + state <= _VMEM_BUDGET_BYTES


def _fused_forward(
    A: Array,
    b: Array,
    x: Array,
    z: Array,
    lam: Array,
    Ax: Array,
    W1: Array,
    W2: Array,
    th1: Array,
    th2: Array,
    beta: Array,
    *,
    block_s: int,
    matmul_dtype,
    interpret: bool,
):
    S = b.shape[0]
    m, n = A.shape
    d = W2.shape[0]
    bs = min(block_s, S)
    grid = (pl.cdiv(S, bs),)

    tile = lambda cols: pl.BlockSpec(
        (bs, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_layer_kernel, matmul_dtype=matmul_dtype),
        grid=grid,
        in_specs=[
            tile(n),  # x
            tile(d),  # z
            tile(m),  # lam
            tile(m),  # b
            tile(m),  # Ax
            whole((m, n)),  # A
            whole((n, m)),  # W1
            whole((d, m)),  # W2
            whole((1, n)),  # th1
            whole((1, d)),  # th2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1, 1)
        ],
        out_specs=[tile(n), tile(d), tile(m), tile(m)],
        out_shape=[
            jax.ShapeDtypeStruct((S, n), x.dtype),
            jax.ShapeDtypeStruct((S, d), z.dtype),
            jax.ShapeDtypeStruct((S, m), lam.dtype),
            jax.ShapeDtypeStruct((S, m), lam.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * m * (2 * n + d),
            bytes_accessed=(m * n + n * m + d * m) * 4
            + S * (2 * n + d + 3 * m) * 4,
            transcendentals=0,
        ),
    )(x, z, lam, b, Ax, A, W1, W2, th1, th2, beta)
    return tuple(out)


def _ref_core(A, b, x, z, lam, Ax, W1, W2, th1, th2, beta):
    """Mathematically identical pure-JAX computation (B = I), used for the
    rematerialized backward pass and as the test oracle."""
    p = LayerParams(W1, W2, th1, th2, beta)
    x1, z1, lam1, Ax1, _ = dladmm_layer_step_cached(
        A, None, b, x, z, lam, Ax, z, p
    )
    return x1, z1, lam1, Ax1


def make_fused_step(
    block_s: int = 256,
    matmul_dtype=None,
    interpret: Optional[bool] = None,
):
    """Build a cached-signature step_fn running the fused Pallas kernel.

    The returned function plugs into dladmm_forward(step_fn=...). Falls
    back to the pure-JAX golden op for general B (kernel is B=I-
    specialized) — callers should check weights_fit_vmem() for shape
    eligibility first.

    interpret=None auto-selects Pallas interpret mode off-TPU so the same
    tests run on the CPU backend (SURVEY.md §6.2-4). The backend check
    is deferred to first trace: a module-level default instance exists
    (fused_layer_step), and jax.default_backend() at import time would
    initialize the pinned axon backend — hanging every import of the
    package while the TPU relay is down.
    """

    @jax.custom_vjp
    def fused_core(A, b, x, z, lam, Ax, W1, W2, th1, th2, beta):
        itp = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        return _fused_forward(
            A, b, x, z, lam, Ax, W1, W2, th1, th2, beta,
            block_s=block_s, matmul_dtype=matmul_dtype, interpret=itp,
        )

    def fwd(A, b, x, z, lam, Ax, W1, W2, th1, th2, beta):
        out = fused_core(A, b, x, z, lam, Ax, W1, W2, th1, th2, beta)
        return out, (A, b, x, z, lam, Ax, W1, W2, th1, th2, beta)

    def bwd(res, cts):
        # Rematerialize through the identical pure-JAX op; XLA fuses the
        # backward matmul+mask chain (SURVEY.md §9.1 hard-part (a)).
        # beta is fp32 (SMEM constraint) while state may be bf16, so the
        # ref op's outputs promote — align the cotangent dtypes to it.
        outs, vjp = jax.vjp(_ref_core, *res)
        cts = tuple(c.astype(o.dtype) for c, o in zip(cts, outs))
        return vjp(cts)

    fused_core.defvjp(fwd, bwd)

    def step_fn(A, B, b, x, z, lam, Ax, Bz, p: LayerParams):
        if B is not None:  # kernel is specialized to the benchmark B = I
            return dladmm_layer_step_cached(A, B, b, x, z, lam, Ax, Bz, p)
        n = p.W1.shape[0]
        d = p.W2.shape[0]
        th1 = jnp.broadcast_to(
            jnp.asarray(p.theta1, x.dtype).reshape(1, -1), (1, n)
        )
        th2 = jnp.broadcast_to(
            jnp.asarray(p.theta2, z.dtype).reshape(1, -1), (1, d)
        )
        # SMEM scalars must be 32-bit on TPU (Mosaic cannot legalize
        # bf16 scalar arith like maximumf).
        beta = jnp.asarray(p.beta, jnp.float32).reshape(1, 1)
        x1, z1, lam1, Ax1 = fused_core(
            A, b, x, z, lam, Ax, p.W1, p.W2, th1, th2, beta
        )
        return x1, z1, lam1, Ax1, z1

    return step_fn


def auto_fused_step(m: int, n: int, d: int, block_s: int = 256):
    """Pick the fastest eligible fused kernel for the problem shape:
    fp32-resident weights if they fit VMEM, else bf16 matmul operands
    (fp32 accumulation/state), else None (caller uses the reference op).
    """
    if weights_fit_vmem(m, n, d, block_s):
        return make_fused_step(block_s=block_s)
    if weights_fit_vmem(m, n, d, block_s, jnp.bfloat16):
        return make_fused_step(block_s=block_s, matmul_dtype=jnp.bfloat16)
    return None


# Default instance used by the kernel="pallas" config switch.
fused_layer_step = make_fused_step()
