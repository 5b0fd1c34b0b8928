"""Whole-unroll Pallas megakernel (SURVEY.md N3 taken to its conclusion).

One pallas_call executes ALL K layers: grid=(K,), the solver state
(x, z, lam, Ax) lives in VMEM output blocks for the ENTIRE unroll (their
index_maps are constant, so Mosaic never writes them back between grid
steps), and layer k's weights arrive via k-indexed BlockSpecs — which the
Mosaic pipeliner double-buffers, so layer k+1's W1/W2/thresholds stream
from HBM while layer k computes. Total HBM traffic for a K-layer forward:
state once + each layer's weights once — the literal one-HBM-pass bound.

Eligibility: one layer's weights (double-buffered) + the full batch state
must fit VMEM (~16 MB) — true for the reference benchmark shapes
(250x500: ~4 MB weights db + ~0.7 MB state at batch 64). The per-layer
kernel (ops/pallas_layer.py) and the XLA scan path cover bigger shapes.

Backward: custom_vjp that rematerializes through the pure-JAX scan
(identical math), so training gradients are exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dladmm_tpu.models.unroll import DLADMMParams

_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _unroll_kernel(
    # inputs
    b_ref,
    a_mat_ref,
    w1_ref,  # (1, n, m) — layer k's block
    w2_ref,  # (1, d, m)
    th1_ref,  # (1, 1, n)
    th2_ref,  # (1, 1, d)
    beta_ref,  # (K, 1) SMEM, whole
    # outputs (constant index_map -> VMEM-resident across all K steps)
    x_ref,
    z_ref,
    lam_ref,
    ax_ref,
    *,
    matmul_dtype,
    k_axis: int = 0,
    prox_x=None,
    prox_z=None,
):
    # k_axis=1 is the tile-outer 2D grid (n_tiles, K): batch tiles are
    # independent solves, so the tile axis goes OUTER — each tile's
    # state blocks stay VMEM-resident for its whole unroll and flush
    # once when the tile advances (weights re-stream per tile, the far
    # smaller cost at large S). k resets per tile, so the k==0 init
    # runs for every tile.
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _init():
        x_ref[:] = jnp.zeros_like(x_ref)
        z_ref[:] = jnp.zeros_like(z_ref)
        lam_ref[:] = jnp.zeros_like(lam_ref)
        ax_ref[:] = jnp.zeros_like(ax_ref)

    def dot_t(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    beta = jnp.maximum(beta_ref[k, 0], 1e-6)
    z = z_ref[:]
    lam = lam_ref[:]
    b = b_ref[:]
    base = z - b + lam * (1.0 / beta)
    u = ax_ref[:] + base
    p1 = x_ref[:] - dot_t(u, w1_ref[0])
    if prox_x is None:  # l1 shrink, the reference fast path
        th1 = jnp.maximum(th1_ref[0], 0.0)
        x1 = jnp.sign(p1) * jnp.maximum(jnp.abs(p1) - th1, 0.0)
    else:
        # General prox (ops/prox.py): pure elementwise / row-wise jnp,
        # traced straight into the kernel body; the prox clamps theta
        # itself (matching the XLA-scan step's semantics).
        x1 = prox_x(p1, th1_ref[0])
    ax1 = dot_t(x1, a_mat_ref[:])
    v = ax1 + base
    p2 = z - dot_t(v, w2_ref[0])
    if prox_z is None:
        th2 = jnp.maximum(th2_ref[0], 0.0)
        z1 = jnp.sign(p2) * jnp.maximum(jnp.abs(p2) - th2, 0.0)
    else:
        z1 = prox_z(p2, th2_ref[0])
    x_ref[:] = x1.astype(x_ref.dtype)
    z_ref[:] = z1.astype(z_ref.dtype)
    lam_ref[:] = (lam + beta * (ax1 + z1 - b)).astype(lam_ref.dtype)
    ax_ref[:] = ax1.astype(ax_ref.dtype)


def unroll_fits_vmem(
    m: int, n: int, d: int, S: int, matmul_dtype=None
) -> bool:
    """One layer's weights (double-buffered by the pipeliner) + full state
    + dictionary must fit the VMEM budget."""
    layer_w = (n * m + d * m) * 4  # stacked params stay fp32 in HBM/VMEM
    a_bytes = m * n * 4
    state = S * (n + 3 * m + max(n, d)) * 4  # x,z,lam,Ax + temps
    return 2 * layer_w + a_bytes + state <= _VMEM_BUDGET_BYTES


def unroll_tile_batch(m: int, n: int, d: int, S: int) -> Optional[int]:
    """Largest batch-tile size for the TILE-OUTER inference megakernel
    (grid (S/bs, K) — see _unroll_kernel k_axis docstring), or None.
    Extends megakernel inference past the whole-batch VMEM cliff (e.g.
    serving buckets ≥ 2k at the reference shape); each tile re-streams
    the weights, trading K*(nm+dm)*(S/bs) extra weight reads for the
    scan path's K round-trips of the full state."""
    if unroll_fits_vmem(m, n, d, S):
        return S  # single tile == the 1-D whole-batch kernel
    layer_w = (n * m + d * m) * 4
    a_bytes = m * n * 4
    for bs in (4096, 2048, 1024, 512, 256, 128, 64):
        if S % bs or bs >= S:
            continue
        state = bs * (n + 3 * m + max(n, d)) * 4
        if 2 * layer_w + a_bytes + 2 * state <= _VMEM_BUDGET_BYTES:
            return bs
    return None


def traj_fits_vmem(m: int, n: int, d: int, S: int, itemsize: int = 4) -> bool:
    """The trajectory VARIANT (the VJP forward) needs more VMEM than the
    inference kernel: fp32 working scratch for the full state PLUS
    double-buffered per-layer output blocks for the 4 trajectory stacks.
    Shapes can pass unroll_fits_vmem but fail this (e.g. 64x256 patches
    at S~4k) — the VJP forward then tiles the batch (traj_tile_batch) or
    falls back to an XLA scan while the backward stays manual."""
    layer_w = 2 * (n * m + d * m) * 4
    a_bytes = m * n * 4
    scratch = S * (n + d + 2 * m) * 4  # fp32 x,z,lam,Ax working state
    out_blocks = 2 * S * (n + d + 2 * m) * itemsize  # traj slices, db
    temps = S * max(n, d) * 4
    return (
        layer_w + a_bytes + scratch + out_blocks + temps
        <= _VMEM_BUDGET_BYTES
    )


def traj_tile_batch(
    m: int, n: int, d: int, S: int, itemsize: int = 4
) -> Optional[int]:
    """Largest batch-tile for the tile-outer TRAJECTORY megakernel
    (grid (S/bs, K)), or None — extends megakernel-speed VJP forwards /
    deep-supervision trajectories past the whole-batch cliff (e.g. the
    paper shape at batch 1024, whose training step otherwise runs an
    XLA-scan trajectory in front of the chunked Pallas backward)."""
    if traj_fits_vmem(m, n, d, S, itemsize):
        return S
    for bs in (2048, 1024, 512, 256, 128, 64):
        if S % bs or bs >= S:
            continue
        if traj_fits_vmem(m, n, d, bs, itemsize):
            return bs
    return None


def _unrolled_forward_pallas(
    params: DLADMMParams,
    A: Array,
    b: Array,
    *,
    matmul_dtype,
    interpret: bool,
    prox_x=None,
    prox_z=None,
):
    K, n, m = params.W1.shape
    d = params.W2.shape[1]
    S = b.shape[0]
    th1 = jnp.broadcast_to(
        params.theta1.reshape(K, 1, -1).astype(b.dtype), (K, 1, n)
    )
    th2 = jnp.broadcast_to(
        params.theta2.reshape(K, 1, -1).astype(b.dtype), (K, 1, d)
    )
    beta = params.beta.reshape(K, 1).astype(jnp.float32)  # SMEM scalars must be 32-bit on TPU

    bs = unroll_tile_batch(m, n, d, S)
    if bs is None:
        raise ValueError(
            f"no megakernel tile fits VMEM for shape m={m} n={n} S={S}"
        )
    n_tiles = S // bs
    if n_tiles == 1:
        grid = (K,)
        k_axis = 0
        tile = lambda *dims: pl.BlockSpec(
            dims, lambda k: (0,) * len(dims), memory_space=pltpu.VMEM
        )
        per_layer = lambda *dims: pl.BlockSpec(
            (1,) + dims,
            lambda k: (k,) + (0,) * len(dims),
            memory_space=pltpu.VMEM,
        )
    else:
        # Tile-outer 2-D grid: see _unroll_kernel's k_axis docstring.
        grid = (n_tiles, K)
        k_axis = 1
        tile = lambda bs_, dim: pl.BlockSpec(
            (bs_, dim), lambda ps, k: (ps, 0), memory_space=pltpu.VMEM
        )
        per_layer = lambda *dims: pl.BlockSpec(
            (1,) + dims,
            lambda ps, k: (k,) + (0,) * len(dims),
            memory_space=pltpu.VMEM,
        )
    whole_A = pl.BlockSpec(
        (m, n), (lambda k: (0, 0)) if n_tiles == 1 else (lambda ps, k: (0, 0)),
        memory_space=pltpu.VMEM,
    )

    x, z, lam, _ = pl.pallas_call(
        functools.partial(
            _unroll_kernel,
            matmul_dtype=matmul_dtype,
            k_axis=k_axis,
            prox_x=prox_x,
            prox_z=prox_z,
        ),
        grid=grid,
        in_specs=[
            tile(bs, m),  # b
            whole_A,  # A
            per_layer(n, m),  # W1
            per_layer(d, m),  # W2
            per_layer(1, n),  # th1
            per_layer(1, d),  # th2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (K, 1)
        ],
        out_specs=[tile(bs, n), tile(bs, d), tile(bs, m), tile(bs, m)],
        out_shape=[
            jax.ShapeDtypeStruct((S, n), b.dtype),
            jax.ShapeDtypeStruct((S, d), b.dtype),
            jax.ShapeDtypeStruct((S, m), b.dtype),
            jax.ShapeDtypeStruct((S, m), b.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * m * (2 * n + d) * K,
            bytes_accessed=n_tiles * K * (n * m + d * m) * 4
            + (m * n + S * (2 * n + 2 * d + 3 * m)) * 4,
            transcendentals=0,
        ),
    )(b, A, params.W1, params.W2, th1, th2, beta)
    return x, z, lam


def _unroll_traj_kernel(
    # inputs
    b_ref,
    a_mat_ref,
    w1_ref,
    w2_ref,
    th1_ref,
    th2_ref,
    beta_ref,
    # outputs: per-layer snapshots, k-indexed blocks —
    #   tx (1,S,n), tz (1,S,d), tlam (1,S,m) and, with_tax only,
    #   tax (1,S,m) (the Ax carry the manual backward consumes);
    # then scratch: resident working state across all K grid steps.
    # Inference trajectories skip tax — pallas outputs cannot be DCE'd,
    # so emitting it unconditionally would waste a K*S*m HBM write.
    *refs,
    matmul_dtype,
    with_tax,
    k_axis: int = 0,
):
    if with_tax:
        tx_ref, tz_ref, tlam_ref, tax_ref, x_s, z_s, lam_s, ax_s = refs
    else:
        tx_ref, tz_ref, tlam_ref, x_s, z_s, lam_s, ax_s = refs
        tax_ref = None
    # k_axis=1: tile-outer 2-D grid (n_tiles, K) — see _unroll_kernel.
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _init():
        x_s[:] = jnp.zeros_like(x_s)
        z_s[:] = jnp.zeros_like(z_s)
        lam_s[:] = jnp.zeros_like(lam_s)
        ax_s[:] = jnp.zeros_like(ax_s)

    def dot_t(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    beta = jnp.maximum(beta_ref[k, 0], 1e-6)
    z = z_s[:]
    lam = lam_s[:]
    b = b_ref[:]
    base = z - b + lam * (1.0 / beta)
    u = ax_s[:] + base
    th1 = jnp.maximum(th1_ref[0], 0.0)
    p1 = x_s[:] - dot_t(u, w1_ref[0])
    x1 = jnp.sign(p1) * jnp.maximum(jnp.abs(p1) - th1, 0.0)
    ax1 = dot_t(x1, a_mat_ref[:])
    v = ax1 + base
    th2 = jnp.maximum(th2_ref[0], 0.0)
    p2 = z - dot_t(v, w2_ref[0])
    z1 = jnp.sign(p2) * jnp.maximum(jnp.abs(p2) - th2, 0.0)
    lam1 = lam + beta * (ax1 + z1 - b)
    x_s[:] = x1
    z_s[:] = z1
    lam_s[:] = lam1
    ax_s[:] = ax1
    tx_ref[0] = x1.astype(tx_ref.dtype)
    tz_ref[0] = z1.astype(tz_ref.dtype)
    tlam_ref[0] = lam1.astype(tlam_ref.dtype)
    if tax_ref is not None:
        tax_ref[0] = ax1.astype(tax_ref.dtype)


def _traj_xla(params, A, b):
    """XLA-scan trajectory with the same (tx, tz, tlam, tax) layout —
    the VJP-forward fallback when the trajectory kernel's VMEM working
    set doesn't fit (traj_fits_vmem)."""
    from dladmm_tpu.ops.reference import (
        LayerParams,
        dladmm_layer_step_cached,
    )

    S = b.shape[0]
    n = params.W1.shape[1]
    x = jnp.zeros((S, n), b.dtype)
    z = jnp.zeros_like(b)
    lam = jnp.zeros_like(b)
    Ax = jnp.zeros_like(b)

    def body(carry, p):
        x, z, lam, Ax, Bz = carry
        x, z, lam, Ax, Bz = dladmm_layer_step_cached(
            A, None, b, x, z, lam, Ax, Bz, p
        )
        return (x, z, lam, Ax, Bz), (x, z, lam, Ax)

    _, traj = jax.lax.scan(
        body, (x, z, lam, Ax, z), LayerParams(*params)
    )
    return traj


def _traj_pallas(params, A, b, *, matmul_dtype, interpret, with_tax=True):
    """Run the trajectory megakernel; returns stacked (tx, tz, tlam[,
    tax]) of shape (K, S, ·) — the full carry trajectory, which is
    exactly the residual set the manual backward needs
    (ops/unroll_vjp.py). with_tax=False (inference trajectories) skips
    the Ax stack and its HBM write."""
    K, n, m = params.W1.shape
    d = params.W2.shape[1]
    S = b.shape[0]
    th1 = jnp.broadcast_to(
        params.theta1.reshape(K, 1, -1).astype(b.dtype), (K, 1, n)
    )
    th2 = jnp.broadcast_to(
        params.theta2.reshape(K, 1, -1).astype(b.dtype), (K, 1, d)
    )
    beta = params.beta.reshape(K, 1).astype(jnp.float32)  # SMEM scalars must be 32-bit on TPU
    bs = traj_tile_batch(m, n, d, S, b.dtype.itemsize)
    if bs is None:
        raise ValueError(
            f"no trajectory-kernel tile fits VMEM for m={m} n={n} S={S}"
        )
    n_tiles = S // bs
    if n_tiles == 1:
        grid = (K,)
        k_axis = 0
        tile = lambda bs_, dim: pl.BlockSpec(
            (bs_, dim), lambda k: (0, 0), memory_space=pltpu.VMEM
        )
        per_layer = lambda *dims: pl.BlockSpec(
            (1,) + dims,
            lambda k: (k,) + (0,) * len(dims),
            memory_space=pltpu.VMEM,
        )
        traj_block = lambda dim: per_layer(S, dim)
    else:
        # Tile-outer 2-D grid (see _unroll_kernel k_axis docstring);
        # trajectory blocks index both (layer, tile).
        grid = (n_tiles, K)
        k_axis = 1
        tile = lambda bs_, dim: pl.BlockSpec(
            (bs_, dim), lambda ps, k: (ps, 0), memory_space=pltpu.VMEM
        )
        per_layer = lambda *dims: pl.BlockSpec(
            (1,) + dims,
            lambda ps, k: (k,) + (0,) * len(dims),
            memory_space=pltpu.VMEM,
        )
        traj_block = lambda dim: pl.BlockSpec(
            (1, bs, dim),
            lambda ps, k: (k, ps, 0),
            memory_space=pltpu.VMEM,
        )
    whole_A = pl.BlockSpec(
        (m, n),
        (lambda k: (0, 0)) if n_tiles == 1 else (lambda ps, k: (0, 0)),
        memory_space=pltpu.VMEM,
    )
    out_specs = [traj_block(n), traj_block(d), traj_block(m)]
    out_shape = [
        jax.ShapeDtypeStruct((K, S, n), b.dtype),
        jax.ShapeDtypeStruct((K, S, d), b.dtype),
        jax.ShapeDtypeStruct((K, S, m), b.dtype),
    ]
    if with_tax:
        out_specs.append(traj_block(m))
        out_shape.append(jax.ShapeDtypeStruct((K, S, m), b.dtype))
    return pl.pallas_call(
        functools.partial(
            _unroll_traj_kernel,
            matmul_dtype=matmul_dtype,
            with_tax=with_tax,
            k_axis=k_axis,
        ),
        grid=grid,
        in_specs=[
            tile(bs, m),
            whole_A,
            per_layer(n, m),
            per_layer(d, m),
            per_layer(1, n),
            per_layer(1, d),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bs, n), jnp.float32),
            pltpu.VMEM((bs, d), jnp.float32),
            pltpu.VMEM((bs, m), jnp.float32),
            pltpu.VMEM((bs, m), jnp.float32),
        ],
        interpret=interpret,
    )(b, A, params.W1, params.W2, th1, th2, beta)


def _traj_any(params, A, b, *, matmul_dtype, interpret, with_tax=True):
    """Trajectory via the megakernel when its working set fits VMEM,
    else the XLA-scan fallback (identical layout and math)."""
    K, n, m = params.W1.shape
    d = params.W2.shape[1]
    # The VMEM-fit gate applies in interpret mode too: interpret runs
    # the kernel without a VMEM limit, but _traj_pallas still needs a
    # valid tile size, and over-VMEM shapes must take the same XLA
    # fallback they take on hardware (previously the flagship deep-
    # supervision shape raised on CPU instead of falling back).
    if traj_tile_batch(m, n, d, b.shape[0], b.dtype.itemsize) is not None:
        return _traj_pallas(
            params,
            A,
            b,
            matmul_dtype=matmul_dtype,
            interpret=interpret,
            with_tax=with_tax,
        )
    traj = _traj_xla(params, A, b)  # unused ys are DCE'd by XLA
    return traj if with_tax else traj[:3]


def make_unrolled_trajectory(
    matmul_dtype=None, interpret: Optional[bool] = None
):
    """Trajectory-capturing megakernel: (params, A, b) -> stacked
    per-layer (x, z, lam) of shape (K, S, ·) — megakernel speed for the
    NMSE-vs-layer eval and deep-supervision loss. Exact grads via the
    shared manual reverse-scan backward (ops/unroll_vjp.py) fed the
    kernel's own trajectory — no second forward."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def trajectory(params, A, b):
        tx, tz, tlam = _traj_any(
            params,
            A,
            b,
            matmul_dtype=matmul_dtype,
            interpret=interpret,
            with_tax=False,
        )
        return tx, tz, tlam

    def fwd(params, A, b):
        tx, tz, tlam, tax = _traj_any(
            params, A, b, matmul_dtype=matmul_dtype, interpret=interpret
        )
        return (tx, tz, tlam), (params, A, b, (tx, tz, tlam, tax))

    def bwd(res, cts):
        from dladmm_tpu.ops.unroll_vjp import (
            bwd_from_carries,
            shifted_residuals,
        )

        params, A, b, (tx, tz, tlam, tax) = res
        zeros = (
            jnp.zeros_like(tx[-1]),
            jnp.zeros_like(tz[-1]),
            jnp.zeros_like(tlam[-1]),
        )
        return bwd_from_carries(
            params,
            A,
            b,
            shifted_residuals(tx, tz, tlam, tax),
            zeros,
            traj_cts=cts,
        )

    trajectory.defvjp(fwd, bwd)
    return trajectory


def prox_megakernel_available(prox_pair, m, n, d, S):
    """(available, reason) for routing a general-prox INFERENCE forward
    through the prox-templated megakernel at batch S — the single
    decision shared by serve.py (both servers), DLADMMSolver, and
    bench/serving.py (round-5 review: four hand-copies had started to
    drift). reason explains the False case for caller error messages."""
    from dladmm_tpu.ops.prox import kernel_exact

    if prox_pair is None:
        return False, (
            "no prox callables (prox_pair not given; an opaque step_fn "
            "cannot drive the kernel)"
        )
    if not all(kernel_exact(f) for f in prox_pair):
        return False, (
            "this prox is not kernel-exact on TPU (ops/prox.py "
            "group_l2 note)"
        )
    if unroll_tile_batch(m, n, d, S) is None:
        return False, "no tile fits VMEM"
    return True, ""


def make_unrolled_inference_prox(
    prox_x,
    prox_z,
    matmul_dtype=None,
    interpret: Optional[bool] = None,
):
    """INFERENCE-ONLY whole-unroll megakernel with a general prox pair
    (ops/prox.py callables) in place of the l1 shrink — round 5: a
    trained synthetic_nonneg / elastic_net / box / group_l2 net serves
    at megakernel speed instead of paying the XLA-scan path (the prox
    bodies are pure elementwise / row-wise jnp, traced straight into
    the kernel; same one-HBM-pass streaming as the l1 kernel).

    B = I only, no custom_vjp: training through a general prox keeps
    the XLA scan + autodiff (loss_fn's routing) — the backward kernels
    hand-write the l1 shrink mask and do not generalize. Parity with
    the scan forward is pinned by tests/test_pallas_unroll.py."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def forward(params, A, b):
        return _unrolled_forward_pallas(
            params,
            A,
            b,
            matmul_dtype=matmul_dtype,
            interpret=interpret,
            prox_x=prox_x,
            prox_z=prox_z,
        )

    return forward


def make_unrolled_forward(matmul_dtype=None, interpret: Optional[bool] = None):
    """Returns forward(params, A, b) -> (x_K, z_K, lam_K) running the
    whole-unroll megakernel. B = I only.

    Backward (custom_vjp): the VJP forward runs the trajectory variant of
    the kernel, and the gradient is the manual reverse-scan backward
    (ops/unroll_vjp.py) consuming that trajectory — the Pallas forward
    needs no rematerialization and XLA autodiff never sees the kernel.
    Inference (no grad) uses the trajectory-free kernel: state never
    leaves VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def forward(params, A, b):
        return _unrolled_forward_pallas(
            params, A, b, matmul_dtype=matmul_dtype, interpret=interpret
        )

    def fwd(params, A, b):
        tx, tz, tlam, tax = _traj_any(
            params, A, b, matmul_dtype=matmul_dtype, interpret=interpret
        )
        out = (tx[-1], tz[-1], tlam[-1])
        return out, (params, A, b, (tx, tz, tlam, tax))

    def bwd(res, cts):
        params, A, b, (tx, tz, tlam, tax) = res
        K, n, m = params.W1.shape
        d = params.W2.shape[1]
        from dladmm_tpu.ops.pallas_bwd import (
            bwd_chunk_batch,
            bwd_fits_vmem,
            unroll_bwd_pallas,
            unroll_bwd_pallas_chunked,
        )

        if bwd_fits_vmem(m, n, d, b.shape[0], b.dtype.itemsize):
            # Full Pallas training step: cotangent state VMEM-resident
            # across the whole reverse sweep (ops/pallas_bwd.py).
            return unroll_bwd_pallas(
                params, A, b, (tx, tz, tlam, tax), cts, interpret=interpret
            )
        bs = bwd_chunk_batch(m, n, d, b.shape[0], b.dtype.itemsize)
        if bs is not None:
            # Batch-chunked megakernel: weights stream once per layer,
            # full-batch cotangents resident, tiles of bs samples.
            return unroll_bwd_pallas_chunked(
                params, A, b, (tx, tz, tlam, tax), cts, bs,
                interpret=interpret,
            )
        from dladmm_tpu.ops.unroll_vjp import (
            bwd_from_carries,
            shifted_residuals,
        )

        return bwd_from_carries(
            params, A, b, shifted_residuals(tx, tz, tlam, tax), cts
        )

    forward.defvjp(fwd, bwd)
    return forward
