"""int8 quantized inference forward (serving-only scope).

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 peak
(394 vs 197 TOPS) and int8 weights halve the weight HBM traffic again
vs bf16 — for the serving path (no gradients, throughput-bound at the
large buckets) that is the next rung below bf16 on the
precision/throughput ladder. No reference counterpart (the reference
has no serving story at all — SURVEY.md §3.1); semantics follow
ops/reference.py's cached-Ax recurrence exactly, with each of the three
matmuls per layer replaced by a quantized dot.

Scheme (standard dynamic activation quantization):
  * Weights (W1, W2, and the dictionary A) are quantized ONCE at server
    construction, symmetric per OUTPUT ROW: q[o, :] = round(w[o, :] /
    s[o]) with s[o] = max|w[o, :]| / 127. Per-row scales cost one fp32
    per output channel and remove the worst-row-dominates-all error of
    a per-tensor scale.
  * Activations are quantized per SAMPLE at each dot: s[i] =
    max|act[i, :]| / 127 (no clipping — the max is exactly
    representable), rounded to int8.
  * The dot accumulates in int32 (exact: 127*127*16384 < 2^31), then
    dequantizes as y[i, o] = acc[i, o] * s_act[i] * s_w[o] in fp32.
  * Thresholding, residuals, and the dual update stay in fp32 — the
    elementwise chain is a small fraction of serving cost at the
    matmul-bound buckets, and keeping the state exact stops layer-to-
    layer error compounding through anything but the dots themselves.

Identity-B only (like the fused Pallas kernels — SURVEY.md §2 pt 4):
the general-B serving path stays on the XLA scan.

Measured quality/latency vs fp32/bf16 serving is recorded in
BASELINE.md (the NMSE delta is the number to check before enabling —
same rule as bf16 serving).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dladmm_tpu.models.unroll import DLADMMParams
from dladmm_tpu.ops.reference import _BETA_MIN, shrink

_TINY = 1e-12


class QuantizedParams(NamedTuple):
    """int8 weights + fp32 per-row scales for the stacked [K, ...] net.

    Thresholds/beta stay fp32 — they are O(K*n) scalars applied
    elementwise, not matmul operands.
    """

    W1_q: Array  # (K, n, m) int8
    W1_s: Array  # (K, n) fp32
    W2_q: Array  # (K, d, m) int8
    W2_s: Array  # (K, d) fp32
    theta1: Array
    theta2: Array
    beta: Array


class QuantizedDict(NamedTuple):
    A_q: Array  # (m, n) int8 (per-row scales over the n contraction)
    A_s: Array  # (m,) fp32


def quantize_rows(w: Array) -> Tuple[Array, Array]:
    """Symmetric per-row int8 quantization over the LAST axis.

    Returns (q int8 same shape, s fp32 shape w.shape[:-1]) with
    w ~= q * s[..., None]. All-zero rows get scale 0 (q is then 0 too,
    and dequantization reproduces the zeros exactly).
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-1)
    s = amax / 127.0
    q = jnp.round(w / jnp.maximum(s, _TINY)[..., None]).astype(jnp.int8)
    return q, s


def quantize_params(
    params: DLADMMParams, A: Array
) -> Tuple[QuantizedParams, QuantizedDict]:
    """Quantize a trained net + its dictionary for int8 serving."""
    W1_q, W1_s = quantize_rows(params.W1)
    W2_q, W2_s = quantize_rows(params.W2)
    A_q, A_s = quantize_rows(A)
    f32 = lambda v: v.astype(jnp.float32)
    return (
        QuantizedParams(
            W1_q,
            W1_s,
            W2_q,
            W2_s,
            f32(params.theta1),
            f32(params.theta2),
            f32(params.beta),
        ),
        QuantizedDict(A_q, A_s),
    )


def qdot(act: Array, w_q: Array, w_s: Array) -> Array:
    """act (S, in) fp32  x  w_q (out, in) int8  ->  (S, out) fp32.

    Dynamic per-sample activation quantization + int8 MXU dot + fp32
    dequantization (module docstring). Matches ops/reference.apply_dict's
    contraction layout (w's second axis — no transpose materialized).
    """
    s_act = jnp.max(jnp.abs(act), axis=-1, keepdims=True) / 127.0
    a_q = jnp.round(act / jnp.maximum(s_act, _TINY)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        a_q, w_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * s_act * w_s[None, :]


def dladmm_forward_int8(
    qp: QuantizedParams, qd: QuantizedDict, b: Array
) -> Tuple[Array, Array, Array]:
    """Full K-layer unroll with int8 dots (identity B, zero init).

    Same cached-Ax recurrence as ops/reference.dladmm_layer_step_cached:
    3 quantized matmuls per layer (u@W1ᵀ, x1@Aᵀ, v@W2ᵀ), fp32
    elementwise. Returns (x, z, lam) like models.unroll.dladmm_forward.
    """
    S = b.shape[0]
    n = qp.W1_q.shape[1]
    d = qp.W2_q.shape[1]
    b = b.astype(jnp.float32)
    x0 = jnp.zeros((S, n), jnp.float32)
    z0 = jnp.zeros((S, d), jnp.float32)
    lam0 = jnp.zeros_like(b)
    Ax0 = jnp.zeros_like(b)

    def body(carry, p):
        x, z, lam, Ax = carry
        W1_q, W1_s, W2_q, W2_s, th1, th2, beta = p
        beta = jnp.maximum(beta, _BETA_MIN)
        base = z - b + lam / beta  # B = I: Bz is z
        u = Ax + base
        x1 = shrink(x - qdot(u, W1_q, W1_s), th1)
        Ax1 = qdot(x1, qd.A_q, qd.A_s)
        v = Ax1 + base
        z1 = shrink(z - qdot(v, W2_q, W2_s), th2)
        lam1 = lam + beta * (Ax1 + z1 - b)
        return (x1, z1, lam1, Ax1), None

    (x, z, lam, _), _ = jax.lax.scan(body, (x0, z0, lam0, Ax0), tuple(qp))
    return x, z, lam


# ---------------------------------------------------------------------------
# int8 tiled megakernel (serving): the whole-unroll Pallas kernel of
# ops/pallas_unroll.py with int8 weights in VMEM and the s8 x s8 -> s32
# MXU path. Weights at 1 byte double the effective VMEM weight budget
# AND the MXU peak (v5e: 394 int8 vs 197 bf16 TOPS); the fp32 solver
# state stays VMEM-resident per batch tile exactly as in the fp32/bf16
# kernel. Opt-in via InferenceServer(dtype="int8", kernel="megakernel")
# — scripts/verify_tpu.py gates the Mosaic compile on real hardware
# (interpret-mode tests cannot see Mosaic-only failures — see
# tests/conftest.py note).
# ---------------------------------------------------------------------------

_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def int8_tile_batch(m: int, n: int, d: int, S: int):
    """Largest batch-tile for the int8 tile-outer megakernel (grid
    (S/bs, K)), or None. Same accounting as pallas_unroll's
    unroll_tile_batch with 1-byte weights/dictionary and fp32 state."""
    layer_w = n * m + d * m  # int8
    a_bytes = m * n  # int8
    scales = 4 * (n + d + m)

    def fits(bs, db):
        state = bs * (n + 3 * m + max(n, d)) * 4
        return (
            2 * layer_w + a_bytes + scales + db * state
            <= _VMEM_BUDGET_BYTES
        )

    if fits(S, 1):
        return S
    for bs in (4096, 2048, 1024, 512, 256, 128, 64):
        if S % bs or bs >= S:
            continue
        if fits(bs, 2):
            return bs
    return None


def _int8_unroll_kernel(
    # inputs
    b_ref,
    a_q_ref,  # (m, n) int8
    a_s_ref,  # (1, m) fp32
    w1_q_ref,  # (1, n, m) int8 — layer k's block
    w1_s_ref,  # (1, 1, n) fp32
    w2_q_ref,  # (1, d, m) int8
    w2_s_ref,  # (1, 1, d) fp32
    th1_ref,  # (1, 1, n)
    th2_ref,  # (1, 1, d)
    beta_ref,  # (K, 1) SMEM (32-bit scalars only)
    # outputs (constant index_map -> VMEM-resident across the unroll)
    x_ref,
    z_ref,
    lam_ref,
    ax_ref,
    *,
    k_axis: int = 0,
):
    import jax.experimental.pallas as pl

    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _init():
        x_ref[:] = jnp.zeros_like(x_ref)
        z_ref[:] = jnp.zeros_like(z_ref)
        lam_ref[:] = jnp.zeros_like(lam_ref)
        ax_ref[:] = jnp.zeros_like(ax_ref)

    def qdot_t(act, w_q, w_s):
        # Dynamic per-sample activation quantization (module docstring):
        # the row max is exactly representable, the dot is exact int32.
        s_act = jnp.max(jnp.abs(act), axis=-1, keepdims=True) * (1.0 / 127.0)
        a_q = jnp.round(act / jnp.maximum(s_act, _TINY)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a_q,
            w_q,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * s_act * w_s

    beta = jnp.maximum(beta_ref[k, 0], _BETA_MIN)
    z = z_ref[:]
    lam = lam_ref[:]
    b = b_ref[:]
    base = z - b + lam * (1.0 / beta)
    u = ax_ref[:] + base
    th1 = jnp.maximum(th1_ref[0], 0.0)
    p1 = x_ref[:] - qdot_t(u, w1_q_ref[0], w1_s_ref[0])
    x1 = jnp.sign(p1) * jnp.maximum(jnp.abs(p1) - th1, 0.0)
    ax1 = qdot_t(x1, a_q_ref[:], a_s_ref[:])
    v = ax1 + base
    th2 = jnp.maximum(th2_ref[0], 0.0)
    p2 = z - qdot_t(v, w2_q_ref[0], w2_s_ref[0])
    z1 = jnp.sign(p2) * jnp.maximum(jnp.abs(p2) - th2, 0.0)
    x_ref[:] = x1
    z_ref[:] = z1
    lam_ref[:] = lam + beta * (ax1 + z1 - b)
    ax_ref[:] = ax1


def dladmm_forward_int8_pallas(
    qp: QuantizedParams,
    qd: QuantizedDict,
    b: Array,
    *,
    interpret=None,
):
    """int8 whole-unroll megakernel forward: (x, z, lam), fp32.

    Bit-identical math to dladmm_forward_int8 (same quantization
    decisions, exact int32 dots, same fp32 elementwise chain) — parity
    pinned in tests/test_serve.py; the Mosaic compile itself is gated by
    scripts/verify_tpu.py on real hardware. interpret=None follows the
    package convention: interpret off only on a real TPU backend.
    """
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K, n, m = qp.W1_q.shape
    d = qp.W2_q.shape[1]
    S = b.shape[0]
    b = b.astype(jnp.float32)
    th1 = jnp.broadcast_to(
        qp.theta1.reshape(K, 1, -1).astype(jnp.float32), (K, 1, n)
    )
    th2 = jnp.broadcast_to(
        qp.theta2.reshape(K, 1, -1).astype(jnp.float32), (K, 1, d)
    )
    beta = qp.beta.reshape(K, 1).astype(jnp.float32)
    w1_s = qp.W1_s.reshape(K, 1, n).astype(jnp.float32)
    w2_s = qp.W2_s.reshape(K, 1, d).astype(jnp.float32)
    a_s = qd.A_s.reshape(1, m).astype(jnp.float32)

    bs = int8_tile_batch(m, n, d, S)
    if bs is None:
        raise ValueError(
            f"no int8 megakernel tile fits VMEM for m={m} n={n} S={S}"
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
    whole = lambda *dims: pl.BlockSpec(
        dims,
        (lambda k: (0,) * len(dims))
        if n_tiles == 1
        else (lambda ps, k: (0,) * len(dims)),
        memory_space=pltpu.VMEM,
    )

    x, z, lam, _ = pl.pallas_call(
        functools.partial(_int8_unroll_kernel, k_axis=k_axis),
        grid=grid,
        in_specs=[
            tile(bs, m),  # b
            whole(m, n),  # A_q
            whole(1, m),  # A_s
            per_layer(n, m),  # W1_q
            per_layer(1, n),  # W1_s
            per_layer(d, m),  # W2_q
            per_layer(1, d),  # W2_s
            per_layer(1, n),  # th1
            per_layer(1, d),  # th2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (K, 1)
        ],
        out_specs=[tile(bs, n), tile(bs, d), tile(bs, m), tile(bs, m)],
        out_shape=[
            jax.ShapeDtypeStruct((S, n), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, m), jnp.float32),
            jax.ShapeDtypeStruct((S, m), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * m * (2 * n + d) * K,
            bytes_accessed=n_tiles * K * (n * m + d * m)
            + m * n
            + S * (2 * n + 2 * d + 3 * m) * 4,
            transcendentals=0,
        ),
    )(b, qd.A_q, a_s, qp.W1_q, w1_s, qp.W2_q, w2_s, th1, th2, beta)
    return x, z, lam
