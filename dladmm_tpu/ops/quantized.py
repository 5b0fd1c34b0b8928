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
