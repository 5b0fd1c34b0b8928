"""Reduced-precision Adam moments — targeting the optimizer-phase HBM
sweep (docs/DESIGN.md §9: the flagship step's 1.61 ms Adam tail is the
~1.3 GB fp32 master/moment sweep at ~80% of HBM bandwidth; the moments
are 2/3 of that state traffic).

The reference has no counterpart (single-GPU torch.optim.Adam —
SURVEY.md §3.1 training-loop row); this is TPU-native scope: the Adam
update is purely bandwidth-bound, so shrinking the stored moments is the
only remaining lever the measured frontier left open. Masters stay fp32
(required by the quality recipes — DESIGN.md §9), the update math runs
in fp32; only the *stored* first/second moments shrink:

  moment_dtype="bfloat16"     mu/nu stored bf16         (2x less moment HBM)
  moment_dtype="bfloat16_sr"  bf16 + stochastic rounding (unbiased EMA)
  moment_dtype="int8"         blockwise-companded int8  (4x less moment HBM)

int8 scheme (per moment leaf, flattened):
  * blocks of 256 values share one fp32 absmax scale (0.4% overhead);
  * within a block, values are normalized to [-1, 1] and companded with
    a signed square root before rounding to int8 — sign(y) * sqrt(|y|)
    spends code points where small magnitudes live, so a block whose
    values span orders of magnitude (typical for nu) keeps ~2 decimal
    digits of relative resolution at 1% of absmax instead of losing
    those values entirely to linear truncation. Decode is the exact
    inverse: sign(c) * (c/127)^2 * absmax.

This is the same design space as blockwise 8-bit optimizers (Dettmers et
al., "8-bit Optimizers via Block-wise Quantization" — PAPERS.md class of
techniques); the compander here is an analytic sqrt map instead of a
lookup-table code so the (de)quantization stays a fused elementwise VPU
op inside the Adam sweep, costing arithmetic where the op is
bandwidth-bound.

Quality is recipe-dependent: the round-1 frontier measured *naive* bf16
moments harmful on the then-current recipe; this module exists to
re-measure properly (full 10k-step recipes, both synthetic shapes) with
the A/B harness — results recorded in BASELINE.md. Opt-in via
TrainConfig.moment_dtype until parity is shown.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

BLOCK = 256


class QTensor(NamedTuple):
    """Blockwise-companded int8 tensor: codes (nblocks, BLOCK) int8 +
    per-block fp32 absmax scales. Scales are stored 1-D (nblocks,) —
    on TPU a (N, 1) array is lane-padded to (N, 128) physically (the
    T(8,128) tiling), a 128x HBM/VMEM bloat the round-4 kernel work
    measured; 1-D arrays tile compactly. (The fused kernel's per-row
    codec packs them (ceil(R/128), 128) instead — train/qadam_pallas.)
    The logical shape/size is carried by the matching parameter leaf at
    decode time."""

    codes: Array  # int8 (nblocks, BLOCK)
    scale: Array  # float32 (nblocks,) — or lane-packed 2D (kernel codec)


def quantize_q8(x: Array, block: int = BLOCK) -> QTensor:
    """fp32 array (any shape) -> QTensor (flattened, zero-padded)."""
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    scale = jnp.where(absmax > 0.0, absmax, 1.0)
    y = blocks / scale[:, None]
    c = jnp.sign(y) * jnp.sqrt(jnp.abs(y))
    return QTensor(
        jnp.round(c * 127.0).astype(jnp.int8), scale.astype(jnp.float32)
    )


def dequantize_q8(q: QTensor, shape) -> Array:
    """QTensor -> fp32 array of ``shape`` (inverse of quantize_q8 up to
    the int8 rounding)."""
    c = q.codes.astype(jnp.float32) / 127.0
    y = jnp.sign(c) * c * c * q.scale[:, None]
    size = 1
    for s in shape:
        size *= s
    return y.reshape(-1)[:size].reshape(shape)


class QMomentsState(NamedTuple):
    count: Array
    mu: Any  # pytree: QTensor leaves (int8) or bf16 arrays (bfloat16*)
    nu: Any
    key: Any = None  # PRNG key ("bfloat16_sr" only)


def sr_bfloat16(x: Array, key: Array) -> Array:
    """fp32 -> bf16 with stochastic rounding: add 16 random bits below
    the bf16 mantissa boundary, then truncate. Unbiased in expectation —
    round-to-nearest bf16 EMAs silently absorb updates smaller than
    ~0.4% of the running value (b1=0.9 makes that any grad < ~0.04*mu),
    which is the truncation bias behind naive-bf16 moments' measured
    quality cost (BASELINE.md)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    hi = ((u + r) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def _encode(tree, moment_dtype, key=None):
    if moment_dtype == "int8":
        return jax.tree.map(quantize_q8, tree)
    if moment_dtype == "bfloat16_sr" and key is not None:
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(
            treedef, [sr_bfloat16(v, k) for v, k in zip(leaves, keys)]
        )
    return jax.tree.map(lambda v: v.astype(jnp.bfloat16), tree)


def _decode(tree, like, moment_dtype):
    if moment_dtype == "int8":
        return jax.tree.map(
            lambda q, g: dequantize_q8(q, g.shape),
            tree,
            like,
            is_leaf=lambda v: isinstance(v, QTensor),
        )
    return jax.tree.map(lambda v: v.astype(jnp.float32), tree)


def scale_by_adam_qmoments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: str = "bfloat16",
) -> optax.GradientTransformation:
    """optax.scale_by_adam with reduced-precision stored moments.

    Update math (moment EMAs, bias correction, mu_hat/(sqrt(nu_hat)+eps))
    is op-identical to optax's in fp32; only the state representation
    differs. Chain with optax.scale_by_learning_rate like scale_by_adam.
    """
    if moment_dtype not in ("bfloat16", "bfloat16_sr", "int8"):
        raise ValueError(
            "moment_dtype must be 'bfloat16', 'bfloat16_sr', or 'int8', "
            f"got {moment_dtype!r} (float32 is plain optax.adam)"
        )
    sr = moment_dtype == "bfloat16_sr"

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        return QMomentsState(
            count=jnp.zeros((), jnp.int32),
            # Zeros are exact in every storage format — no SR key needed
            # at init (and init must stay deterministic for templates).
            mu=_encode(zeros, "bfloat16" if sr else moment_dtype),
            nu=_encode(zeros, "bfloat16" if sr else moment_dtype),
            key=jax.random.PRNGKey(17) if sr else None,
        )

    def update_fn(updates, state, params=None):
        del params
        mu = _decode(state.mu, updates, moment_dtype)
        nu = _decode(state.nu, updates, moment_dtype)
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g.astype(jnp.float32),
            mu,
            updates,
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            nu,
            updates,
        )
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        if sr:
            key, kmu, knu = jax.random.split(state.key, 3)
        else:
            key = kmu = knu = None
        return out, QMomentsState(
            count=count,
            mu=_encode(mu, moment_dtype, kmu),
            nu=_encode(nu, moment_dtype, knu),
            key=key,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_qmoments(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: str = "bfloat16",
) -> optax.GradientTransformation:
    """Drop-in optax.adam(learning_rate) with reduced-precision moments."""
    return optax.chain(
        scale_by_adam_qmoments(b1, b2, eps, moment_dtype),
        optax.scale_by_learning_rate(learning_rate),
    )


__all__ = [
    "BLOCK",
    "QTensor",
    "QMomentsState",
    "quantize_q8",
    "dequantize_q8",
    "scale_by_adam_qmoments",
    "adam_qmoments",
]
