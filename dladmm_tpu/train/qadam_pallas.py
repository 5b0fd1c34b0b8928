"""One-HBM-pass fused Adam sweep (Pallas TPU kernel) with selectable
moment storage precision.

Why a kernel: DESIGN.md §9's step decomposition pins the flagship
optimizer phase on the master/moment HBM sweep, and round 4 measured
that blockwise-int8 moments through XLA cost +5 ms — the
decode→EMA→absmax→requant chain does not fuse (XLA materializes the
fp32 intermediates), inverting the traffic win. This kernel performs
the ENTIRE optimizer application in one pass over each parameter leaf:

    read   g (grad), master (fp32), mu, nu (stored precision)
    compute clip-scaled Adam update in fp32 (op-identical to optax)
    write  master', bf16 compute copy, mu', nu' (stored precision)

so every byte of optimizer state is touched exactly once per step, with
the (de)quantization arithmetic riding the VPU where the op is
bandwidth-bound. Moment formats: float32 (plain fused sweep), bfloat16,
and blockwise sqrt-companded int8. The int8 format shares
train/qmoments.py's QTensor container and sqrt compander, but NOT its
state geometry for kernel-eligible leaves: this kernel stores per-ROW
(R, L) codes with lane-packed (ceil(R/128), 128) scales, while qmoments
stores flat (nblocks, 256) codes with 1-D scales — so a checkpoint
trained with moment_dtype="int8" does NOT resume as "int8_pallas" (or
vice versa); the optimizer-state templates differ by design (the row
codec keeps the leaf's natural HBM tiling).

The reference has no counterpart (torch.optim.Adam on one GPU —
SURVEY.md §3.1); this is TPU-native scope per the north star's
performance mandate. Integration: train.loop._build_optimizer returns a
QAdamFusedPallas for moment_dtype="*_pallas"; step builders call
.fused_apply when present, generic callers (greedy, ZeRO-1) use the
optax-compatible .update reference path (same math, XLA-fused).

Kernels run in interpret mode off-TPU (package convention); Mosaic
compilation is gated on real hardware by scripts/verify_tpu.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dladmm_tpu.train.qmoments import (
    BLOCK,
    QMomentsState,
    QTensor,
    dequantize_q8,
    quantize_q8,
)

# Default rows-per-grid-step for the legacy flat view (kept for the
# chunk_rows override surface); the kernel normally derives its chunk
# from a ~0.5 MB/operand budget on the leaf's natural (R, last) view —
# see _auto_chunk_rows and leaf_eligible for why the view matters.
CHUNK_ROWS = 512
# Leaves smaller than this (or not BLOCK-divisible) take the jnp path —
# thresholds/beta stacks are KB-sized; the kernel exists for the 40M/20M
# element weight stacks.
MIN_PALLAS_ELEMS = 1 << 16
# Widest last-dim the kernel accepts: the minimum grid chunk is 128 rows
# (lane-packed scale slices), and the fp32 variant moves ~30 bytes/elem
# of row-block operands, double-buffered — so a 128-row chunk of a leaf
# wider than this blows the ~12 MB scoped-VMEM budget (Mosaic OOMs
# instead of erroring usefully — ADVICE r4 #4). Wider leaves take the
# jnp path; current model shapes top out at L=1000.
MAX_PALLAS_LASTDIM = (12 << 20) // (60 * 128)  # = 1638

# Dense moment formats: fmt -> (mu dtype, nu dtype, SR mu?, SR nu?).
# "bfloat16_sr_mu" is the round-5 mixed format: SR-bf16 mu + fp32 nu —
# the flagship SR quality gap (-0.20 dB, BASELINE.md round-4) was
# hypothesized to live in nu's sub-ULP EMA updates, so nu keeps fp32
# while mu takes the 2x byte cut. int8 is handled by its own kernel.
_DENSE_FMTS = {
    "float32": (jnp.float32, jnp.float32, False, False),
    "bfloat16": (jnp.bfloat16, jnp.bfloat16, False, False),
    "bfloat16_sr": (jnp.bfloat16, jnp.bfloat16, True, True),
    "bfloat16_sr_mu": (jnp.bfloat16, jnp.float32, True, False),
}


def _in8_decode(codes, scale):
    c = codes.astype(jnp.float32) * (1.0 / 127.0)
    return jnp.sign(c) * c * c * scale


def _in8_encode(x):
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0.0, absmax, 1.0)
    y = x / scale
    c = jnp.sign(y) * jnp.sqrt(jnp.abs(y))
    return jnp.round(c * 127.0).astype(jnp.int8), scale


def _mix_seed(count, idx: int):
    """Hash-mix (step count, leaf index) into one int32 kernel seed.

    uint32 arithmetic wraps modularly, so there is no silent int32
    overflow (the old `count * 1000003 + idx * 8191` form overflowed
    from step ~2147); the xor-shift/multiply finalizer spreads nearby
    (count, idx) pairs across the word. The kernel adds program_id so
    grid steps within a leaf get distinct streams. Distinctness across
    (step, leaf, grid-step) triples is hash-quality, not a guarantee."""
    s = count.astype(jnp.uint32) + jnp.uint32(((idx + 1) * 0x9E3779B9) & 0xFFFFFFFF)
    s = s ^ (s >> 16)
    s = s * jnp.uint32(0x7FEB352D)
    s = s ^ (s >> 15)
    s = s * jnp.uint32(0x846CA68B)
    s = s ^ (s >> 16)
    return jax.lax.bitcast_convert_type(s, jnp.int32)


def _adam_core(g, mu, nu, c1, c2, clip_scale, b1, b2, eps):
    """Shared fp32 update math (c1/c2 = bias corrections, clip_scale =
    global-norm clip factor — all traced scalars)."""
    g = g.astype(jnp.float32) * clip_scale
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * g * g
    upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
    return mu, nu, upd


def _make_kernel_int8(b1, b2, eps, emit_copy, copy_dtype, cr):
    """Scale interface: per-chunk (cr, 1) column strips. Two designs
    that avoid the strips were measured/attempted and rejected:
    a VMEM-resident (Rpad, 1) vector OOMs scoped VMEM (lane-padded x128
    physically = 20 MB for the flagship W1 leaf), and a lane-packed
    (rows/128, 128) resident array needs an in-kernel (n,128)->(cr,1)
    shape cast Mosaic does not support ("infer-vector-layout:
    unsupported shape cast"). The strips' tiny DMAs cost ~0.2-0.3 ms on
    the flagship shape — accepted; int8 moments are the optimizer-
    footprint option, bf16 the speed option (BASELINE.md round-4)."""
    del cr

    def kernel(
        scal_ref,
        g_ref,
        master_ref,
        mu_c_ref,
        mu_s_ref,
        nu_c_ref,
        nu_s_ref,
        master_o,
        mu_c_o,
        mu_s_o,
        nu_c_o,
        nu_s_o,
        *rest,
    ):
        # SMEM permits scalar loads only (Mosaic) — no vector reads.
        c1, c2 = scal_ref[0, 0], scal_ref[0, 1]
        lr, cs = scal_ref[0, 2], scal_ref[0, 3]
        mu = _in8_decode(mu_c_ref[:], mu_s_ref[:])
        nu = _in8_decode(nu_c_ref[:], nu_s_ref[:])
        mu, nu, upd = _adam_core(
            g_ref[:], mu, nu, c1, c2, cs, b1, b2, eps
        )
        new_master = master_ref[:] - lr * upd
        master_o[:] = new_master
        if emit_copy:
            rest[0][:] = new_master.astype(copy_dtype)
        mu_c, mu_s = _in8_encode(mu)
        nu_c, nu_s = _in8_encode(nu)
        mu_c_o[:] = mu_c
        nu_c_o[:] = nu_c
        mu_s_o[:] = mu_s
        nu_s_o[:] = nu_s

    return kernel


def _make_kernel_dense(
    b1, b2, eps, emit_copy, copy_dtype, mu_dtype, nu_dtype,
    sr_mu=False, sr_nu=False,
):
    """sr_mu/sr_nu store that moment with STOCHASTIC rounding from the
    on-core PRNG — unbiased EMA writes at VPU cost (the XLA-side SR
    variant pays +2.6 ms/step for threefry bits; the hardware PRNG is
    ~free where the sweep is bandwidth-bound). Takes an extra SMEM seed
    input when any SR is on, re-seeded per grid step for distinct
    streams. Per-moment dtypes support the mixed format ("bfloat16_sr_mu"
    = SR-bf16 mu + fp32 nu): nu's EMA updates are (1-b2)=0.1% relative —
    BELOW one bf16 ULP — so nu is where the measured SR quality tail
    lives, while mu's 10%-scale updates tolerate bf16 fine."""
    any_sr = sr_mu or sr_nu

    def kernel(scal_ref, *refs):
        if any_sr:
            seed_ref, g_ref, master_ref, mu_ref, nu_ref, *outs = refs
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        else:
            g_ref, master_ref, mu_ref, nu_ref, *outs = refs
        master_o, mu_o, nu_o, *rest = outs
        c1, c2 = scal_ref[0, 0], scal_ref[0, 1]
        lr, cs = scal_ref[0, 2], scal_ref[0, 3]
        mu = mu_ref[:].astype(jnp.float32)
        nu = nu_ref[:].astype(jnp.float32)
        mu, nu, upd = _adam_core(
            g_ref[:], mu, nu, c1, c2, cs, b1, b2, eps
        )
        new_master = master_ref[:] - lr * upd
        master_o[:] = new_master
        if emit_copy:
            rest[0][:] = new_master.astype(copy_dtype)

        def store(x, dt, sr):
            if not sr:
                return x.astype(dt)
            return pltpu.stochastic_round(
                x,
                pltpu.bitcast(
                    pltpu.prng_random_bits(x.shape), jnp.uint32
                ),
                target_dtype=dt,
            )

        mu_o[:] = store(mu, mu_dtype, sr_mu)
        nu_o[:] = store(nu, nu_dtype, sr_nu)

    return kernel


def _rows_spec(i):
    return (i, 0)


def leaf_eligible(leaf) -> bool:
    """Kernel path: >= 2-D leaves of kernel-worthwhile size whose LAST
    dim is lane-aligned enough. The 2-D (R, last) view merges leading
    dims only — a tiling-preserving (free) reshape on TPU, unlike the
    flat (size/256, 256) view, which crosses the (8,128) HBM tiling and
    made XLA materialize full relayout copies of every operand (the
    round-4 tuner measured the kernel at 1/3 bandwidth because of them,
    invariant to chunk size: `bench_out/tune_qadam_r4.json`)."""
    return (
        leaf.ndim >= 2
        and leaf.size >= MIN_PALLAS_ELEMS
        and 128 <= leaf.shape[-1] <= MAX_PALLAS_LASTDIM  # VMEM budget
        and leaf.size // leaf.shape[-1] >= 128  # packed-scale geometry
    )


def _auto_chunk_rows(R: int, L: int) -> int:
    """Rows per grid step: ~0.5 MB of fp32 per operand (7 operands
    double-buffered stays well inside the 16 MB scoped-VMEM budget),
    in multiples of 128 so the lane-packed scale slices stay exact."""
    cr = max(128, ((1 << 19) // (L * 4)) // 128 * 128)
    return min(cr, R // 128 * 128)


def _pack_scale(scale_col: Array, rows_pad: int) -> Array:
    """(R, 1) per-row scales -> lane-packed (rows_pad/128, 128). A
    (R, 1) f32 array is physically lane-padded x128 by the T(8,128)
    tiling (20 MB for the flagship W1 leaf!); packed it is the true
    160 KB and rides VMEM whole."""
    flat = scale_col.reshape(-1)
    if rows_pad != flat.size:
        flat = jnp.concatenate(
            [flat, jnp.ones((rows_pad - flat.size,), flat.dtype)]
        )
    return flat.reshape(-1, 128)


def _unpack_scale(packed: Array, R: int) -> Array:
    return packed.reshape(-1)[:R, None]


def _scale_rows_pad(R: int) -> int:
    return pl.cdiv(R, 128) * 128


def quantize_rows(x2d: Array) -> QTensor:
    """Per-ROW blockwise sqrt-companded int8 on a (R, L) view — the
    fused kernel's storage codec (one scale per row, lane-packed to
    (ceil(R/128), 128); same compander as train/qmoments.quantize_q8,
    different geometry so the state keeps the leaf's natural HBM
    tiling)."""
    codes, scale = _in8_encode(x2d.astype(jnp.float32))
    return QTensor(codes, _pack_scale(scale, _scale_rows_pad(codes.shape[0])))


def dequantize_rows(q: QTensor) -> Array:
    return _in8_decode(q.codes, _unpack_scale(q.scale, q.codes.shape[0]))


def _leaf_apply_pallas(
    g,
    master,
    mu,
    nu,
    scal,
    *,
    fmt,
    b1,
    b2,
    eps,
    copy_dtype,
    interpret,
    chunk_rows=None,
    dims=None,
    seed=None,
):
    """Fused apply for one eligible leaf (natural (R, last) view).
    Returns (master', copy'|None, mu', nu') with mu/nu stored."""
    if fmt in ("bfloat16_sr", "bfloat16_sr_mu") and interpret:
        # The Mosaic PRNG primitives have no CPU-interpret lowering;
        # emulate with the XLA-side stochastic rounder (different RNG
        # stream, same distributional semantics — CPU runs are tests,
        # not perf).
        from dladmm_tpu.train.qmoments import sr_bfloat16

        m2, copy, mu_f, nu_f = _leaf_apply_jnp(
            g,
            master,
            mu.astype(jnp.float32),
            nu.astype(jnp.float32),
            scal,
            fmt="float32",
            b1=b1,
            b2=b2,
            eps=eps,
            copy_dtype=copy_dtype,
        )
        kmu, knu = jax.random.split(jax.random.PRNGKey(seed))
        nu_s = nu_f if fmt == "bfloat16_sr_mu" else sr_bfloat16(nu_f, knu)
        return m2, copy, sr_bfloat16(mu_f, kmu), nu_s
    compiler_params = (
        pltpu.CompilerParams(dimension_semantics=(dims,)) if dims else None
    )
    shape = master.shape
    L = shape[-1]
    R = master.size // L
    g2 = g.reshape(R, L)
    m2 = master.reshape(R, L)
    cr = chunk_rows or _auto_chunk_rows(R, L)
    grid = (pl.cdiv(R, cr),)
    row = pl.BlockSpec((cr, L), _rows_spec, memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((cr, 1), _rows_spec, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
    emit_copy = copy_dtype is not None
    copy_shape = (
        [jax.ShapeDtypeStruct((R, L), copy_dtype)] if emit_copy else []
    )
    if fmt == "int8":
        def expand(packed):
            # Compact lane-packed state -> the (R, 1) column the strip
            # interface consumes (physically lane-padded in HBM; the
            # expansion/repack relayouts are the accepted cost — see
            # _make_kernel_int8's docstring).
            return _unpack_scale(packed, R)

        kern = _make_kernel_int8(b1, b2, eps, emit_copy, copy_dtype, cr)
        sfull = srow
        # Alias state inputs onto their outputs: without this, the
        # train step's while-loop carry cannot reuse buffers across a
        # custom call and XLA inserts full copies of master/moments
        # every step (profiled at ~0.9 ms on the flagship shape). The
        # grad buffer is dead after the sweep — alias it onto the bf16
        # copy when the dtypes line up.
        aliases = {2: 0, 3: 1, 4: 2, 5: 3, 6: 4}
        if emit_copy and g2.dtype == copy_dtype:
            aliases[1] = 5
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem, row, row, row, sfull, row, sfull],
            out_specs=[row, row, sfull, row, sfull] + [row] * emit_copy,
            out_shape=[
                jax.ShapeDtypeStruct((R, L), jnp.float32),
                jax.ShapeDtypeStruct((R, L), jnp.int8),
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, L), jnp.int8),
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
            ]
            + copy_shape,
            interpret=interpret,
            input_output_aliases=aliases,
            **({"compiler_params": compiler_params} if compiler_params else {}),
        )(
            scal,
            g2,
            m2,
            mu.codes,
            expand(mu.scale),
            nu.codes,
            expand(nu.scale),
        )
        new_master, mu_c, mu_s, nu_c, nu_s = outs[:5]
        copy = outs[5] if emit_copy else None
        spr = _scale_rows_pad(R)
        mu_n = QTensor(mu_c, _pack_scale(mu_s, spr))
        nu_n = QTensor(nu_c, _pack_scale(nu_s, spr))
    else:
        mu_dt, nu_dt, sr_mu, sr_nu = _DENSE_FMTS[fmt]
        kern = _make_kernel_dense(
            b1, b2, eps, emit_copy, copy_dtype, mu_dt, nu_dt,
            sr_mu=sr_mu, sr_nu=sr_nu,
        )
        operands = [scal]
        in_specs = [smem]
        if sr_mu or sr_nu:
            operands.append(
                jnp.asarray(seed, jnp.int32).reshape(1, 1)
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                )
            )
        off = len(operands)  # index of g among the inputs
        operands += [g2, m2, mu.reshape(R, L), nu.reshape(R, L)]
        in_specs += [row, row, row, row]
        aliases = {off + 1: 0, off + 2: 1, off + 3: 2}
        if emit_copy and g2.dtype == copy_dtype:
            aliases[off] = 3
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=[row, row, row] + [row] * emit_copy,
            out_shape=[
                jax.ShapeDtypeStruct((R, L), jnp.float32),
                jax.ShapeDtypeStruct((R, L), mu_dt),
                jax.ShapeDtypeStruct((R, L), nu_dt),
            ]
            + copy_shape,
            interpret=interpret,
            input_output_aliases=aliases,
            **({"compiler_params": compiler_params} if compiler_params else {}),
        )(*operands)
        new_master, mu2, nu2 = outs[:3]
        copy = outs[3] if emit_copy else None
        mu_n = mu2.reshape(shape)
        nu_n = nu2.reshape(shape)
    return (
        new_master.reshape(shape),
        None if copy is None else copy.reshape(shape),
        mu_n,
        nu_n,
    )


def _leaf_apply_jnp(
    g, master, mu, nu, scal, *, fmt, b1, b2, eps, copy_dtype, seed=None
):
    """Reference path for small / non-divisible leaves: identical math,
    XLA-fused (these leaves are KB-sized, traffic is irrelevant).
    fmt="bfloat16_sr" stores via the XLA-side stochastic rounder (seed
    required) — same unbiased-EMA semantics as the kernel, different RNG
    stream."""
    if fmt == "int8":
        mu_f = dequantize_q8(mu, master.shape)
        nu_f = dequantize_q8(nu, master.shape)
    else:
        mu_f, nu_f = mu.astype(jnp.float32), nu.astype(jnp.float32)
    mu_f, nu_f, upd = _adam_core(
        g, mu_f, nu_f, scal[0, 0], scal[0, 1], scal[0, 3], b1, b2, eps
    )
    new_master = master - scal[0, 2] * upd
    copy = None if copy_dtype is None else new_master.astype(copy_dtype)
    if fmt == "int8":
        mu_n, nu_n = quantize_q8(mu_f), quantize_q8(nu_f)
    elif fmt in ("bfloat16_sr", "bfloat16_sr_mu"):
        from dladmm_tpu.train.qmoments import sr_bfloat16

        kmu, knu = jax.random.split(jax.random.PRNGKey(seed))
        mu_n = sr_bfloat16(mu_f, kmu)
        nu_n = nu_f if fmt == "bfloat16_sr_mu" else sr_bfloat16(nu_f, knu)
    else:
        dt = jnp.float32 if fmt == "float32" else jnp.bfloat16
        mu_n, nu_n = mu_f.astype(dt), nu_f.astype(dt)
    return new_master, copy, mu_n, nu_n


@dataclasses.dataclass(frozen=True)
class QAdamFusedPallas:
    """Fused-sweep Adam with moment_fmt in {float32, bfloat16, int8}.

    Duck-types the optax surface (init/update) for generic callers;
    step builders use .fused_apply(grads, state, params, compute_dtype)
    for the one-pass kernel that also writes the master update and the
    bf16 compute copy. Exact global-norm clipping is applied via a
    scalar clip-scale computed from the grads (one cheap reduction
    pass); the sweep itself stays single-pass.
    """

    learning_rate: Any  # float or optax schedule
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    moment_fmt: str = "float32"
    clip_norm: Optional[float] = None
    interpret: Optional[bool] = None
    chunk_rows: Optional[int] = None  # grid chunk (rows of 256); tuning knob
    dims: Optional[str] = None  # dimension_semantics override; tuning knob

    def __post_init__(self):
        if self.moment_fmt not in (
            "float32",
            "bfloat16",
            "bfloat16_sr",
            "bfloat16_sr_mu",
            "int8",
        ):
            raise ValueError(
                "moment_fmt must be float32|bfloat16|bfloat16_sr|"
                f"bfloat16_sr_mu|int8, got {self.moment_fmt!r}"
            )

    # -- optax-compatible surface ---------------------------------------

    def _enc_zero(self, p, moment="mu"):
        """Fresh zero moment for one leaf, in the stored format. int8
        eligible leaves use the per-ROW codec on the (R, last) view —
        the geometry the kernel's state keeps (leaf_eligible); others
        use the flat-256 codec. The mixed "bfloat16_sr_mu" format stores
        mu bf16 and nu fp32 (_DENSE_FMTS)."""
        z = jnp.zeros(p.shape, jnp.float32)
        if self.moment_fmt == "int8":
            if leaf_eligible(p):
                return quantize_rows(z.reshape(-1, p.shape[-1]))
            return quantize_q8(z)
        dt = _DENSE_FMTS[self.moment_fmt][0 if moment == "mu" else 1]
        return z.astype(dt)

    def init(self, params):
        # Fresh arrays per call of _enc_zero: mu and nu must NOT alias
        # the same buffers (donating jits would donate one twice).
        return QMomentsState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: self._enc_zero(p, "mu"), params),
            nu=jax.tree.map(lambda p: self._enc_zero(p, "nu"), params),
            key=None,
        )

    def _lr(self, count):
        if callable(self.learning_rate):
            return self.learning_rate(count).astype(jnp.float32)
        return jnp.asarray(self.learning_rate, jnp.float32)

    def _scalars(self, grads, state):
        """[c1, c2, lr, clip_scale] as a (1, 4) fp32 array."""
        count = state.count + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - self.b1 ** cf
        c2 = 1.0 - self.b2 ** cf
        lr = self._lr(state.count)
        if self.clip_norm is not None:
            norm = optax.global_norm(grads).astype(jnp.float32)
            scale = jnp.minimum(
                1.0, self.clip_norm / jnp.maximum(norm, 1e-16)
            )
        else:
            scale = jnp.float32(1.0)
        return jnp.stack([c1, c2, lr, scale]).reshape(1, 4), count

    def update(self, grads, state, params=None):
        """optax semantics: returns (updates, new_state); updates are
        the NEGATED scaled step (apply with optax.apply_updates)."""
        del params
        scal, count = self._scalars(grads, state)

        # Reference math without the master fold (generic callers own
        # apply_updates): decode, EMA, bias-correct, re-encode. Codec
        # per leaf mirrors init/fused_apply (leaf_eligible).
        def leaf(g, mu, nu, idx):
            rows = self.moment_fmt == "int8" and leaf_eligible(g)
            if rows:
                mu_f = dequantize_rows(mu).reshape(g.shape)
                nu_f = dequantize_rows(nu).reshape(g.shape)
            elif self.moment_fmt == "int8":
                mu_f = dequantize_q8(mu, g.shape)
                nu_f = dequantize_q8(nu, g.shape)
            else:
                mu_f, nu_f = (
                    mu.astype(jnp.float32),
                    nu.astype(jnp.float32),
                )
            mu_f, nu_f, upd = _adam_core(
                g,
                mu_f,
                nu_f,
                scal[0, 0],
                scal[0, 1],
                scal[0, 3],
                self.b1,
                self.b2,
                self.eps,
            )
            if rows:
                L = g.shape[-1]
                mu_n = quantize_rows(mu_f.reshape(-1, L))
                nu_n = quantize_rows(nu_f.reshape(-1, L))
            elif self.moment_fmt == "int8":
                mu_n, nu_n = quantize_q8(mu_f), quantize_q8(nu_f)
            elif self.moment_fmt in ("bfloat16_sr", "bfloat16_sr_mu"):
                # Honor the SR semantics the caller selected (unbiased
                # EMA writes) on the generic path too — via the XLA-side
                # stochastic rounder, seeded from (count, leaf). Slower
                # than the kernel's hardware PRNG (threefry bits cost
                # ~+2.6 ms/step at the flagship shape — BASELINE.md),
                # but a silent round-to-nearest downgrade here would
                # reintroduce exactly the truncation bias the user opted
                # out of (ADVICE r4 #1).
                from dladmm_tpu.train.qmoments import sr_bfloat16

                kmu, knu = jax.random.split(
                    jax.random.PRNGKey(_mix_seed(count, idx))
                )
                mu_n = sr_bfloat16(mu_f, kmu)
                nu_n = (
                    nu_f
                    if self.moment_fmt == "bfloat16_sr_mu"
                    else sr_bfloat16(nu_f, knu)
                )
            else:
                dt = (
                    jnp.float32
                    if self.moment_fmt == "float32"
                    else jnp.bfloat16
                )
                mu_n, nu_n = mu_f.astype(dt), nu_f.astype(dt)
            return (-scal[0, 2] * upd).astype(g.dtype), mu_n, nu_n

        flat_g, treedef = jax.tree.flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        res = [
            leaf(g, mu, nu, i)
            for i, (g, mu, nu) in enumerate(zip(flat_g, flat_mu, flat_nu))
        ]
        updates = treedef.unflatten([r[0] for r in res])
        mu_n = treedef.unflatten([r[1] for r in res])
        nu_n = treedef.unflatten([r[2] for r in res])
        return updates, QMomentsState(
            count=count, mu=mu_n, nu=nu_n, key=None
        )

    # -- fused path ------------------------------------------------------

    def fused_apply(self, grads, state, params, compute_dtype=None):
        """One-pass kernel apply: returns (params', state',
        compute_params'|None). params must be the fp32 masters."""
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        scal, count = self._scalars(grads, state)

        def leaf(g, master, mu, nu, idx):
            # SR streams: hash-mixed per (step, leaf) — the kernel adds
            # program_id per grid step; deterministic given the count.
            seed = _mix_seed(count, idx)
            if leaf_eligible(master):
                return _leaf_apply_pallas(
                    g,
                    master,
                    mu,
                    nu,
                    scal,
                    fmt=self.moment_fmt,
                    b1=self.b1,
                    b2=self.b2,
                    eps=self.eps,
                    copy_dtype=compute_dtype,
                    interpret=interpret,
                    chunk_rows=self.chunk_rows,
                    dims=self.dims,
                    seed=seed,
                )
            return _leaf_apply_jnp(
                g,
                master,
                mu,
                nu,
                scal,
                fmt=self.moment_fmt,
                b1=self.b1,
                b2=self.b2,
                eps=self.eps,
                copy_dtype=compute_dtype,
                seed=seed,
            )

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        res = [
            leaf(g, p, mu, nu, i)
            for i, (g, p, mu, nu) in enumerate(
                zip(flat_g, flat_p, flat_mu, flat_nu)
            )
        ]
        new_params = treedef.unflatten([r[0] for r in res])
        new_state = QMomentsState(
            count=count,
            mu=treedef.unflatten([r[2] for r in res]),
            nu=treedef.unflatten([r[3] for r in res]),
            key=None,
        )
        cp = (
            treedef.unflatten([r[1] for r in res])
            if compute_dtype is not None
            else None
        )
        return new_params, new_state, cp


__all__ = [
    "QAdamFusedPallas",
    "CHUNK_ROWS",
    "MIN_PALLAS_ELEMS",
    "leaf_eligible",
    "quantize_rows",
    "dequantize_rows",
]
