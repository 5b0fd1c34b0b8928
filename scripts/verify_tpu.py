"""Real-TPU kernel verification (complements tests/, which run all
Pallas kernels in CPU interpret mode — Mosaic compile errors like the
bf16-SMEM-scalar bug only surface on real hardware).

    python scripts/verify_tpu.py

Compiles and runs every kernel path on the attached TPU in fp32 AND
bf16, asserting parity against the pure-JAX golden op. Exits non-zero
on any failure. ~2 min (compiles dominate).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, tol):
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-12
    ok = err <= tol * scale
    print(
        f"  {name:42s} max_err={err:.3e} rel={err/scale:.2e} "
        f"({'OK' if ok else 'FAIL'})"
    )
    return ok


def main() -> int:
    if jax.default_backend() not in ("tpu", "axon") and not any(
        d.platform == "tpu" for d in jax.devices()
    ):
        print(f"no TPU attached (backend={jax.default_backend()}); skipping")
        return 0

    import optax

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.ops.pallas_layer import auto_fused_step
    from dladmm_tpu.ops.pallas_unroll import (
        make_unrolled_forward,
        make_unrolled_trajectory,
    )

    ok = True
    m, n, K, S = 250, 500, 15, 64
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A0 = make_dictionary(kA, m, n)
    params0 = init_dladmm_params(A0, K=K)
    data = make_batch(kb, A0, S)

    # Gradient tolerances are RELATIVE to max|grad| and sized for bf16
    # MXU-pass quantization: on TPU both the XLA-autodiff reference and
    # the Pallas backward run matmuls in bf16 passes with different
    # rounding schedules, so their difference is ~2x one path's
    # quantization noise. EXACT gradient parity is pinned separately in
    # fp32 interpret mode (tests/test_pallas_bwd.py); this script checks
    # real-TPU compilation + same-ballpark numerics.
    for dname, dt, tol_f, tol_g in [
        ("fp32", jnp.float32, 2e-5, 5e-2),
        ("bf16", jnp.bfloat16, 5e-2, 4e-1),
    ]:
        print(f"[{dname}]")
        cast = lambda t: jax.tree.map(lambda v: v.astype(dt), t)
        params, A, b = cast(params0), cast(A0), cast(data.b)
        ref_x, ref_z, ref_lam = dladmm_forward(params, A, b)

        fwd = make_unrolled_forward(interpret=False)
        x, z, lam = jax.jit(fwd)(params, A, b)
        ok &= check("megakernel forward x", x, ref_x, tol_f)
        ok &= check("megakernel forward lam", lam, ref_lam, tol_f)

        traj = make_unrolled_trajectory(interpret=False)
        tx, tz, tlam = jax.jit(traj)(params, A, b)
        ok &= check("trajectory megakernel x[-1]", tx[-1], ref_x, tol_f)

        step = auto_fused_step(m, n, m)
        if step is not None:
            x2, z2, lam2 = dladmm_forward(params, A, b, step_fn=step)
            ok &= check("per-layer fused kernel x", x2, ref_x, tol_f)

        # Full training-gradient parity: megakernel fwd + Pallas bwd vs
        # pure XLA autodiff through the golden op.
        def loss(p, f):
            x, z, _ = f(p, A, b)
            return jnp.mean(x.astype(jnp.float32) ** 2) + jnp.mean(
                z.astype(jnp.float32) ** 2
            )

        g_ref = jax.jit(
            lambda p: jax.grad(loss)(p, lambda *a: dladmm_forward(*a))
        )(params)
        g_pl = jax.jit(lambda p: jax.grad(loss)(p, fwd))(params)
        for name, r, p_ in zip(params._fields, g_ref, g_pl):
            ok &= check(f"pallas-bwd grad {name}", p_, r, tol_g)

        # Tile-outer inference megakernel at a serving bucket the
        # whole-batch kernel cannot fit (grid (S/bs, K)).
        from dladmm_tpu.ops.pallas_unroll import (
            _unrolled_forward_pallas,
            unroll_tile_batch,
        )

        S_serve = 2048
        bs_t = unroll_tile_batch(m, n, m, S_serve)
        if bs_t is not None and bs_t < S_serve:
            b_srv = cast(make_batch(kb, A0, S_serve).b)
            ref_sx, _, ref_slam = dladmm_forward(params, A, b_srv)
            xt, _, lamt = jax.jit(
                lambda p, a, bb: _unrolled_forward_pallas(
                    p, a, bb, matmul_dtype=None, interpret=False
                )
            )(params, A, b_srv)
            ok &= check(f"tiled megakernel (bs={bs_t}) x", xt, ref_sx, tol_f)
            ok &= check(
                f"tiled megakernel (bs={bs_t}) lam", lamt, ref_slam, tol_f
            )

        # Tile-outer trajectory megakernel at batch 1024 (VJP forward).
        from dladmm_tpu.ops.pallas_unroll import _traj_pallas, traj_tile_batch

        S_tr = 1024
        bs_tr = traj_tile_batch(m, n, m, S_tr, jnp.dtype(dt).itemsize)
        if bs_tr is not None and bs_tr < S_tr:
            b_tr = cast(make_batch(kb, A0, S_tr).b)
            ref_tx, _, _ = dladmm_forward(params, A, b_tr)
            ttx, _, _, _ = jax.jit(
                lambda p, a, bb: _traj_pallas(
                    p, a, bb, matmul_dtype=None, interpret=False,
                    with_tax=True,
                )
            )(params, A, b_tr)
            ok &= check(
                f"tiled trajectory (bs={bs_tr}) x[-1]", ttx[-1], ref_tx, tol_f
            )

        # Batch-chunked backward megakernel at the batch-1024 shape the
        # whole-batch kernel cannot fit (grid (K, S/bs), k outer).
        from dladmm_tpu.ops.pallas_bwd import (
            bwd_chunk_batch,
            unroll_bwd_pallas_chunked,
        )
        from dladmm_tpu.ops.unroll_vjp import _fwd_scan, bwd_from_carries

        S_big = 1024
        bs = bwd_chunk_batch(m, n, m, S_big, jnp.dtype(dt).itemsize)
        if bs is not None:
            b_big = cast(make_batch(kb, A0, S_big).b)
            (xf, zf, lamf, Axf), traj6 = _fwd_scan(params, A, b_big)
            lam_in, Ax_in, z_in, x1, z1, Ax1 = traj6
            cts = (
                jnp.ones_like(xf),
                0.5 * jnp.ones_like(zf),
                0.1 * jnp.ones_like(lamf),
            )
            gp_ref, _, _ = bwd_from_carries(params, A, b_big, traj6, cts)
            gp_ck, _, _ = unroll_bwd_pallas_chunked(
                params,
                A,
                b_big,
                (x1, z1, jnp.concatenate([lam_in[1:], lamf[None]]), Ax1),
                cts,
                bs,
                interpret=False,
            )
            for name, r, p_ in zip(params._fields, gp_ref, gp_ck):
                ok &= check(
                    f"chunked-bwd (bs={bs}) grad {name}", p_, r, tol_g
                )

    # int8 quantized serving kernels (round 3, ops/quantized.py): the
    # s8 x s8 -> s32 MXU dot + in-kernel round/cast are Mosaic features
    # interpret-mode tests cannot validate. Parity target is the int8
    # XLA scan (identical quantized math), so tolerance is tight.
    print("[int8]")
    from dladmm_tpu.ops.quantized import (
        dladmm_forward_int8,
        dladmm_forward_int8_pallas,
        int8_tile_batch,
        quantize_params,
    )

    qp, qd = quantize_params(params0, A0)
    ref8_x, ref8_z, ref8_lam = jax.jit(dladmm_forward_int8)(qp, qd, data.b)
    # Sanity vs fp32: quantization noise only (~1e-2 relative).
    fp_x, _, _ = dladmm_forward(params0, A0, data.b)
    ok &= check("int8 scan vs fp32 x (quant noise)", ref8_x, fp_x, 5e-2)
    x8, z8, lam8 = jax.jit(
        lambda a, c, bb: dladmm_forward_int8_pallas(
            a, c, bb, interpret=False
        )
    )(qp, qd, data.b)
    ok &= check("int8 megakernel x", x8, ref8_x, 1e-5)
    ok &= check("int8 megakernel lam", lam8, ref8_lam, 1e-5)

    S8 = 2048
    bs8 = int8_tile_batch(m, n, m, S8)
    if bs8 is not None and bs8 < S8:
        b8 = make_batch(kb, A0, S8).b
        r8x, _, _ = jax.jit(dladmm_forward_int8)(qp, qd, b8)
        t8x, _, _ = jax.jit(
            lambda a, c, bb: dladmm_forward_int8_pallas(
                a, c, bb, interpret=False
            )
        )(qp, qd, b8)
        ok &= check(f"int8 tiled megakernel (bs={bs8}) x", t8x, r8x, 1e-5)

    # Fused Adam sweep kernel (round 4, train/qadam_pallas.py): the
    # one-HBM-pass optimizer apply with fp32/bf16/int8 moment storage.
    # Interpret-mode tests pin the math; this gates Mosaic compilation
    # (int8 relayouts, (CB,1) scale strips, SMEM scalars) on hardware.
    print("[qadam]")
    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    key_q = jax.random.PRNGKey(5)
    qparams = {
        "w": jax.random.normal(key_q, (1024, 256), jnp.float32),
        "t": jax.random.normal(key_q, (37,), jnp.float32),
    }
    qgrads = jax.tree.map(
        lambda v: 0.1 * jnp.sin(v * 3.0), qparams
    )
    for fmt in (
        "float32",
        "bfloat16",
        "bfloat16_sr",
        "bfloat16_sr_mu",
        "int8",
    ):
        opt = QAdamFusedPallas(
            1e-3, moment_fmt=fmt, clip_norm=1.0, interpret=False
        )
        st = opt.init(qparams)
        upd, st_ref = opt.update(qgrads, st, qparams)
        import optax as _optax

        p_ref = _optax.apply_updates(qparams, upd)
        p_f, st_f, cp = jax.jit(
            lambda g, s, p: opt.fused_apply(g, s, p, jnp.bfloat16)
        )(qgrads, st, qparams)
        ok &= check(f"qadam[{fmt}] master w", p_f["w"], p_ref["w"], 1e-5)
        ok &= check(f"qadam[{fmt}] master t", p_f["t"], p_ref["t"], 1e-5)
        ok &= check(
            f"qadam[{fmt}] bf16 copy",
            cp["w"].astype(jnp.float32),
            p_ref["w"].astype(jnp.bfloat16).astype(jnp.float32),
            1e-6,
        )

    # ZeRO-1 x fused sweep (round 5): the kernel on the 1/D flat shard's
    # (rows, 256) view INSIDE shard_map — gates the Mosaic compile of
    # that composition on hardware (D=1 on the single chip; the
    # multi-shard algebra is pinned on the virtual mesh by
    # tests/test_moment_matrix.py).
    print("[zero1-qadam]")
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.parallel import mesh as _pmesh
    from dladmm_tpu.parallel.collectives import (
        make_dp_zero1_state,
        make_dp_zero1_train_step,
    )

    kz = jax.random.PRNGKey(7)
    kA_z, kb_z = jax.random.split(kz)
    A_z = make_dictionary(kA_z, 64, 128)
    params_z = init_dladmm_params(A_z, K=4)
    data_z = make_batch(kb_z, A_z, 32)
    mesh_z = _pmesh.make_mesh(data=jax.device_count(), model=1)
    opt_z = QAdamFusedPallas(1e-3, moment_fmt="int8", interpret=False)
    st_z = make_dp_zero1_state(params_z, opt_z, mesh_z)
    step_z = make_dp_zero1_train_step(
        opt_z, mesh_z, clip_norm=1.0, donate=False
    )
    st_z, loss_z = step_z(st_z, A_z, data_z)
    jax.block_until_ready(loss_z)
    ok &= bool(jnp.isfinite(loss_z))
    print(f"  zero1-qadam[int8] step: loss={float(loss_z):.6f}")

    # Prox-templated inference megakernel (round 5): each ops/prox.py
    # operator traced into the whole-unroll kernel — gates the Mosaic
    # compile of the non-l1 elementwise bodies and group_l2's in-kernel
    # row reduction; parity target is the XLA scan with the same prox.
    print("[prox-mega]")
    from dladmm_tpu.ops.pallas_unroll import make_unrolled_inference_prox
    from dladmm_tpu.ops.prox import get_prox, prox_l1
    from dladmm_tpu.ops.reference import make_cached_step

    # group_l2 is gated at a LOOSE tolerance as a numerics RECORD, not a
    # serving path: its row-norm's sqrt/divide chain lowers differently
    # under Mosaic than XLA (~5e-4..2e-3 rel measured r5), so serving
    # excludes it from the megakernel (ops/prox.py kernel_exact). The
    # elementwise proxes must stay bit-exact.
    for prox_name, tol in (
        ("nonneg_l1", 1e-5),
        ("box", 1e-5),
        ("elastic_net", 1e-5),
        ("group_l2", 1e-2),
    ):
        px = get_prox(prox_name, rho=0.3)
        mega_p = make_unrolled_inference_prox(px, prox_l1, interpret=False)
        xp, zp, _ = jax.jit(mega_p)(params0, A0, data.b)
        xr, zr, _ = jax.jit(
            lambda p, a, bb, _s=make_cached_step(px, prox_l1): dladmm_forward(
                p, a, bb, step_fn=_s
            )
        )(params0, A0, data.b)
        ok &= check(f"prox-mega[{prox_name}] x", xp, xr, tol)
        ok &= check(f"prox-mega[{prox_name}] z", zp, zr, tol)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
