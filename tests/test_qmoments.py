"""Reduced-precision Adam moments (train/qmoments.py): quantizer
roundtrip bounds, op-parity of the transform with optax.adam, config
plumbing, and checkpoint round-trip of the quantized optimizer state."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dladmm_tpu.train.qmoments import (
    BLOCK,
    QTensor,
    adam_qmoments,
    dequantize_q8,
    quantize_q8,
    scale_by_adam_qmoments,
)


def test_q8_roundtrip_bounds():
    rng = np.random.default_rng(0)
    # Values spanning 4 orders of magnitude within blocks — the regime
    # where LINEAR int8 would crush small values to zero.
    x = (
        rng.normal(size=(7, 900)).astype(np.float32)
        * 10.0 ** rng.uniform(-4, 0, size=(7, 900)).astype(np.float32)
    )
    q = quantize_q8(jnp.asarray(x))
    assert q.codes.dtype == jnp.int8 and q.scale.dtype == jnp.float32
    assert q.codes.shape[1] == BLOCK
    y = np.asarray(dequantize_q8(q, x.shape))
    assert y.shape == x.shape
    # sqrt-companding: absolute error of y vs x is <= 2*sqrt(|y_n|)*q
    # in the normalized domain (q = 0.5/127). At |x| >= 1% of its
    # block's absmax that is <= ~8% relative error.
    absmax = np.abs(x).reshape(-1)  # per-block max via brute force
    flat_x, flat_y = x.reshape(-1), y.reshape(-1)
    nb = flat_x.size // BLOCK
    for i in range(nb):
        blk = slice(i * BLOCK, (i + 1) * BLOCK)
        bm = np.abs(flat_x[blk]).max()
        sel = np.abs(flat_x[blk]) >= 0.01 * bm
        rel = np.abs(flat_y[blk][sel] - flat_x[blk][sel]) / np.abs(
            flat_x[blk][sel]
        )
        assert rel.max() < 0.09, rel.max()
    # Signs never flip, zeros exact.
    assert (np.sign(flat_y) * np.sign(flat_x) >= 0).all()
    z = quantize_q8(jnp.zeros((130,)))
    np.testing.assert_array_equal(np.asarray(dequantize_q8(z, (130,))), 0.0)


def test_q8_nonuniform_shapes_and_padding():
    x = jnp.arange(300, dtype=jnp.float32).reshape(15, 20) / 77.0
    q = quantize_q8(x)
    assert q.codes.shape == (2, BLOCK)  # 300 -> padded to 512
    # abs err of the sqrt-compander at value v is ~sqrt(v*absmax)/127
    # (<= absmax/127 ~ 0.031 here).
    np.testing.assert_allclose(
        np.asarray(dequantize_q8(q, (15, 20))), np.asarray(x), atol=0.04
    )


def test_sr_bfloat16_unbiased_and_exact():
    from dladmm_tpu.train.qmoments import sr_bfloat16

    # Exactly-representable bf16 values never move, for any key.
    x = jnp.asarray([1.0, -2.5, 0.0, 3.140625], jnp.float32)
    for seed in (0, 1, 2):
        y = sr_bfloat16(x, jax.random.PRNGKey(seed)).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # A value between two bf16 neighbours rounds to each side with the
    # right frequency: the mean over many draws converges to the value.
    v = np.float32(1.0 + 2 ** -10)  # 1/8 of the way from 1.0 to 1.0078125
    xs = jnp.full((200_000,), v, jnp.float32)
    y = sr_bfloat16(xs, jax.random.PRNGKey(7)).astype(jnp.float32)
    uniq = np.unique(np.asarray(y))
    assert set(uniq) <= {np.float32(1.0), np.float32(1.0078125)}
    np.testing.assert_allclose(np.asarray(y).mean(), v, atol=2e-5)


@pytest.mark.parametrize("md", ["bfloat16", "bfloat16_sr", "int8"])
def test_transform_matches_optax_adam_directionally(md):
    """Same update expressions as optax.scale_by_adam: with fresh (zero)
    moments the FIRST step must match optax to the storage precision,
    and subsequent steps stay close on a smooth trajectory."""
    params = {
        "w": jnp.asarray(np.random.default_rng(1).normal(size=(40, 30)),
                         jnp.float32),
        "b": jnp.zeros((30,), jnp.float32),
    }
    ref = optax.adam(1e-3)
    qt = adam_qmoments(1e-3, moment_dtype=md)
    s_ref, s_qt = ref.init(params), qt.init(params)

    def grads_of(p, step):
        return jax.tree.map(
            lambda v: jnp.cos(v + 0.1 * step) * 0.3, p
        )

    p_ref = p_qt = params
    for step in range(5):
        g_ref = grads_of(p_ref, step)
        u_ref, s_ref = ref.update(g_ref, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        g_qt = grads_of(p_qt, step)
        u_qt, s_qt = qt.update(g_qt, s_qt, p_qt)
        p_qt = optax.apply_updates(p_qt, u_qt)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_qt)):
        # Trajectories diverge only by moment storage noise.
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            atol=5e-4 if md == "int8" else 2e-4,
        )


def test_int8_state_is_small():
    params = {"w": jnp.zeros((1000, 100), jnp.float32)}
    st = scale_by_adam_qmoments(moment_dtype="int8").init(params)
    mu = st.mu["w"]
    assert isinstance(mu, QTensor)
    nbytes = mu.codes.size + mu.scale.size * 4
    assert nbytes < 0.27 * params["w"].size * 4  # ~4x smaller than fp32


def test_fit_with_int8_moments_trains_and_checkpoints(tmp_path):
    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("smoke")
    # 2x the smoke budget: at 60 steps the int8 moment noise leaves the
    # trained net statistically tied with the LADMM init on this micro
    # config; the margin at 120 is clear. (Full-recipe quality deltas
    # are measured in BASELINE.md.)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, moment_dtype="int8", steps=120
        ),
    )
    ckpt = tmp_path / "ck"
    params, history = fit(cfg, ckpt_dir=str(ckpt))
    final = history[-1]
    assert final["nmse_db"] < float(final["curves"]["ladmm_curve_db"][-1])
    # Resume restores the QTensor opt_state (template mirrors config).
    cfg2 = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, steps=cfg.train.steps + 10),
    )
    params2, history2 = fit(cfg2, ckpt_dir=str(ckpt), resume=True)
    assert np.isfinite(history2[-1]["nmse_db"])


def test_fused_adam_rejects_moment_dtype():
    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            optimizer="fused_adam",
            clip_mode="delayed",
            moment_dtype="int8",
        ),
    )
    with pytest.raises(ValueError, match="moment_dtype"):
        fit(cfg)


def test_bad_moment_dtype_rejected():
    with pytest.raises(ValueError, match="moment_dtype"):
        scale_by_adam_qmoments(moment_dtype="fp8")


# ---- fused one-pass Pallas sweep (train/qadam_pallas.py) -------------


@pytest.mark.parametrize("fmt", ["float32", "bfloat16", "int8"])
def test_fused_apply_matches_reference_update(fmt):
    """fused_apply (Pallas kernel, interpret mode on CPU) must agree
    with the .update reference path — identical math, different
    execution — including the bf16 compute-copy output."""
    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    rng = np.random.default_rng(3)
    # One big BLOCK-divisible leaf (kernel path) + one small odd leaf
    # (jnp fallback path).
    params = {
        "w": jnp.asarray(rng.normal(size=(512, 256)), jnp.float32),
        "t": jnp.asarray(rng.normal(size=(37,)), jnp.float32),
    }
    grads = jax.tree.map(
        lambda v: jnp.asarray(
            rng.normal(size=v.shape), jnp.float32
        ) * 0.1,
        params,
    )
    opt = QAdamFusedPallas(1e-3, moment_fmt=fmt, clip_norm=1.0)
    st = opt.init(params)

    upd, st_ref = opt.update(grads, st, params)
    p_ref = optax.apply_updates(params, upd)

    p_fused, st_fused, cp = opt.fused_apply(
        grads, st, params, jnp.bfloat16
    )
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7
        )
    assert int(st_fused.count) == int(st_ref.count) == 1
    # Moment states agree across the two paths.
    for a, b in zip(
        jax.tree.leaves(st_ref.mu), jax.tree.leaves(st_fused.mu)
    ):
        np.testing.assert_allclose(
            np.asarray(a).astype(np.float32),
            np.asarray(b).astype(np.float32),
            rtol=1e-5,
            atol=1e-6,
        )
    # Compute copy = cast of the new masters.
    for p, c in zip(jax.tree.leaves(p_fused), jax.tree.leaves(cp)):
        assert c.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(c), np.asarray(p.astype(jnp.bfloat16))
        )


def test_fused_fp32_matches_optax_chain_exactly():
    """moment_fmt=float32 with clip == optax.chain(clip_by_global_norm,
    adam) to fp32 tolerance over several steps."""
    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    rng = np.random.default_rng(4)
    params = {"w": jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)}
    ref_opt = optax.chain(
        optax.clip_by_global_norm(0.5), optax.adam(2e-3)
    )
    ref_st = ref_opt.init(params)
    opt = QAdamFusedPallas(2e-3, moment_fmt="float32", clip_norm=0.5)
    st = opt.init(params)
    p_ref = p = params
    for step in range(4):
        g = jax.tree.map(
            lambda v: jnp.sin(v * (step + 1)) * 3.0, p_ref
        )  # norm >> 0.5: the clip is ACTIVE
        u, ref_st = ref_opt.update(g, ref_st, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p, st, _ = opt.fused_apply(g, st, p, None)
        np.testing.assert_allclose(
            np.asarray(p["w"]), np.asarray(p_ref["w"]), rtol=1e-5,
            atol=1e-7,
        )


def test_fit_with_int8_pallas_moments_trains():
    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, moment_dtype="int8_pallas", steps=120
        ),
    )
    params, history = fit(cfg)
    final = history[-1]
    assert final["nmse_db"] < float(final["curves"]["ladmm_curve_db"][-1])


def test_pallas_moment_dtype_rejects_delayed_clip():
    from dladmm_tpu.train.loop import _build_optimizer
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("smoke")
    t = dataclasses.replace(
        cfg.train,
        moment_dtype="float32_pallas",
        clip_norm=1.0,
        clip_mode="delayed",
    )
    with pytest.raises(ValueError, match="clip_mode"):
        _build_optimizer(t)


def test_fused_sr_bf16_close_to_fp32_reference():
    """bfloat16_sr (Pallas hardware PRNG SR, interpret mode on CPU):
    masters match the fp32-moment trajectory to bf16-ulp noise, and
    the stored moments round stochastically (not always RTN)."""
    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    rng = np.random.default_rng(9)
    params = {"w": jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)}
    ref = QAdamFusedPallas(1e-3, moment_fmt="float32")
    sr = QAdamFusedPallas(1e-3, moment_fmt="bfloat16_sr")
    st_r, st_s = ref.init(params), sr.init(params)
    p_r = p_s = params
    for step in range(3):
        g = jax.tree.map(lambda v: jnp.cos(v * (step + 1)) * 0.2, p_r)
        p_r, st_r, _ = ref.fused_apply(g, st_r, p_r, None)
        p_s, st_s, _ = sr.fused_apply(g, st_s, p_s, None)
    np.testing.assert_allclose(
        np.asarray(p_s["w"]), np.asarray(p_r["w"]), atol=5e-5
    )
    assert st_s.mu["w"].dtype == jnp.bfloat16
