"""Checkpoint/resume integration: a run interrupted at step k and resumed
must reproduce the uninterrupted run exactly (deterministic per-step keys)."""

import jax
import pytest
import numpy as np

from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig


def _cfg(steps):
    return Config(
        name="ci_resume",
        problem=ProblemConfig(m=20, n=40, K=4),
        train=TrainConfig(batch=8, steps=steps, lr=1e-3, eval_every=10,
                          eval_batch=16, seed=0),
    )


def test_resume_reproduces_cold_run(tmp_path):
    from dladmm_tpu.train.loop import fit

    # Uninterrupted 20-step run.
    params_full, _ = fit(_cfg(20))

    # 10 steps checkpointed, then resume to 20.
    ck = str(tmp_path / "ck")
    fit(_cfg(10), ckpt_dir=ck)
    params_resumed, _ = fit(_cfg(20), ckpt_dir=ck, resume=True)

    for got, want in zip(params_resumed, params_full):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7
        )


def _sharded_cfg(steps, compute_dtype="float32"):
    from dladmm_tpu.utils.config import ShardingConfig

    return Config(
        name="ci_resume_sharded",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(
            batch=16,
            steps=steps,
            lr=1e-3,
            eval_every=10,
            eval_batch=16,
            seed=0,
            compute_dtype=compute_dtype,
        ),
        sharding=ShardingConfig(data_axis=4, model_axis=2),
    )


@pytest.mark.slow
def test_sharded_resume_reproduces_cold_run(tmp_path):
    """Sharded checkpoint/resume on the 4x2 virtual mesh (VERDICT r1 #3):
    orbax saves the TP-sharded params+opt_state, restore goes directly
    into the sharded templates (utils/checkpoint._abstract_leaf), and
    the resumed run reproduces the cold run BIT-exactly."""
    from dladmm_tpu.train.loop import fit_sharded

    params_full, hist_full = fit_sharded(_sharded_cfg(20))

    ck = str(tmp_path / "ck_sharded")
    fit_sharded(_sharded_cfg(10), ckpt_dir=ck)
    params_resumed, hist_res = fit_sharded(
        _sharded_cfg(20), ckpt_dir=ck, resume=True
    )

    for got, want in zip(params_resumed, params_full):
        assert got.sharding == want.sharding  # restored INTO the mesh layout
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert hist_res[-1]["nmse_db"] == hist_full[-1]["nmse_db"]


@pytest.mark.slow
def test_sharded_resume_bf16(tmp_path):
    """Mixed-precision sharded resume: the persistent bf16 copy is
    derivable state — stripped at save, rebuilt at restore — and the
    resumed run still reproduces the cold run exactly."""
    from dladmm_tpu.train.loop import fit_sharded

    params_full, _ = fit_sharded(_sharded_cfg(20, "bfloat16"))
    ck = str(tmp_path / "ck_bf16")
    fit_sharded(_sharded_cfg(10, "bfloat16"), ckpt_dir=ck)
    params_resumed, _ = fit_sharded(
        _sharded_cfg(20, "bfloat16"), ckpt_dir=ck, resume=True
    )
    for got, want in zip(params_resumed, params_full):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_adam_resume_reproduces_cold_run(tmp_path):
    """The fused optimizer's state (moments + count + delayed-clip
    prev_norm) round-trips through checkpoint/resume: interrupted and
    cold runs converge to the same params."""
    import dataclasses

    from dladmm_tpu.train.loop import fit

    def cfg(steps):
        c = _cfg(steps)
        return dataclasses.replace(
            c,
            train=dataclasses.replace(
                c.train,
                optimizer="fused_adam",
                clip_norm=1.0,
                clip_mode="delayed",
            ),
        )

    params_full, _ = fit(cfg(20))
    ck = str(tmp_path / "ck_fused")
    fit(cfg(10), ckpt_dir=ck)
    params_resumed, _ = fit(cfg(20), ckpt_dir=ck, resume=True)

    for got, want in zip(params_resumed, params_full):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-8
        )


def test_eval_only_cli_reports_trained_metrics(tmp_path, capsys):
    """run.py --eval-only restores the checkpoint and reports the SAME
    final metrics as the training run, training nothing."""
    import json

    from dladmm_tpu.run import main

    ckpt = str(tmp_path / "ck")
    assert main(["--config=smoke", "--ckpt-dir", ckpt]) == 0
    trained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (
        main(["--config=smoke", "--ckpt-dir", ckpt, "--eval-only"]) == 0
    )
    evaled = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert evaled["final_nmse_db"] == pytest.approx(
        trained["final_nmse_db"], abs=1e-6
    )


def test_cross_backend_restore_fallback(tmp_path, monkeypatch):
    """Restoring a checkpoint written on a DIFFERENT backend (TPU-trained,
    CPU-served during a relay outage): orbax's first attempt fails because
    the saved shardings name devices that no longer exist ("sharding ...
    Got None"); restore_checkpoint must retry with every unsharded leaf
    pinned to this backend's default device. Pinned against
    bench_out/ckpt_large_r3 (axon-written, CPU-restored) manually; here
    the first restore attempt is forced to fail the way orbax does."""
    import orbax.checkpoint as ocp
    from jax.sharding import SingleDeviceSharding

    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.checkpoint import (
        latest_step_dir,
        restore_checkpoint,
    )

    ck = str(tmp_path / "ck")
    fit(_cfg(10), ckpt_dir=ck)
    from dladmm_tpu.train.loop import _build_optimizer, make_train_state
    from dladmm_tpu.data.synthetic import make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params

    cfg = _cfg(10)
    key = jax.random.PRNGKey(cfg.train.seed)
    A = make_dictionary(
        jax.random.split(key, 3)[0], cfg.problem.m, cfg.problem.n,
        jax.numpy.float32,
    )
    template = make_train_state(
        init_dladmm_params(A, K=cfg.problem.K, beta=cfg.problem.beta),
        _build_optimizer(cfg.train),
    )

    real_restore = ocp.StandardCheckpointer.restore
    calls = []

    def flaky_restore(self, path, abstract):
        calls.append(abstract)
        if len(calls) == 1:
            raise ValueError(
                "sharding passed to deserialization should be specified, "
                "concrete and an instance of `jax.sharding.Sharding`. "
                "Got None"
            )
        return real_restore(self, path, abstract)

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore", flaky_restore)
    restored = restore_checkpoint(latest_step_dir(ck), template)
    assert len(calls) == 2
    # Second attempt pinned every leaf to a concrete device.
    for leaf in jax.tree.leaves(calls[1]):
        assert isinstance(leaf.sharding, SingleDeviceSharding)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(10)
    )
