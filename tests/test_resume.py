"""Checkpoint/resume integration: a run interrupted at step k and resumed
must reproduce the uninterrupted run exactly (deterministic per-step keys)."""

import jax
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
