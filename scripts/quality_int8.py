#!/usr/bin/env python
"""Serving-precision quality ladder on a TRAINED checkpoint.

Loads the latest checkpoint under --ckpt-dir (written by
``python -m dladmm_tpu.run --config=<name> --ckpt-dir=...``), rebuilds
the config's dictionary/eval batch from the config seed (identical to
the training run's eval data), and reports NMSE(dB)/residual for the
three serving precisions: fp32, bf16, int8 (ops/quantized.py).

One JSON line on stdout — the number BASELINE.md's int8 quality table
quotes. CPU-runnable (quality is precision-, not backend-, bound;
pass --cpu to force it, e.g. while the TPU relay is down).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="synthetic_large")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--clip-mode",
        default=None,
        choices=["global", "delayed"],
        help="must mirror the training run's flag: the checkpointed "
        "optimizer-state structure depends on it",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.metrics.core import constraint_residual, nmse_db
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.ops.quantized import dladmm_forward_int8, quantize_params
    from dladmm_tpu.utils.checkpoint import (
        latest_step_dir,
        restore_checkpoint,
    )
    from dladmm_tpu.utils.config import get_config

    cfg = get_config(args.config)
    p, t = cfg.problem, cfg.train
    if args.clip_mode is not None:
        import dataclasses

        t = dataclasses.replace(t, clip_mode=args.clip_mode)
    if not getattr(p, "identity_B", True):
        ap.error("int8 serving is identity-B only (ops/quantized.py)")
    key = jax.random.PRNGKey(t.seed)
    k_dict, k_eval, _ = jax.random.split(key, 3)
    A = make_dictionary(k_dict, p.m, p.n, jnp.dtype(t.dtype))
    data = make_batch(
        k_eval, A, t.eval_batch, p.sparsity_x, p.sparsity_e, A.dtype
    )

    latest = latest_step_dir(args.ckpt_dir)
    if latest is None:
        ap.error(f"no step_N checkpoint under {args.ckpt_dir}")
    template = init_dladmm_params(A, K=p.K, beta=p.beta, dtype=A.dtype)
    # run.py checkpoints the 3-field TrainState; the template must match
    # its exact optimizer-state structure, so build it the way fit()
    # does (the preset's clip/schedule chain included).
    from dladmm_tpu.train.loop import _build_optimizer, make_train_state

    state = make_train_state(template, _build_optimizer(t))
    params = restore_checkpoint(latest, state).params

    def metrics(x, z):
        x32 = x.astype(jnp.float32)
        z32 = z.astype(jnp.float32)
        return (
            round(float(nmse_db(x32, data.x_star)), 3),
            round(
                float(constraint_residual(A, data.b, x32, z32)), 5
            ),
        )

    out = {"config": args.config, "ckpt": str(latest)}
    x, z, _ = dladmm_forward(params, A, data.b)
    out["fp32_nmse_db"], out["fp32_residual"] = metrics(x, z)
    bf = jnp.bfloat16
    pb = jax.tree.map(lambda v: v.astype(bf), params)
    x, z, _ = dladmm_forward(pb, A.astype(bf), data.b.astype(bf))
    out["bf16_nmse_db"], out["bf16_residual"] = metrics(x, z)
    qp, qd = quantize_params(params, A)
    x, z, _ = dladmm_forward_int8(qp, qd, data.b)
    out["int8_nmse_db"], out["int8_residual"] = metrics(x, z)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
