"""Distributed tour on a VIRTUAL 8-device CPU mesh: data-parallel and
tensor-parallel training (fit_sharded), the gather-free sharded NMSE
curve, and data-parallel sharded serving — the exact code that runs on
a real TPU pod slice (swap the virtual devices for real chips and, for
multi-host, set sharding.multihost; see docs/DESIGN.md §4).

    python examples/distributed.py

Takes ~2 minutes on CPU. The reference is single-GPU with no
distributed story (SURVEY.md §3.1); everything here is north-star
scope.
"""

import dataclasses
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dladmm_tpu.utils.config import (
    Config,
    ProblemConfig,
    ShardingConfig,
    TrainConfig,
)


def main():
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")

    # 1) Data-parallel training: the whole single-chip perf stack
    #    (manual VJP, Pallas-eligible kernels, bf16 mixed precision)
    #    runs per-shard inside shard_map; the only collective is the
    #    loss/grad psum over the 'data' axis.
    from dladmm_tpu.train.loop import fit_sharded

    dp_cfg = Config(
        name="dp_demo",
        problem=ProblemConfig(m=64, n=128, K=6),
        train=TrainConfig(batch=64, steps=120, lr=1e-3, eval_every=60),
        sharding=ShardingConfig(data_axis=8),
    )
    params, history = fit_sharded(dp_cfg)
    print(
        f"DP(8): step {history[-1]['step']}, "
        f"NMSE {history[-1]['nmse_db']:.2f} dB"
    )

    # 2) Tensor-parallel training (4x2 DP x TP mesh): W2/theta2 and
    #    their Adam moments are sharded over 'model' (the sharded_w2
    #    layout); a startup audit refuses layouts that exceed HBM.
    tp_cfg = dataclasses.replace(
        dp_cfg,
        name="tp_demo",
        sharding=ShardingConfig(data_axis=4, model_axis=2),
    )
    params_tp, history_tp = fit_sharded(tp_cfg)
    print(
        f"TP(4x2): step {history_tp[-1]['step']}, "
        f"NMSE {history_tp[-1]['nmse_db']:.2f} dB "
        f"(same problem instance as DP at the same seed)"
    )

    # 3) Data-parallel sharded serving: rows sharded over 'data', zero
    #    collectives in the forward -> throughput scales linearly with
    #    chips. Buckets are multiples of the data-axis size.
    from dladmm_tpu.data.synthetic import make_batch, problem_matrices
    from dladmm_tpu.parallel.mesh import make_mesh
    from dladmm_tpu.serve import ShardedInferenceServer

    A, _ = problem_matrices(dp_cfg)
    mesh = make_mesh(data=8)
    server = ShardedInferenceServer(
        params, A, mesh, max_batch=256, dtype=jnp.bfloat16
    )
    data = make_batch(jax.random.PRNGKey(7), A, 200)
    x, z = server.solve(data.b)
    nmse = 10 * jnp.log10(
        jnp.sum((x - data.x_star) ** 2) / jnp.sum(data.x_star**2)
    )
    print(
        f"sharded serving: 200 solves over 8 shards (bf16), "
        f"NMSE {float(nmse):.2f} dB"
    )


if __name__ == "__main__":
    main()
