"""Multi-host training simulation: N real OS processes, virtual CPU
devices, the REAL fit_sharded multihost code path (SURVEY.md §5.5,
§6.2-5 taken beyond mocks — actual Gloo collectives across processes).

Worker (launched N times by the harness or by hand):
    python scripts/multihost_sim.py --process-id=I --num-processes=N \
        --coordinator=127.0.0.1:PORT

Each process owns 4 virtual CPU devices; the global mesh is
(data=2N, model=2). Host-local batches are built with
make_array_from_process_local_data exactly as on a real pod. Process 0
prints one JSON line with the final metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="127.0.0.1:9891")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--layout", default="sharded_w2")
    ap.add_argument(
        "--optimizer",
        default="adam",
        choices=["adam", "fused_adam"],
        help="fused_adam exercises the DP fused step cross-process "
        "(per-layer grad psums over DCN) on a data-only mesh",
    )
    ap.add_argument(
        "--zero1",
        action="store_true",
        help="exercise ZeRO-1 weight-update sharding cross-process: the "
        "reduce-scatter/all-gather pair and the flat moment shards "
        "span both hosts (data-only mesh)",
    )
    ap.add_argument(
        "--moment-dtype",
        default="float32",
        help="TrainConfig.moment_dtype; with --zero1 and a *_pallas "
        "value each host's 1/D moment shard runs the fused optimizer "
        "sweep (interpret mode on CPU) — the round-5 composition",
    )
    args = ap.parse_args(argv)

    # Set (or raise) the virtual-device-count flag without duplicating
    # it — two conflicting instances are parse-order dependent.
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    mm = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if mm is None:
        flags = (flags + " --xla_force_host_platform_device_count=4").strip()
    elif int(mm.group(1)) != 4:
        flags = flags.replace(
            mm.group(0), "--xla_force_host_platform_device_count=4"
        )
    os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    n_local = jax.local_device_count()
    fused = args.optimizer == "fused_adam"
    # The fused optimizer and zero1 shard over 'data' only; the default
    # sim keeps model_axis=2 so both axes are exercised.
    model_axis = 1 if (fused or args.zero1) else 2
    cfg = Config(
        name="multihost_sim",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(
            batch=16 * args.num_processes,
            steps=args.steps,
            lr=1e-3,
            eval_every=max(1, args.steps // 3),
            eval_batch=16 * args.num_processes,
            compute_dtype=args.compute_dtype,
            optimizer=args.optimizer,
            clip_norm=1.0 if (fused or args.zero1) else None,
            clip_mode="delayed" if fused else "global",
            moment_dtype=args.moment_dtype,
        ),
        sharding=ShardingConfig(
            data_axis=(n_local * args.num_processes) // model_axis,
            model_axis=model_axis,
            multihost=True,
            layout=args.layout,
            zero1=args.zero1,
        ),
    )
    params, history = fit_sharded(
        cfg, ckpt_dir=args.ckpt_dir, resume=args.resume
    )
    # Bit-sensitive digest of the final (sharded) params, computed SPMD:
    # identical across a cold run and a checkpoint-resumed run iff the
    # restore reproduced every shard exactly.
    import jax.numpy as jnp

    checksum = float(
        jax.jit(
            lambda ps: sum(jnp.sum(jnp.abs(p.astype(jnp.float64))) for p in ps)
        )(params)
    )
    if jax.process_index() == 0:
        first, last = history[0], history[-1]
        print(
            json.dumps(
                {
                    "processes": jax.process_count(),
                    "global_devices": jax.device_count(),
                    "mesh": last["mesh"],
                    "nmse_db_first": first["nmse_db"],
                    "nmse_db_last": last["nmse_db"],
                    "improved": last["nmse_db"] < first["nmse_db"],
                    "param_checksum": checksum,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
