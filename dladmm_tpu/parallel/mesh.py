"""Device mesh construction + sharding specs (SURVEY.md N6).

The reference is single-GPU/single-process (SURVEY.md §4.1 parallelism
table: no DP/TP/PP); everything here is new TPU-first scope:

  * ``data`` axis — batch/scenario data parallelism; gradient allreduce
    (psum) rides ICI within a slice and crosses DCN once because ``data``
    is the outer mesh axis.
  * ``model`` axis — tensor parallelism: block-partitioned dictionary A
    and x-side parameters along the code dimension n (the "long" axis of
    this model family, SURVEY.md §7 long-context row).

PP/SP/EP are intentional non-goals for this model family (K <= 20 tiny
layers, no sequence axis, no MoE) — SURVEY.md §4.1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data=None`` uses all remaining devices for the data axis. The data
    axis is outermost so cross-host (DCN) traffic is confined to the
    gradient psum (SURVEY.md §7 "Distributed comm backend" row).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-first arrays sharded along the data axis: (S, ...) -> P('data')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def param_shardings_tp(mesh: Mesh, layout: str = "sharded_w2"):
    """TP layout for DLADMMParams (SURVEY.md §9.3 sharding algebra;
    docs/DESIGN.md §4):

    layout="sharded_w2" (default): every weight shards along ``model``
    — W1/theta1 over the code dimension n, W2/theta2 over the z
    dimension d — so Adam moments shard too and the tp_large acceptance
    shape fits per-chip HBM (parallel/memory.py audits this). Only the
    m-sized ACTIVATIONS (z, lam, b) are replicated across 'model'.

    layout="replicated_w2": round-1 layout (W2/theta2/moments
    replicated) — one collective per layer, but ~16 GB/chip of
    replicated state at tp_large; kept for the measured trade and for
    small-m configs.

      W1 (K, n, m): shard n          | theta1 (K, n): shard n
      W2 (K, d, m): shard d / repl.  | theta2 (K, d): shard d / repl.
      A  (m, n):    shard n-columns  | beta: replicate
    """
    from dladmm_tpu.models.unroll import DLADMMParams
    from dladmm_tpu.parallel.collectives import param_specs

    specs = param_specs(layout)
    return {
        "params": type(specs)(
            *(NamedSharding(mesh, s) for s in specs)
        ),
        "A": NamedSharding(mesh, P(None, MODEL_AXIS)),
    }
