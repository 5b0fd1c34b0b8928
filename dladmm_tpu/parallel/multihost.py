"""Multi-host training support (SURVEY.md §5.5, §9.4; BASELINE.json:11).

The reference is single-process; this module adds the N>=2-host path:
``jax.distributed.initialize`` (gated so single-host runs don't need a
coordinator), a DCN x ICI mesh with the 'data' axis outermost (gradient
allreduce crosses DCN exactly once per step), and host-local batch
construction assembled into globally-sharded arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dladmm_tpu.data.synthetic import SyntheticBatch, make_batch
from dladmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize cross-host JAX. No-op when already initialized (e.g.
    the launcher called jax.distributed.initialize itself) or when
    unconfigured single-host."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and jax.process_count() == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(model: int = 1) -> Mesh:
    """('data','model') mesh over ALL processes' devices; 'data' is the
    outer axis so cross-host (DCN) collectives are confined to the
    gradient psum. 'model' groups devices within a host (ICI)."""
    devices = np.array(jax.devices())
    n = devices.size
    if n % model:
        raise ValueError(f"{n} global devices not divisible by model={model}")
    return Mesh(devices.reshape(n // model, model), (DATA_AXIS, MODEL_AXIS))


def host_local_batch(
    key: jax.Array,
    A,
    global_batch: int,
    mesh: Mesh,
    sparsity_x: float = 0.1,
    sparsity_e: float = 0.1,
    dtype=jnp.float32,
    B=None,
) -> SyntheticBatch:
    """Build this host's slice of a deterministic global batch and
    assemble globally-sharded arrays (SURVEY.md §9.4:
    jax.make_array_from_process_local_data).

    Every host derives the SAME per-host key split from the global key,
    then generates only its own shard — identical global data to the
    single-host run, with no cross-host data motion. B: the general
    z-dictionary (m, d) — the z* shard is then (S, d) and b = Ax* + Bz*.
    """
    nproc = jax.process_count()
    pid = jax.process_index()
    if global_batch % nproc:
        raise ValueError(f"global_batch {global_batch} % {nproc} != 0")
    local = global_batch // nproc
    local_key = jax.random.fold_in(key, pid)
    data = make_batch(local_key, A, local, sparsity_x, sparsity_e, dtype, B)

    n = A.shape[1]
    d = A.shape[0] if B is None else B.shape[1]
    specs = SyntheticBatch(
        b=P(DATA_AXIS, None),
        x_star=P(DATA_AXIS, MODEL_AXIS),
        e_star=P(DATA_AXIS, None),
    )
    global_shapes = SyntheticBatch(
        b=(global_batch, A.shape[0]),
        x_star=(global_batch, n),
        e_star=(global_batch, d),
    )
    return SyntheticBatch(
        *(
            jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(arr), shape
            )
            for arr, spec, shape in zip(data, specs, global_shapes)
        )
    )
