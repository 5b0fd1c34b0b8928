"""Checkpoint / resume (SURVEY.md §7 row 4).

The reference keeps weights only for the script's lifetime; here training
state (params + optimizer state + step) is checkpointed with
orbax-checkpoint, multi-host-safe (orbax coordinates a single writer per
shard). A plain-numpy fallback writer covers environments without orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> str:
    """Write a checkpoint; returns the concrete directory written."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        ckpt.save(target, state, force=True)
        ckpt.wait_until_finished()
        return target
    # Fallback: flat .npz of leaves (single-host only).
    leaves, treedef = jax.tree.flatten(state)
    target = (
        os.path.join(path, f"step_{step}.npz") if step is not None else path + ".npz"
    )
    os.makedirs(os.path.dirname(target), exist_ok=True)
    np.savez(target, *[np.asarray(l) for l in leaves])
    return target


def _abstract_leaf(x, pin_default: bool = False):
    """ShapeDtypeStruct carrying the template leaf's NamedSharding (if
    any) so sharded training states restore DIRECTLY into their mesh
    layout — no host round-trip, single reader per shard (SURVEY.md §7
    checkpoint row; exercised by tests/test_resume.py sharded cases).

    Leaves without a NamedSharding normally carry NO sharding, letting
    orbax restore them with the sharding recorded at save time (e.g. the
    replicated-over-mesh layout of a sharded state's scalar step/count).
    With ``pin_default=True`` they are pinned to this backend's default
    device instead — the fallback for restoring a checkpoint written on
    a DIFFERENT backend (TPU-trained, CPU-served during a relay outage),
    where the saved sharding names devices that no longer exist and
    orbax fails with "sharding ... Got None"."""
    from jax.sharding import NamedSharding, SingleDeviceSharding

    sharding = getattr(x, "sharding", None)
    if isinstance(sharding, NamedSharding):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    if pin_default:
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=SingleDeviceSharding(jax.devices()[0])
        )
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure/shapes/dtypes/shardings of ``template``."""
    # orbax rejects relative paths outright ("Checkpoint path should be
    # absolute"); save_checkpoint already absolutizes, so mirror it here
    # for CLI-supplied relative --ckpt-dir values.
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        abstract = jax.tree.map(_abstract_leaf, template)
        try:
            return ckpt.restore(path, abstract)
        except ValueError as e:
            if "sharding" not in str(e).lower():
                raise
            # Cross-backend restore: the checkpoint's saved shardings
            # name devices of the SAVING backend (see _abstract_leaf).
            abstract = jax.tree.map(
                lambda x: _abstract_leaf(x, pin_default=True), template
            )
            return ckpt.restore(path, abstract)
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = [
        jax.numpy.asarray(data[f"arr_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, restored)


def latest_step_dir(path: str) -> Optional[str]:
    """Most recent step_N checkpoint under ``path`` (resume helper)."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1].split(".")[0]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(path, max(steps)[1])
