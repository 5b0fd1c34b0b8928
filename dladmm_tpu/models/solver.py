"""High-level solver API — the ergonomic equivalent of the reference's
``net = DLADMMNet(A, K); net(b)`` usage (SURVEY.md §3.1 Model row).

    solver = DLADMMSolver(A, K=15)          # LADMM-exact init
    solver = solver.fit(key, steps=2000)    # end-to-end training
    x, e = solver.solve(b)                  # sparse code + corruption
    curve = solver.nmse_curve(b, x_star)    # NMSE(dB) per layer

Stateless-functional under the hood (params are a pytree; fit returns a
new solver), so instances jit/pmap/shard cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from dladmm_tpu.metrics.core import constraint_residual, per_layer_nmse_db
from dladmm_tpu.models.api import select_forward
from dladmm_tpu.models.unroll import (
    DLADMMParams,
    dladmm_forward,
    init_dladmm_params,
)


@dataclasses.dataclass(frozen=True)
class DLADMMSolver:
    A: Array
    params: DLADMMParams
    B: Optional[Array] = None
    kernel: str = "auto"

    @classmethod
    def create(
        cls,
        A: Array,
        B: Optional[Array] = None,
        K: int = 15,
        beta: float = 1.0,
        kernel: str = "auto",
    ) -> "DLADMMSolver":
        return cls(
            A=A, params=init_dladmm_params(A, B, K=K, beta=beta), B=B,
            kernel=kernel,
        )

    @property
    def K(self) -> int:
        return self.params.K

    def _paths(self, S: int, need_trajectory: bool = False):
        m, n = self.A.shape
        d = m if self.B is None else self.B.shape[1]
        return select_forward(
            m, n, d, S, kernel=self.kernel,
            need_trajectory=need_trajectory, identity_B=self.B is None,
        )

    def solve(self, b: Array) -> Tuple[Array, Array]:
        """b (S, m) -> (x, z): sparse code + corruption estimate."""
        forward_fn, step_fn, _ = self._paths(b.shape[0])
        if forward_fn is not None:
            x, z, _ = forward_fn(self.params, self.A, b)
        else:
            x, z, _ = dladmm_forward(
                self.params, self.A, b, B=self.B, step_fn=step_fn
            )
        return x, z

    def trajectory(self, b: Array):
        """Per-layer (x_k, z_k, lam_k) stacks, (K, S, ·)."""
        if self.B is None and self.kernel in ("auto", "megakernel", "pallas"):
            from dladmm_tpu.ops.pallas_unroll import (
                make_unrolled_trajectory,
                unroll_fits_vmem,
            )

            m, n = self.A.shape
            if unroll_fits_vmem(m, n, m, b.shape[0]):
                return make_unrolled_trajectory()(self.params, self.A, b)
        _, step_fn, _ = self._paths(b.shape[0], need_trajectory=True)
        _, traj = dladmm_forward(
            self.params, self.A, b, B=self.B, capture_trajectory=True,
            step_fn=step_fn,
        )
        return traj

    def nmse_curve(self, b: Array, x_star: Array) -> Array:
        tx, _, _ = self.trajectory(b)
        return per_layer_nmse_db(tx, x_star)

    def residual(self, b: Array) -> Array:
        x, z = self.solve(b)
        return constraint_residual(self.A, b, x, z, self.B)

    def fit(
        self,
        key: jax.Array,
        steps: int = 1000,
        batch: int = 64,
        lr: float = 1e-3,
        sparsity_x: float = 0.1,
        sparsity_e: float = 0.1,
    ) -> "DLADMMSolver":
        """End-to-end supervised training on synthetic data drawn from
        this solver's dictionary; returns a NEW solver."""
        from dladmm_tpu.train.loop import TrainState, make_train_step

        forward_fn, step_fn, _ = self._paths(batch)
        optimizer = optax.adam(lr)
        # donate=False: this solver's params pytree must stay alive.
        step = make_train_step(
            optimizer, self.A, batch, sparsity_x, sparsity_e, self.B,
            None, step_fn, forward_fn, donate=False,
        )
        state = TrainState(
            self.params, optimizer.init(self.params),
            jnp.zeros((), jnp.int32),
        )
        for i in range(steps):
            state, _ = step(state, jax.random.fold_in(key, i))
        return dataclasses.replace(self, params=state.params)
