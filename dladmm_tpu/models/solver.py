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
    # Proximal operators (ops/prox.py registry names). Non-l1 pairs run
    # the XLA scan with the general prox step — the Pallas fast paths
    # are l1-specialized (SURVEY.md §2 point 4's fast-path philosophy).
    prox_x: str = "l1"
    prox_z: str = "l1"
    prox_rho: float = 0.0

    @classmethod
    def create(
        cls,
        A: Array,
        B: Optional[Array] = None,
        K: int = 15,
        beta: float = 1.0,
        kernel: str = "auto",
        prox_x: str = "l1",
        prox_z: str = "l1",
        prox_rho: float = 0.0,
    ) -> "DLADMMSolver":
        return cls(
            A=A, params=init_dladmm_params(A, B, K=K, beta=beta), B=B,
            kernel=kernel, prox_x=prox_x, prox_z=prox_z, prox_rho=prox_rho,
        )

    @property
    def K(self) -> int:
        return self.params.K

    def _prox_step(self):
        """The general-prox cached layer step, or None for l1/l1.

        Cached on the instance (object.__setattr__ on the frozen
        dataclass) so repeated solve/trajectory calls reuse ONE step
        callable — jit treats step_fn as a static argument, and a fresh
        closure per call would retrace every time."""
        cached = getattr(self, "_prox_step_cache", False)
        if cached is not False:
            return cached
        from dladmm_tpu.ops.prox import get_prox, is_l1
        from dladmm_tpu.ops.reference import make_cached_step

        step = (
            None
            if is_l1(self.prox_x, self.prox_z, self.prox_rho)
            else make_cached_step(
                get_prox(self.prox_x, self.prox_rho),
                get_prox(self.prox_z, self.prox_rho),
            )
        )
        object.__setattr__(self, "_prox_step_cache", step)
        return step

    def _paths(
        self, S: int, need_trajectory: bool = False, training: bool = False
    ):
        step = self._prox_step()
        if step is not None:
            if self.kernel == "pallas":
                # The per-layer fused kernel hand-writes the l1 shrink;
                # an explicit selection must not silently run something
                # else (ADVICE r3). The whole-unroll megakernel IS
                # prox-templated since round 5 (below).
                raise ValueError(
                    f"kernel={self.kernel!r} is l1/l1-only; prox "
                    f"{self.prox_x}/{self.prox_z} uses the prox "
                    "megakernel (kernel='auto'/'megakernel') or the "
                    "XLA scan (kernel='reference')"
                )
            if self.kernel == "megakernel" and (training or need_trajectory):
                # The prox megakernel is INFERENCE-only (no VJP, no
                # trajectory variant) — an explicit selection for
                # fit()/trajectory() must raise, not silently run the
                # XLA scan (the same no-silent-downgrade rule as above).
                raise ValueError(
                    "kernel='megakernel' with a general prox covers "
                    "solve() only (the prox megakernel has no backward/"
                    "trajectory variant); use kernel='auto' for "
                    "training and trajectories"
                )
            if (
                self.B is None
                and not need_trajectory
                and not training  # inference-only kernel: no custom_vjp
                and self.kernel in ("auto", "megakernel")
            ):
                # Prox-templated inference megakernel (round 5): the
                # trained prox served at l1-megakernel speed where a
                # tile fits VMEM.
                from dladmm_tpu.ops.pallas_unroll import (
                    make_unrolled_inference_prox,
                    prox_megakernel_available,
                )
                from dladmm_tpu.ops.prox import get_prox

                px = get_prox(self.prox_x, self.prox_rho)
                pz = get_prox(self.prox_z, self.prox_rho)
                m, n = self.A.shape
                avail, why = prox_megakernel_available(
                    (px, pz), m, n, m, S
                )
                if avail:
                    fwd = make_unrolled_inference_prox(px, pz)
                    return fwd, step, "prox-megakernel"
                if self.kernel == "megakernel":
                    raise ValueError(
                        f"prox megakernel unavailable at batch {S}: "
                        f"{why}; use kernel='auto'"
                    )
            return None, step, "xla-scan-general-prox"
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
        if (
            self.B is None
            and self._prox_step() is None
            and self.kernel in ("auto", "megakernel", "pallas")
        ):
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
        nonneg_x: bool = False,
    ) -> "DLADMMSolver":
        """End-to-end supervised training on synthetic data drawn from
        this solver's dictionary; returns a NEW solver.

        nonneg_x: generate nonnegative ground-truth x* (pairs with
        prox_x='nonneg_l1')."""
        from dladmm_tpu.train.loop import TrainState, make_train_step

        forward_fn, step_fn, _ = self._paths(batch, training=True)
        optimizer = optax.adam(lr)
        # donate=False: this solver's params pytree must stay alive.
        step = make_train_step(
            optimizer, self.A, batch, sparsity_x, sparsity_e, self.B,
            None, step_fn, forward_fn, donate=False, nonneg_x=nonneg_x,
        )
        state = TrainState(
            self.params, optimizer.init(self.params),
            jnp.zeros((), jnp.int32),
        )
        for i in range(steps):
            state, _ = step(state, jax.random.fold_in(key, i))
        return dataclasses.replace(self, params=state.params)
