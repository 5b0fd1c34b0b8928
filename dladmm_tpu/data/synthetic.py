"""Deterministic synthetic sparse-coding data via jax PRNG (SURVEY.md R5/N5).

Replaces the reference's numpy/scipy generation (SURVEY.md §3.1 "Data" row):
  * Gaussian dictionary A ~ N(0, 1), column-normalized.
  * Sparse codes x*: Bernoulli(support) x Gaussian(values).
  * Sparse corruption e*: Bernoulli x Gaussian (impulse noise).
  * Observations b = A x* + e*   (the l1/l1 benchmark has B = I, z = e).

All generation is functional off a jax PRNG key, so data is reproducible
across hosts/devices and can be generated directly on device inside a
jitted step (no host->device copies in the training hot loop).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class SyntheticBatch(NamedTuple):
    b: Array  # (S, m) observations
    x_star: Array  # (S, n) ground-truth sparse code
    # Ground-truth z stream: sparse corruption e* of shape (S, m) in the
    # benchmark B = I case, or the sparse code z* of shape (S, d) when a
    # general z-dictionary B is passed to make_batch (b = A x* + B z*).
    e_star: Array


def make_dictionary(key: jax.Array, m: int, n: int, dtype=jnp.float32) -> Array:
    """Gaussian dictionary with unit-norm columns (SURVEY.md §5.1)."""
    A = jax.random.normal(key, (m, n), dtype)
    return A / jnp.linalg.norm(A, axis=0, keepdims=True)


def seed_keys(config):
    """The config seed's canonical 3-way split: (k_dict, k_eval,
    k_train). The ONE derivation every entry point shares — fit /
    fit_greedy / fit_sharded consume all three, problem_matrices takes
    k_dict, and the serving CLI's --demo takes k_eval so its NMSE is
    comparable to training evals."""
    return tuple(jax.random.split(jax.random.PRNGKey(config.train.seed), 3))


def load_array_spec(spec: str):
    """Load a numpy array from ``file.npy`` or ``file.npz[:key]`` (npz
    default key: 'b' if present, else the first array). Shared by the
    serving and denoise CLIs so the request/image file grammar cannot
    drift between them."""
    import numpy as np

    path, _, key = spec.partition(":")
    data = np.load(path)
    if isinstance(data, np.ndarray):
        return data
    return data[key or ("b" if "b" in data.files else data.files[0])]


def problem_matrices(config, A: Array | None = None):
    """Derive the problem's FIXED matrices (A, B) from the config seed.

    The single shared derivation used by every entry point — fit,
    fit_greedy, fit_sharded, and the serving CLI — so a checkpoint
    trained under a config always reattaches to the identical
    dictionary: ``k_dict`` is the first of the seed's 3-way split, and
    the general z-dictionary B (when ``identity_B=False``) comes from
    ``fold_in(k_dict, 1)`` so A is unchanged vs the identity-B presets
    at the same seed. Pass A to keep a caller-supplied dictionary while
    still deriving B.
    """
    p, t = config.problem, config.train
    dtype = jnp.dtype(t.dtype)
    k_dict = seed_keys(config)[0]
    if A is None:
        A = make_dictionary(k_dict, p.m, p.n, dtype)
    B = None
    if not getattr(p, "identity_B", True):
        B = make_dictionary(
            jax.random.fold_in(k_dict, 1), p.m, p.d or p.m, dtype
        )
    return A, B


def _bernoulli_gaussian(
    key: jax.Array, shape, sparsity: float, dtype
) -> Array:
    """support ~ Bernoulli(sparsity), values ~ N(0, 1)."""
    ks, kv = jax.random.split(key)
    support = jax.random.bernoulli(ks, sparsity, shape)
    vals = jax.random.normal(kv, shape, dtype)
    return jnp.where(support, vals, 0.0).astype(dtype)


def make_batch(
    key: jax.Array,
    A: Array,
    batch: int,
    sparsity_x: float = 0.1,
    sparsity_e: float = 0.1,
    dtype=jnp.float32,
    B: Array | None = None,
    nonneg_x: bool = False,
) -> SyntheticBatch:
    """One batch of (b, x*, e*) with b = A x* + e*. Jit-safe.

    With a general z-dictionary B (m, d) the z stream is itself a sparse
    code: e_star becomes z* of shape (batch, d) with sparsity_e support,
    and b = A x* + B z* (SURVEY.md §2's general constraint Ax + Bz = b).

    nonneg_x=True folds the Gaussian values of x* to |N(0,1)| (half-
    normal) so the ground truth lives in the nonnegative sparse-coding
    model class — pairs with ProblemConfig.prox_x="nonneg_l1"
    (ops/prox.py).
    """
    m, n = A.shape
    kx, ke = jax.random.split(key)
    x_star = _bernoulli_gaussian(kx, (batch, n), sparsity_x, dtype)
    if nonneg_x:
        x_star = jnp.abs(x_star)
    if B is None:
        e_star = _bernoulli_gaussian(ke, (batch, m), sparsity_e, dtype)
        b = x_star @ A.T + e_star
    else:
        e_star = _bernoulli_gaussian(ke, (batch, B.shape[1]), sparsity_e, dtype)
        b = x_star @ A.T + e_star @ B.T
    return SyntheticBatch(b=b, x_star=x_star, e_star=e_star)


def batch_stream(
    key: jax.Array,
    A: Array,
    batch: int,
    sparsity_x: float = 0.1,
    sparsity_e: float = 0.1,
    dtype=jnp.float32,
    B: Array | None = None,
) -> Iterator[SyntheticBatch]:
    """Infinite deterministic stream of training batches."""
    while True:
        key, sub = jax.random.split(key)
        yield make_batch(sub, A, batch, sparsity_x, sparsity_e, dtype, B)
