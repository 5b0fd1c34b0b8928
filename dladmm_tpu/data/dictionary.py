"""Patch dictionaries for the image-denoising benchmark (SURVEY.md R8/N5).

The reference ships a learned dictionary as a .mat fixture; with no
fixtures available (empty mount, SURVEY.md §9.5) we build the standard
overcomplete 2-D DCT dictionary instead — the classical K-SVD starting
dictionary — and note the metric-comparability caveat in BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array


def dct_dictionary(patch: int = 8, atoms_per_dim: int = 16, dtype=jnp.float32) -> Array:
    """Overcomplete 2-D DCT dictionary: (patch^2, atoms_per_dim^2),
    columns unit-norm. patch=8, atoms=16 -> 64 x 256 (4x overcomplete)."""
    k = np.arange(patch)[:, None]
    j = np.arange(atoms_per_dim)[None, :]
    D1 = np.cos(np.pi * (k + 0.5) * j / atoms_per_dim)  # (patch, atoms)
    D1 -= D1.mean(axis=0, keepdims=True) * (j > 0)  # zero-mean AC atoms
    D1 /= np.linalg.norm(D1, axis=0, keepdims=True)
    D = np.kron(D1, D1)  # (patch^2, atoms^2)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    return jnp.asarray(D, dtype)
