""".mat fixture loading (SURVEY.md R5/R8 parity).

The reference ships its learned patch dictionary and test images as
MATLAB .mat files loaded with scipy.io.loadmat. Users switching from the
reference bring those files; this module loads them into the framework's
conventions:

  * dictionaries -> (m, n) float arrays, columns unit-normalized
    (init_dladmm_params assumes unit-norm atoms for its Lipschitz step);
  * images -> (H, W) float arrays scaled to [0, 1].

The sandbox's reference mount was empty (SURVEY.md §0) so no fixture
files exist in-repo; tests synthesize .mat files with scipy.io.savemat
and round-trip them (tests/test_fixtures.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax import Array


def _load_mat(path: str) -> dict:
    try:
        import scipy.io as sio
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "loading .mat fixtures requires scipy (bundled in the "
            "standard environment)"
        ) from e
    return sio.loadmat(path)


def _pick_var(mat: dict, key: Optional[str], what: str) -> np.ndarray:
    if key is not None:
        if key not in mat:
            data_keys = [k for k in mat if not k.startswith("__")]
            raise KeyError(
                f"{what}: variable {key!r} not in .mat file; "
                f"available: {data_keys}"
            )
        return np.asarray(mat[key])
    data = {k: v for k, v in mat.items() if not k.startswith("__")}
    arrays = {
        k: np.asarray(v)
        for k, v in data.items()
        if np.asarray(v).ndim == 2 and np.asarray(v).size > 1
    }
    if len(arrays) != 1:
        raise ValueError(
            f"{what}: pass key= explicitly — found {sorted(data)} "
            "(need exactly one 2-D array to auto-pick)"
        )
    return next(iter(arrays.values()))


def load_mat_dictionary(
    path: str,
    key: Optional[str] = None,
    normalize: bool = True,
    dtype=jnp.float32,
    transpose="auto",
) -> Array:
    """Load a (m, n) dictionary from a .mat file (the reference's learned
    patch dictionary format). key=None auto-picks the single 2-D array.

    normalize=True rescales columns to unit norm — required by
    init_dladmm_params's spectral-norm step sizes; the reference's
    dictionaries are trained column-normalized so this is a no-op for
    well-formed fixtures.

    transpose: "auto" (default) transposes tall (m > n) arrays on the
    assumption an overcomplete dictionary is stored transposed, with a
    warning; True always transposes; False never does (use for genuinely
    undercomplete/tall dictionaries).
    """
    D = _pick_var(_load_mat(path), key, "dictionary").astype(np.float64)
    if D.ndim != 2:
        raise ValueError(f"dictionary must be 2-D, got shape {D.shape}")
    if transpose is True:
        D = D.T
    elif transpose == "auto" and D.shape[0] > D.shape[1]:
        # Overcomplete dictionaries are wide (m < n); a tall array is
        # almost certainly stored transposed.
        import warnings

        warnings.warn(
            f"{path}: tall {D.shape} array auto-transposed to "
            f"{D.shape[::-1]} (overcomplete dictionaries are wide); pass "
            "transpose=False if it is a genuinely undercomplete dictionary"
        )
        D = D.T
    if normalize:
        norms = np.linalg.norm(D, axis=0, keepdims=True)
        D = D / np.maximum(norms, 1e-12)
    return jnp.asarray(D, dtype)


def load_mat_image(
    path: str, key: Optional[str] = None, dtype=jnp.float32
) -> Array:
    """Load a grayscale (H, W) test image from a .mat file, scaled to
    [0, 1] (uint8 fixtures divide by 255; float fixtures pass through
    with a clip)."""
    img = _pick_var(_load_mat(path), key, "image")
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    if img.ndim != 2:
        raise ValueError(f"image must be 2-D grayscale, got {img.shape}")
    is_int = np.issubdtype(img.dtype, np.integer)
    img = img.astype(np.float64)
    if is_int or img.max() > 1.5:  # uint8-style range (dtype, not values
        # — a nearly-black integer image must still divide by 255)
        img = img / 255.0
    return jnp.asarray(np.clip(img, 0.0, 1.0), dtype)


__all__ = ["load_mat_dictionary", "load_mat_image"]
