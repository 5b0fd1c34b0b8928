"""Image patch pipeline for the denoising benchmark (SURVEY.md R7/§5.4).

Replaces the reference's .mat test-image fixtures (unavailable — empty
mount) with deterministic synthetic test images, and implements the patch
machinery the reference builds with numpy/scipy: overlapping patch
extraction, impulse (salt & pepper) corruption, and overlap-average
reconstruction. Extraction/reconstruction are pure JAX and jit-safe, so
the whole denoise pass can run on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def synthetic_image(key: jax.Array, size: int = 128, dtype=jnp.float32) -> Array:
    """Deterministic piecewise-smooth test image in [0, 1]: smooth
    gradients + rectangles + circles + a sinusoidal texture strip —
    enough structure for PSNR to be meaningful."""
    ky, kx, kt = jax.random.split(key, 3)
    yy, xx = jnp.meshgrid(
        jnp.linspace(0, 1, size), jnp.linspace(0, 1, size), indexing="ij"
    )
    img = 0.3 + 0.4 * xx + 0.2 * yy
    # rectangle
    r0, r1 = 0.15, 0.45
    img = jnp.where((yy > r0) & (yy < r1) & (xx > 0.5) & (xx < 0.85), 0.85, img)
    # circle
    cy, cx, rad = 0.65, 0.3, 0.18
    img = jnp.where((yy - cy) ** 2 + (xx - cx) ** 2 < rad**2, 0.15, img)
    # texture strip
    tex = 0.5 + 0.25 * jnp.sin(2 * jnp.pi * 12 * xx) * jnp.sin(2 * jnp.pi * 3 * yy)
    img = jnp.where(yy > 0.8, tex, img)
    return jnp.clip(img, 0.0, 1.0).astype(dtype)


def salt_pepper(key: jax.Array, img: Array, density: float = 0.1) -> Array:
    """Impulse corruption: fraction `density` of pixels forced to 0 or 1
    (the reference benchmark's noise model, SURVEY.md §5.4)."""
    km, kv = jax.random.split(key)
    hit = jax.random.bernoulli(km, density, img.shape)
    val = jax.random.bernoulli(kv, 0.5, img.shape).astype(img.dtype)
    return jnp.where(hit, val, img)


def dropout_mask(key: jax.Array, img: Array, density: float = 0.3):
    """Inpainting corruption: fraction `density` of pixels MISSING (known
    mask). Returns (corrupted, mask) with mask==1 on observed pixels and
    corrupted==0 on missing ones — the l1/l1 model's e channel absorbs
    the (known-location) deletions exactly like impulse noise."""
    keep = ~jax.random.bernoulli(key, density, img.shape)
    mask = keep.astype(img.dtype)
    return img * mask, mask


@functools.partial(jax.jit, static_argnames=("patch", "stride"))
def extract_patches(img: Array, patch: int = 8, stride: int = 4) -> Array:
    """(H, W) -> (num_patches, patch*patch), row-major over patch grid."""
    H, W = img.shape
    ny = (H - patch) // stride + 1
    nx = (W - patch) // stride + 1
    iy = jnp.arange(ny) * stride
    ix = jnp.arange(nx) * stride

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (patch, patch)).reshape(-1)

    return jax.vmap(
        lambda y: jax.vmap(lambda x: one(y, x))(ix)
    )(iy).reshape(ny * nx, patch * patch)


@functools.partial(jax.jit, static_argnames=("size", "patch", "stride"))
def reconstruct_from_patches(
    patches: Array, size: int, patch: int = 8, stride: int = 4
) -> Array:
    """Overlap-average inverse of extract_patches."""
    ny = (size - patch) // stride + 1
    nx = (size - patch) // stride + 1
    acc = jnp.zeros((size, size), patches.dtype)
    cnt = jnp.zeros((size, size), patches.dtype)
    ones = jnp.ones((patch, patch), patches.dtype)
    ps = patches.reshape(ny, nx, patch, patch)

    def body(i, carry):
        acc, cnt = carry
        y = (i // nx) * stride
        x = (i % nx) * stride
        p = jax.lax.dynamic_index_in_dim(
            ps.reshape(ny * nx, patch, patch), i, keepdims=False
        )
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (y, x), (patch, patch)) + p, (y, x)
        )
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(cnt, (y, x), (patch, patch)) + ones, (y, x)
        )
        return acc, cnt

    acc, cnt = jax.lax.fori_loop(0, ny * nx, body, (acc, cnt))
    return acc / jnp.maximum(cnt, 1.0)


def patch_dc(patches: Array) -> Array:
    """Robust per-patch DC estimate (median — immune to impulse noise);
    subtracted before sparse coding, added back after reconstruction."""
    return jnp.median(patches, axis=1, keepdims=True)
