"""Image-denoising benchmark tests (SURVEY.md R7/N5): patch pipeline
round-trips, dictionary properties, and a tiny end-to-end PSNR gain."""

import jax
import jax.numpy as jnp
import numpy as np

from dladmm_tpu.data.dictionary import dct_dictionary
from dladmm_tpu.data.images import (
    extract_patches,
    patch_dc,
    reconstruct_from_patches,
    salt_pepper,
    synthetic_image,
)


def test_dct_dictionary_shape_and_norms():
    D = dct_dictionary(patch=8, atoms_per_dim=16)
    assert D.shape == (64, 256)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(D), axis=0), 1.0, rtol=1e-5
    )


def test_patch_roundtrip_identity():
    img = synthetic_image(jax.random.PRNGKey(0), 64)
    for stride in (4, 8):  # overlapping and non-overlapping
        p = extract_patches(img, patch=8, stride=stride)
        rec = reconstruct_from_patches(p, 64, patch=8, stride=stride)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(img), rtol=1e-5, atol=1e-6
        )


def test_salt_pepper_density():
    img = jnp.full((128, 128), 0.5)
    noisy = salt_pepper(jax.random.PRNGKey(0), img, density=0.2)
    frac = float((noisy != 0.5).mean())
    assert 0.15 < frac < 0.25
    assert set(np.unique(np.asarray(noisy))) <= {0.0, 0.5, 1.0}


def test_patch_dc_robust_to_impulses():
    p = jnp.full((3, 64), 0.4).at[:, :6].set(1.0)  # 6/64 impulses
    dc = patch_dc(p)
    np.testing.assert_allclose(np.asarray(dc), 0.4, atol=1e-6)


def test_end_to_end_denoise_gain():
    """Tiny training budget must still yield a clear PSNR gain."""
    from dladmm_tpu.metrics.core import psnr
    from dladmm_tpu.run_denoise import denoise_image, train_denoiser

    A = dct_dictionary()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    train_imgs = [synthetic_image(k1, 64)]
    params = train_denoiser(
        A, train_imgs, K=6, steps=30, density=0.1, log_every=0
    )
    clean = synthetic_image(k2, 64)
    noisy = salt_pepper(k3, clean, 0.1)
    recon = denoise_image(params, A, noisy)
    gain = float(psnr(recon, clean)) - float(psnr(noisy, clean))
    assert gain > 3.0, gain
