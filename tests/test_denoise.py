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


def test_dropout_mask_density_and_zeroing():
    from dladmm_tpu.data.images import dropout_mask

    img = jnp.full((128, 128), 0.5)
    noisy, mask = dropout_mask(jax.random.PRNGKey(0), img, density=0.3)
    frac_missing = 1.0 - float(mask.mean())
    assert 0.25 < frac_missing < 0.35
    # Missing pixels are exactly zero; observed ones untouched.
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(img * mask))


def test_end_to_end_inpaint_gain():
    """Known-mask inpainting: observed pixels exact, clear PSNR gain."""
    from dladmm_tpu.data.images import dropout_mask
    from dladmm_tpu.metrics.core import psnr
    from dladmm_tpu.run_denoise import denoise_image, train_denoiser

    A = dct_dictionary()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    train_imgs = [synthetic_image(k1, 64)]
    params = train_denoiser(
        A, train_imgs, K=6, steps=30, density=0.3, log_every=0,
        mode="inpaint",
    )
    clean = synthetic_image(k2, 64)
    noisy, mask = dropout_mask(k3, clean, 0.3)
    recon = denoise_image(params, A, noisy, mask=mask)
    # Observed pixels are passed through exactly (up to the clip).
    obs = np.asarray(mask) > 0
    np.testing.assert_allclose(
        np.asarray(recon)[obs], np.asarray(noisy)[obs], atol=1e-6
    )
    gain = float(psnr(recon, clean)) - float(psnr(noisy, clean))
    assert gain > 5.0, gain


def test_learn_dictionary_improves_sparse_fit():
    """FISTA+MOD learning must (a) keep unit-norm atoms, (b) reduce the
    LASSO objective on training patches vs the DCT init."""
    from dladmm_tpu.data.dictionary import _fista_code, learn_dictionary

    key = jax.random.PRNGKey(0)
    img = synthetic_image(key, 64)
    P = extract_patches(img, 8, 4)
    P = P - jnp.mean(P, axis=1, keepdims=True)
    D0 = dct_dictionary()
    D = learn_dictionary(P, D0, n_atoms=256, outer=4, fista_iters=25)
    assert D.shape == D0.shape
    norms = np.linalg.norm(np.asarray(D), axis=0)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-3)

    lam = 0.05

    def objective(Dk):
        X = _fista_code(Dk, P, lam, 25)
        r = P - X @ Dk.T
        return float(0.5 * jnp.sum(r * r) + lam * jnp.sum(jnp.abs(X)))

    assert objective(D) < 0.9 * objective(D0), (objective(D), objective(D0))


def test_save_load_denoiser_roundtrip_and_cli_apply(tmp_path, capsys):
    """save_denoiser/load_denoiser round-trip bit-exactly, and the CLI's
    --load --input-image path restores a user-supplied corrupted array."""
    import json

    from dladmm_tpu.run_denoise import (
        denoise_image,
        load_denoiser,
        main,
        save_denoiser,
        train_denoiser,
    )

    A = dct_dictionary()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = train_denoiser(
        A, [synthetic_image(k1, 64)], K=6, steps=30, density=0.1, log_every=0
    )
    net = tmp_path / "net.npz"
    save_denoiser(net, params, A)
    params2, A2 = load_denoiser(net)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), params, params2)
    )
    np.testing.assert_array_equal(np.asarray(A), np.asarray(A2))

    clean = synthetic_image(k2, 64)
    noisy = salt_pepper(k3, clean, 0.1)
    inp = tmp_path / "noisy.npy"
    out = tmp_path / "recon.npy"
    np.save(inp, np.asarray(noisy))
    assert (
        main(
            [
                "--load",
                str(net),
                "--input-image",
                str(inp),
                "--output-image",
                str(out),
            ]
        )
        == 0
    )
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shape"] == [64, 64]
    # CLI reconstruction == direct library reconstruction, exactly.
    np.testing.assert_allclose(
        np.load(out), np.asarray(denoise_image(params, A, noisy)), atol=1e-6
    )


def test_denoise_cli_flag_validation(tmp_path):
    import pytest

    from dladmm_tpu.run_denoise import main

    with pytest.raises(SystemExit):
        main(["--load", "x.npz", "--dict=learned"])
    with pytest.raises(SystemExit):
        main(["--mask", "m.npy"])  # --mask without --input-image
    with pytest.raises(SystemExit):  # inpaint user image needs a mask
        main(["--load", "x.npz", "--mode=inpaint", "--input-image", "i.npy"])
