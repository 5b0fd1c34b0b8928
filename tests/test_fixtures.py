""".mat fixture loader round-trips (data/fixtures.py; SURVEY.md R5/R8):
fixtures are synthesized with scipy.io.savemat since the reference mount
was empty."""

import numpy as np
import pytest
import scipy.io as sio

from dladmm_tpu.data.fixtures import load_mat_dictionary, load_mat_image


def test_dictionary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    D = rng.normal(size=(64, 256))
    path = str(tmp_path / "dict.mat")
    sio.savemat(path, {"D": D})
    A = load_mat_dictionary(path)  # auto-picks the single 2-D array
    assert A.shape == (64, 256)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(A), axis=0), 1.0, rtol=1e-5
    )
    # Direction preserved by normalization.
    ratio = np.asarray(A)[:, 0] / (D[:, 0] / np.linalg.norm(D[:, 0]))
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-5)


def test_dictionary_transposed_fixture(tmp_path):
    D = np.random.default_rng(1).normal(size=(256, 64))  # stored tall
    path = str(tmp_path / "dict_t.mat")
    sio.savemat(path, {"W": D})
    A = load_mat_dictionary(path, key="W")
    assert A.shape == (64, 256)


def test_dictionary_key_errors(tmp_path):
    path = str(tmp_path / "multi.mat")
    sio.savemat(path, {"D1": np.eye(4), "D2": np.eye(4)})
    with pytest.raises(ValueError, match="pass key="):
        load_mat_dictionary(path)
    with pytest.raises(KeyError, match="available"):
        load_mat_dictionary(path, key="nope")
    A = load_mat_dictionary(path, key="D2", normalize=False)
    np.testing.assert_allclose(np.asarray(A), np.eye(4))


def test_image_uint8_and_float(tmp_path):
    img8 = (np.random.default_rng(2).random((32, 32)) * 255).astype(np.uint8)
    p1 = str(tmp_path / "img8.mat")
    sio.savemat(p1, {"img": img8})
    out = load_mat_image(p1)
    assert out.shape == (32, 32)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    np.testing.assert_allclose(np.asarray(out), img8 / 255.0, atol=1e-6)

    imgf = np.random.default_rng(3).random((16, 16))
    p2 = str(tmp_path / "imgf.mat")
    sio.savemat(p2, {"img": imgf})
    np.testing.assert_allclose(np.asarray(load_mat_image(p2)), imgf,
                               atol=1e-6)


def test_mat_dictionary_drives_denoiser(tmp_path):
    """End to end: a .mat dictionary fixture plugs into the denoising
    pipeline exactly like the reference's."""
    import jax

    from dladmm_tpu.data.dictionary import dct_dictionary
    from dladmm_tpu.data.images import salt_pepper, synthetic_image
    from dladmm_tpu.metrics.core import psnr
    from dladmm_tpu.run_denoise import denoise_image, train_denoiser

    D = np.asarray(dct_dictionary())
    path = str(tmp_path / "learned.mat")
    sio.savemat(path, {"D": D})
    A = load_mat_dictionary(path)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    train_imgs = [synthetic_image(k1, 64)]
    params = train_denoiser(A, train_imgs, K=6, steps=30, density=0.1,
                            log_every=0)
    clean = synthetic_image(k2, 64)
    noisy = salt_pepper(k3, clean, 0.1)
    recon = denoise_image(params, A, noisy)
    assert float(psnr(recon, clean)) - float(psnr(noisy, clean)) > 3.0
