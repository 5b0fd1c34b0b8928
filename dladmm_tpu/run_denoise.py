"""Image denoising / inpainting benchmark CLI (SURVEY.md §5.4, R7).

``python -m dladmm_tpu.run_denoise [--quick] [--mode {denoise,inpaint}]
                                   [--dict {dct,learned}]``

Pipeline (reference call stack §5.4, fixture-free per §9.5):
  1. Patch dictionary A (64 x 256): overcomplete 2-D DCT, or LEARNED from
     clean training patches with our own solver (FISTA + MOD alternation,
     data/dictionary.py) — the fixture-free stand-ins for the reference's
     learned .mat dictionary (caveat noted in BASELINE.md).
  2. Corrupt test images — salt & pepper impulse noise (denoise mode) or
     known-mask pixel deletion (inpaint mode, BASELINE.json:9
     "denoising/inpainting"); extract overlapping patches; subtract
     robust (median) per-patch DC.
  3. Train the D-LADMM net end-to-end ON PATCH DATA: b = corrupted patch
     residual, supervised by ||A x_K - clean residual||^2 + ||e_K -
     corruption||^2 (the l1/l1 model: Ax + e = b).
  4. Reconstruct A x-hat + DC, overlap-average (inpaint mode additionally
     keeps the known-good observed pixels), report PSNR vs the corrupted
     input's PSNR.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import optax


def _corrupt(key, img, mode, density):
    """Apply the benchmark corruption. Returns (corrupted, mask-or-None);
    mask==1 marks observed pixels (inpaint mode only)."""
    from dladmm_tpu.data.images import dropout_mask, salt_pepper

    if mode == "inpaint":
        return dropout_mask(key, img, density)
    return salt_pepper(key, img, density), None


def _make_patch_batch(key, images, density, patch, stride, mode="denoise"):
    """Corrupt + patchify one epoch of training data (host-side prep,
    device compute)."""
    from dladmm_tpu.data.images import extract_patches, patch_dc

    ks = jax.random.split(key, len(images))
    bs, tgt_res, tgt_noise = [], [], []
    for k, img in zip(ks, images):
        noisy, _ = _corrupt(k, img, mode, density)
        p_noisy = extract_patches(noisy, patch, stride)
        p_clean = extract_patches(img, patch, stride)
        dc = patch_dc(p_noisy)
        bs.append(p_noisy - dc)
        tgt_res.append(p_clean - dc)
        tgt_noise.append(p_noisy - p_clean)
    return (
        jnp.concatenate(bs),
        jnp.concatenate(tgt_res),
        jnp.concatenate(tgt_noise),
    )


def train_denoiser(
    A,
    images,
    *,
    K=15,
    steps=400,
    lr=1e-3,
    density=0.1,
    patch=8,
    stride=4,
    seed=0,
    log_every=100,
    mode="denoise",
    layer_loss=None,
):
    """Train D-LADMM on patch data; returns trained params.

    layer_loss="uniform" deep-supervises the RECONSTRUCTION at every
    layer (uniform weights) through the trajectory path — the denoise
    analog of run.py's default deep supervision (BASELINE.md quality
    rows); None keeps the final-layer reconstruction loss.
    """
    from dladmm_tpu.models.api import resolve_forward
    from dladmm_tpu.models.unroll import init_dladmm_params

    params = init_dladmm_params(A, K=K, beta=1.0)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    # Patch shapes qualify for the whole-unroll megakernel (and, at
    # small batches, the Pallas backward) — same auto policy as run.py.
    S_epoch = sum(
        ((img.shape[0] - patch) // stride + 1)
        * ((img.shape[1] - patch) // stride + 1)
        for img in images
    )
    fwd, _ = resolve_forward(A.shape[0], A.shape[1], A.shape[0], S_epoch)
    if layer_loss is not None:
        # Deep supervision routes through the SAME trajectory-loss
        # implementation the synthetic path tests pin (train/loop.py
        # weighted_trajectory_mse + _layer_weights — VERDICT r2 #7);
        # only the supervised quantity differs (reconstruction A·x_k
        # instead of x_k).
        from dladmm_tpu.ops.pallas_unroll import make_unrolled_trajectory
        from dladmm_tpu.train.loop import (
            _layer_weights,
            weighted_trajectory_mse,
        )

        traj_fn = make_unrolled_trajectory()
        lw = _layer_weights(layer_loss, K, jnp.float32)

    @jax.jit
    def train_step(params, opt_state, b, tgt_res, tgt_noise):
        def loss_fn(params):
            if layer_loss is not None:
                tx, te, _ = traj_fn(params, A, b)  # (K, S, ·) stacks
                recon = jnp.matmul(tx, A.T)
                return weighted_trajectory_mse(
                    recon, te, tgt_res, tgt_noise, lw
                )
            x, e, _ = fwd(params, A, b)
            recon = x @ A.T
            return jnp.mean((recon - tgt_res) ** 2) + jnp.mean(
                (e - tgt_noise) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        key, sub = jax.random.split(key)
        b, tr, tn = _make_patch_batch(sub, images, density, patch, stride, mode)
        params, opt_state, loss = train_step(params, opt_state, b, tr, tn)
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1} loss {float(loss):.5f}", file=sys.stderr)
    return params


def save_denoiser(path, params, A) -> None:
    """Persist a trained denoiser (net + its patch dictionary) as one
    portable .npz — the dictionary is data the net was trained against,
    so it travels with the weights (unlike fit checkpoints, whose A is
    re-derivable from the config seed)."""
    import numpy as np

    np.savez(
        path,
        A=np.asarray(A),
        **{f: np.asarray(v) for f, v in params._asdict().items()},
    )


def load_denoiser(path):
    """Inverse of save_denoiser: returns (params, A)."""
    import numpy as np

    from dladmm_tpu.models.unroll import DLADMMParams

    d = np.load(path)
    params = DLADMMParams(
        **{f: jnp.asarray(d[f]) for f in DLADMMParams._fields}
    )
    return params, jnp.asarray(d["A"])


def _load_gray_image(spec: str, what: str = "--input-image"):
    """Grayscale image from ``file.npy`` or ``file.npz[:key]`` (shared
    grammar: data.synthetic.load_array_spec), float32 in [0, 1].

    Integer arrays are rescaled by their DTYPE range (a dim uint8 photo
    keeps its brightness — rescaling by the array max would contrast-
    stretch it and desync the output scale from the user's original).
    Float arrays must already be in [0, 1]."""
    import numpy as np

    from dladmm_tpu.data.synthetic import load_array_spec

    raw = np.asarray(load_array_spec(spec))
    if raw.ndim != 2:
        raise SystemExit(f"{what} must be 2-D grayscale; got {raw.shape}")
    if np.issubdtype(raw.dtype, np.integer):
        arr = raw.astype(np.float32) / np.iinfo(raw.dtype).max
    else:
        arr = raw.astype(np.float32)
        if arr.min() < 0.0 or arr.max() > 1.0:
            raise SystemExit(
                f"{what}: float values must be in [0, 1] (got "
                f"[{arr.min():.3g}, {arr.max():.3g}]); rescale first"
            )
    return jnp.asarray(arr)


def _load_mask(spec: str):
    """Known-observation mask from ``file.npy``/``file.npz[:key]``:
    nonzero = observed. Accepts bool, 0/1, or 0/255 encodings — image
    rescaling rules do NOT apply to masks."""
    import numpy as np

    from dladmm_tpu.data.synthetic import load_array_spec

    raw = np.asarray(load_array_spec(spec))
    if raw.ndim != 2:
        raise SystemExit(f"--mask must be 2-D; got {raw.shape}")
    return jnp.asarray((raw != 0).astype(np.float32))


def denoise_image(params, A, noisy, *, patch=8, stride=4, mask=None):
    """Restore one image with a trained net; returns the reconstruction.

    With a known observation ``mask`` (inpaint mode), observed pixels are
    kept from the input and only the missing ones are filled in.
    """
    from dladmm_tpu.data.images import (
        extract_patches,
        patch_dc,
        reconstruct_from_patches,
    )
    from dladmm_tpu.models.api import resolve_forward

    p_noisy = extract_patches(noisy, patch, stride)
    dc = patch_dc(p_noisy)
    fwd, _ = resolve_forward(
        A.shape[0], A.shape[1], A.shape[0], p_noisy.shape[0]
    )
    x, e, _ = fwd(params, A, p_noisy - dc)
    clean_patches = x @ A.T + dc
    out = reconstruct_from_patches(
        clean_patches, noisy.shape[0], patch, stride
    )
    if mask is not None:
        out = mask * noisy + (1.0 - mask) * out
    return jnp.clip(out, 0.0, 1.0)


def main(argv=None) -> int:
    from dladmm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DLADMM_PLATFORM=cpu for smoke runs / outages
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="tiny run for CI")
    ap.add_argument(
        "--mode",
        choices=("denoise", "inpaint"),
        default="denoise",
        help="impulse-noise removal or known-mask pixel inpainting",
    )
    ap.add_argument(
        "--dict",
        dest="dictionary",
        choices=("dct", "learned"),
        default="dct",
        help="overcomplete 2-D DCT, or learned from clean training "
        "patches (FISTA+MOD, data/dictionary.py)",
    )
    ap.add_argument(
        "--dict-mat",
        default=None,
        help="load the dictionary from a .mat fixture (the reference's "
        "learned-dictionary format; data/fixtures.py) instead of --dict",
    )
    ap.add_argument("--density", type=float, default=0.1)
    ap.add_argument(
        "--layer-loss",
        choices=["uniform", "linear", "none"],
        default="none",
        help="deep-supervise the reconstruction at every layer (uniform "
        "or final-heavy linear gamma_k ramp; schedules shared with "
        "run.py via train/loop._layer_weights)",
    )
    ap.add_argument("--layers", type=int, default=15)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--save",
        default=None,
        metavar="NET.npz",
        help="persist the trained denoiser (net + dictionary) for reuse",
    )
    ap.add_argument(
        "--load",
        default=None,
        metavar="NET.npz",
        help="reuse a --save'd denoiser instead of training (dictionary "
        "flags are rejected: the saved net carries its own A)",
    )
    ap.add_argument(
        "--input-image",
        default=None,
        metavar="IMG.npy[:key]",
        help="restore this 2-D grayscale array (an ALREADY-corrupted "
        "user image) instead of the synthetic benchmark; inpaint mode "
        "reads the known-pixel mask from --mask",
    )
    ap.add_argument(
        "--mask",
        default=None,
        metavar="MASK.npy[:key]",
        help="known-observation mask (1 = observed) for --input-image "
        "in inpaint mode",
    )
    ap.add_argument(
        "--output-image",
        default=None,
        metavar="OUT.npy",
        help="write the --input-image reconstruction here",
    )
    args = ap.parse_args(argv)
    if args.dict_mat and args.dictionary == "learned":
        ap.error(
            "--dict-mat and --dict=learned are mutually exclusive: the "
            "fixture would be silently re-learned away"
        )
    if args.load and (args.dict_mat or args.dictionary == "learned"):
        ap.error(
            "--load carries its own dictionary; drop --dict/--dict-mat"
        )
    if args.load and args.save:
        ap.error("--load skips training, so there is nothing to --save")
    if args.mask and not args.input_image:
        ap.error("--mask only applies to --input-image")
    if args.input_image and args.mode == "inpaint" and not args.mask:
        ap.error("inpaint mode needs --mask with --input-image")
    if args.quick:
        args.steps, args.images, args.size, args.layers = 60, 2, 64, 8

    from dladmm_tpu.data.dictionary import dct_dictionary, learn_dictionary
    from dladmm_tpu.data.images import extract_patches, synthetic_image
    from dladmm_tpu.metrics.core import psnr

    A = dct_dictionary(patch=8, atoms_per_dim=16)
    if args.dict_mat:
        from dladmm_tpu.data.fixtures import load_mat_dictionary

        A = load_mat_dictionary(args.dict_mat)
        if A.shape[0] != 64:
            raise SystemExit(
                f"--dict-mat dictionary has {A.shape[0]} rows; need "
                "patch*patch = 64 for the 8x8 patch pipeline"
            )
    key = jax.random.PRNGKey(args.seed)
    k_train, k_test = jax.random.split(key)

    if args.load:
        params, A = load_denoiser(args.load)
        print(
            f"loaded denoiser {args.load}: K={params.K}, A {A.shape}",
            file=sys.stderr,
        )
        return _apply_or_benchmark(args, params, A, k_test)

    train_imgs = [
        synthetic_image(k, args.size)
        for k in jax.random.split(k_train, args.images)
    ]
    if args.dictionary == "learned":
        # Learn from CLEAN training patches (zero-mean), DCT init —
        # fixture-free stand-in for the reference's learned dictionary.
        clean_p = jnp.concatenate(
            [extract_patches(img, 8, 4) for img in train_imgs]
        )
        clean_p = clean_p - jnp.mean(clean_p, axis=1, keepdims=True)
        outer = 4 if args.quick else 12
        A = learn_dictionary(
            clean_p, A, n_atoms=A.shape[1], outer=outer
        )
        print(f"learned dictionary: {A.shape} from {clean_p.shape[0]} "
              "clean patches", file=sys.stderr)

    params = train_denoiser(
        A,
        train_imgs,
        K=args.layers,
        steps=args.steps,
        density=args.density,
        mode=args.mode,
        layer_loss=None if args.layer_loss == "none" else args.layer_loss,
    )
    if args.save:
        save_denoiser(args.save, params, A)
        print(f"saved denoiser to {args.save}", file=sys.stderr)
    return _apply_or_benchmark(args, params, A, k_test)


def _apply_or_benchmark(args, params, A, k_test) -> int:
    """Shared tail: restore the user's --input-image, or run the
    3-image synthetic PSNR benchmark."""
    from dladmm_tpu.data.images import synthetic_image
    from dladmm_tpu.metrics.core import psnr

    if args.input_image:
        import numpy as np

        noisy = _load_gray_image(args.input_image)
        mask = _load_mask(args.mask) if args.mask else None
        recon = denoise_image(params, A, noisy, mask=mask)
        if args.output_image:
            np.save(args.output_image, np.asarray(recon))
        print(
            json.dumps(
                {
                    "mode": args.mode,
                    "input_image": args.input_image,
                    "shape": list(noisy.shape),
                    "output_image": args.output_image,
                }
            )
        )
        return 0

    results = []
    for i, k in enumerate(jax.random.split(k_test, 3)):
        kimg, knoise = jax.random.split(k)
        clean = synthetic_image(kimg, args.size)
        noisy, mask = _corrupt(knoise, clean, args.mode, args.density)
        recon = denoise_image(params, A, noisy, mask=mask)
        results.append(
            {
                "image": i,
                "psnr_noisy_db": round(float(psnr(noisy, clean)), 2),
                "psnr_denoised_db": round(float(psnr(recon, clean)), 2),
            }
        )
        print(
            f"image {i}: noisy {results[-1]['psnr_noisy_db']} dB -> "
            f"denoised {results[-1]['psnr_denoised_db']} dB"
        )
    mean_gain = sum(
        r["psnr_denoised_db"] - r["psnr_noisy_db"] for r in results
    ) / len(results)
    print(
        json.dumps(
            {
                "mode": args.mode,
                "dict": "loaded" if args.load else args.dictionary,
                "results": results,
                "mean_psnr_gain_db": round(mean_gain, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
