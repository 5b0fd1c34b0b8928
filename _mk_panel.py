import jax
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dladmm_tpu.data.dictionary import dct_dictionary
from dladmm_tpu.data.images import dropout_mask, salt_pepper, synthetic_image
from dladmm_tpu.metrics.core import psnr
from dladmm_tpu.run_denoise import denoise_image, train_denoiser

A = dct_dictionary()
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
train_imgs = [synthetic_image(k, 128) for k in jax.random.split(k1, 4)]
clean = synthetic_image(k2, 128)

params_d = train_denoiser(A, train_imgs, K=15, steps=400, density=0.1, log_every=0)
noisy_d = salt_pepper(k3, clean, 0.1)
recon_d = denoise_image(params_d, A, noisy_d)

params_i = train_denoiser(A, train_imgs, K=15, steps=400, density=0.3,
                          log_every=0, mode="inpaint")
noisy_i, mask = dropout_mask(k3, clean, 0.3)
recon_i = denoise_image(params_i, A, noisy_i, mask=mask)

fig, axes = plt.subplots(2, 3, figsize=(9, 6.2))
rows = [
    ("denoise (10% salt&pepper)", noisy_d, recon_d),
    ("inpaint (30% pixels missing)", noisy_i, recon_i),
]
for r, (title, noisy, recon) in enumerate(rows):
    for c, (name, img) in enumerate(
        [("clean", clean), ("corrupted", noisy), ("D-LADMM restored", recon)]
    ):
        ax = axes[r][c]
        ax.imshow(img, cmap="gray", vmin=0, vmax=1)
        p = float(psnr(img, clean))
        label = name if c == 0 else f"{name}  {p:.1f} dB"
        ax.set_title(f"{title}\n{label}" if c == 0 else label, fontsize=9)
        ax.axis("off")
fig.tight_layout()
fig.savefig("bench_out/denoise_panel.png", dpi=130)
print("saved bench_out/denoise_panel.png")
