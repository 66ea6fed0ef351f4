#!/usr/bin/env python
"""Quality delta of IR_INT8_DECODE at production width: decode the same
latents through the full sd-vae decoder (ch 128, mult 1/2/4/4) with the
bf16 baseline path and the int8 path, report PSNR/max-err between the two
[0,1] outputs. Random full-width weights (zero egress) — the quantization
error is weight-scale-relative, so random-weight PSNR is the right proxy
for converted-checkpoint PSNR (same argument as the parity suite)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plat = jax.default_backend()
    cache = os.path.join(repo, ".jax_cache" if plat != "cpu" else ".jax_cache_cpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.models.vae import AutoencoderKL

    tiny = "--tiny" in sys.argv
    kw = (dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4)
          if tiny else dict(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                            z_channels=4, embed_dim=4))
    size = 16 if tiny else 64  # 64x64x4 latents == 512^2 pixels
    vae = AutoencoderKL(**kw, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.key(1), (2, size, size, 4), jnp.float32)
    # low-frequency structure so the latent looks like an image code, not noise
    z = 0.5 * z + 1.5 * jax.image.resize(
        jax.random.normal(jax.random.key(2), (2, 4, 4, 4)), z.shape, "bicubic")
    params = vae.init(jax.random.key(0), z[:1], method=vae.decode)["params"]

    outs = {}
    for flag in ("0", "1"):
        os.environ["IR_INT8_DECODE"] = flag
        t0 = time.time()
        img = vae.apply({"params": params}, z, method=vae.decode)
        img01 = np.clip((np.asarray(img, np.float32) + 1.0) / 2.0, 0.0, 1.0)
        outs[flag] = img01
        print(f"decode flag={flag}: {img01.shape} [{time.time() - t0:.0f}s]",
              flush=True)
    mse = float(np.mean((outs["0"] - outs["1"]) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"int8 vs bf16 decode @ {size * 8}^2: PSNR {psnr:.1f} dB  "
          f"max|d| {np.abs(outs['0'] - outs['1']).max():.4f}  backend {plat}")


if __name__ == "__main__":
    main()
