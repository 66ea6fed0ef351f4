#!/usr/bin/env python
"""Generate a pre-degraded LQ test set from a folder of HQ images.

Parity target: reference ``tools/lq.py:19-59`` — per image: iso/aniso mixed
blur kernel (ksize 41, sigma [0.1, 10]), random bilinear downsample by a
uniform scale in [2, 4], gaussian noise sigma [0, 20]/255, JPEG quality
[60, 100], bilinear resize back to the original size.

TPU-native: the whole degradation chain is ONE jitted program per image
size (kernel synthesis, filter2d, resize, noise, DiffJPEG all on-device);
the reference loops cv2/numpy ops on host.
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="HQ image folder")
    p.add_argument("--output", required=True, help="LQ output folder")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from instarevive_tpu.ops.degradation import (
        KernelConfig, random_add_gaussian_noise, random_mixed_kernel,
    )
    from instarevive_tpu.ops.diffjpeg import jpeg_compress_decompress
    from instarevive_tpu.ops.filters import filter2d
    from instarevive_tpu.ops.resize import interpolate
    from instarevive_tpu.utils.image_io import list_image_files

    cfg = KernelConfig(
        kernel_list=("iso", "aniso"),
        kernel_prob=(0.5, 0.5),
        sinc_prob=0.0,
        blur_sigma=(0.1, 10.0),
        kernel_range=(41,),
        pad_to=41,
    )

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def degrade(key, img, lhw, quality):
        """img: (1, H, W, 3) [0,1]; lhw: static (lh, lw) downsample grid."""
        kk, kn = jax.random.split(key)
        kernel = random_mixed_kernel(kk, cfg, active_size=41)
        h, w = img.shape[1], img.shape[2]
        lh, lw = lhw
        x = filter2d(img, kernel[None])
        x = interpolate(x, (lh, lw), mode="bilinear")
        x = random_add_gaussian_noise(kn, x, (0.0, 20.0 / 255.0), gray_prob=0.0)
        ph, pw = -(-lh // 16) * 16, -(-lw // 16) * 16
        xp = jnp.pad(x, ((0, 0), (0, ph - lh), (0, pw - lw), (0, 0)), mode="edge")
        xp = jpeg_compress_decompress(xp, quality, differentiable=False)
        x = xp[:, :lh, :lw]
        x = interpolate(x, (h, w), mode="bilinear")
        return jnp.clip(x, 0.0, 1.0)
    files = list_image_files(args.input)
    os.makedirs(args.output, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i, f in enumerate(files):
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        scale = float(rng.uniform(2.0, 4.0))
        quality = float(rng.uniform(60.0, 100.0))
        h, w = img.shape[:2]
        lhw = (max(int(h // scale), 16), max(int(w // scale), 16))
        key = jax.random.key(args.seed * 100003 + i)
        out = degrade(key, jnp.asarray(img)[None], lhw, quality)
        arr = np.asarray(jnp.round(out[0] * 255.0).astype(jnp.uint8))
        Image.fromarray(arr).save(os.path.join(args.output, os.path.basename(f)))
        print(f"{f} -> lq (scale {scale:.2f}, q {quality:.0f})")


if __name__ == "__main__":
    main()
