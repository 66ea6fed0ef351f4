"""CodeFormer-style single-stage degradation, on-device.

Parity target: reference ``dataset/codeformer.py:104-170``
(CodeformerDataset.__getitem__ degradation): random mixed-kernel blur ->
random downsample in [4, 8] (bilinear) -> gaussian noise -> cv2 JPEG ->
resize back to original size. The reference runs this per-image in CPU
workers; here it's a batched jitted function with traced scale (fixed-canvas
resize, see data/realesrgan.py for the technique).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.degradation import (
    KernelConfig,
    generate_gaussian_noise,
    random_mixed_kernel,
)
from instarevive_tpu.ops.diffjpeg import jpeg_compress_decompress
from instarevive_tpu.ops.filters import filter2d
from instarevive_tpu.data.realesrgan import _resize_traced, _round16


@dataclass(frozen=True)
class CodeformerDegradationConfig:
    """Mirrors the dataset fields (dataset/codeformer.py:72-103)."""

    blur_kernel_size: int = 41
    kernel: KernelConfig = field(
        default_factory=lambda: KernelConfig(
            kernel_list=("iso", "aniso"),
            kernel_prob=(0.5, 0.5),
            sinc_prob=0.0,
            blur_sigma=(0.1, 10.0),
            kernel_range=(41,),
            pad_to=41,
        )
    )
    downsample_range: Tuple[float, float] = (4.0, 8.0)
    noise_range: Tuple[float, float] = (0.0, 20.0)
    jpeg_range: Tuple[float, float] = (60.0, 100.0)


def degrade_batch_codeformer(
    key: jax.Array, hq: jnp.ndarray, cfg: CodeformerDegradationConfig
) -> Dict[str, jnp.ndarray]:
    """hq (B,H,W,3) in [0,1] -> dict(hq=[-1,1], lq=[0,1]) at (H,W)."""
    b, h, w, _ = hq.shape
    kk, ks, kn, kq = jax.random.split(key, 4)

    kernels = jax.vmap(
        lambda k: random_mixed_kernel(k, cfg.kernel, active_size=cfg.kernel.pad_to)
    )(jax.random.split(kk, b))
    out = filter2d(hq, kernels)

    # downsample by traced scale in [4, 8] (bilinear), via fixed canvas
    scale = jax.random.uniform(
        ks, minval=cfg.downsample_range[0], maxval=cfg.downsample_range[1]
    )
    ch, cw = _round16(h / cfg.downsample_range[0]), _round16(w / cfg.downsample_range[0])
    vh, vw = h / scale, w / scale
    out = _resize_traced(out, (ch, cw), (float(h), float(w)), (vh, vw), jnp.asarray(1))

    sigma = jax.random.uniform(kn, (b,), minval=cfg.noise_range[0], maxval=cfg.noise_range[1])
    out = jnp.clip(out + generate_gaussian_noise(kn, out, sigma, jnp.zeros((b,))), 0, 1)

    q = jax.random.uniform(kq, (b,), minval=cfg.jpeg_range[0], maxval=cfg.jpeg_range[1])
    out = jpeg_compress_decompress(out, q, differentiable=False)

    # resize back (bilinear, codeformer.py:160)
    out = _resize_traced(out, (h, w), (vh, vw), (float(h), float(w)), jnp.asarray(1))
    lq = jnp.clip(out, 0.0, 1.0)
    return {"hq": hq * 2.0 - 1.0, "lq": lq}
