"""Real-ESRGAN two-stage degradation as ONE jitted batched program.

Parity target: reference ``dataset/batch_transform.py:137-271``
(RealESRGANBatchTransform: blur -> random resize -> gaussian|poisson noise ->
DiffJPEG, x2 stages, then {resize-back + sinc, JPEG} in random order) with
the kernel sampling of ``dataset/realesrgan.py:129-184`` — which the
reference runs half on CPU dataloader workers (kernels) and half on GPU
(the transform). Here the ENTIRE synthesis (kernels included) runs on-device
under jit with per-step PRNG keys.

TPU design — the static-shape problem. The reference's random up/down
resizes produce *traced* intermediate sizes. We keep XLA static shapes with
a fixed canvas + ``jax.image.scale_and_translate``: the working image lives
in the top-left of a canvas sized for the maximal scale, its virtual size a
traced value; resizes become scale_and_translate ops with traced scales and
static output shapes. Noise and JPEG apply to the full canvas, so their
granularity tracks the virtual resolution exactly like the reference;
off-content canvas area is garbage that only touches a few boundary pixels
through later resample kernels (the reference's own boundary handling also
diverges at edges). Resize-mode choice (area/bilinear/bicubic) is a
``lax.switch`` over same-shape branches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.ops.degradation import (
    KernelConfig,
    generate_gaussian_noise,
    generate_poisson_noise,
    sample_final_sinc_kernel,
    sample_stage_kernel,
)
from instarevive_tpu.ops.diffjpeg import jpeg_compress_decompress
from instarevive_tpu.ops.filters import filter2d, usm_sharpen
from instarevive_tpu.ops.resize import interpolate


@dataclass(frozen=True)
class RealESRGANDegradationConfig:
    """Mirrors configs/general_deg_realesrgan_train.yaml:37-62."""

    use_sharpener: bool = False
    resize_hq: bool = False
    # stage 1
    kernel1: KernelConfig = field(default_factory=lambda: KernelConfig(sinc_prob=0.1))
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)  # up, down, keep
    resize_range: Tuple[float, float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1.0, 30.0)
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30.0, 95.0)
    # stage 2
    second_blur_prob: float = 0.8
    kernel2: KernelConfig = field(default_factory=lambda: KernelConfig(sinc_prob=0.1))
    stage2_scale: Union[float, Tuple[float, float]] = 4.0
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1.0, 25.0)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30.0, 95.0)
    final_sinc_prob: float = 0.8


def sample_batch_kernels(key: jax.Array, cfg: RealESRGANDegradationConfig, batch: int):
    """Per-sample kernel triple (dataset/realesrgan.py __getitem__), on-device."""
    k1, k2, k3 = jax.random.split(key, 3)
    kernel1 = jax.vmap(lambda k: sample_stage_kernel(k, cfg.kernel1))(
        jax.random.split(k1, batch)
    )
    kernel2 = jax.vmap(lambda k: sample_stage_kernel(k, cfg.kernel2))(
        jax.random.split(k2, batch)
    )
    sinc = jax.vmap(lambda k: sample_final_sinc_kernel(k, cfg.kernel2, cfg.final_sinc_prob))(
        jax.random.split(k3, batch)
    )
    return kernel1, kernel2, sinc


def _round16(x: float) -> int:
    return int(math.ceil(x / 16.0) * 16)


def _resize_traced(img, out_hw, src_hw, dst_hw, mode_idx):
    """scale_and_translate: content of virtual size src_hw (traced) in the
    canvas top-left -> content of virtual size dst_hw in a (static) out_hw
    canvas; mode_idx in {0: area~linear-aa, 1: bilinear, 2: bicubic}."""
    b = img.shape[0]
    scale = jnp.stack([dst_hw[0] / src_hw[0], dst_hw[1] / src_hw[1]])
    translation = jnp.zeros((2,))

    def do(method, antialias):
        return jax.image.scale_and_translate(
            img, (b, out_hw[0], out_hw[1], img.shape[-1]), (1, 2),
            scale, translation, method=method, antialias=antialias,
        )

    return jax.lax.switch(
        mode_idx,
        [
            lambda: do("linear", True),   # 'area' ~ antialiased linear
            lambda: do("linear", True),   # bilinear (+aa on downscale only in
                                          # torch; aa also correct for up)
            lambda: do("cubic", True),    # bicubic
        ],
    )


def _add_random_noise(key, img, cfg_g_prob, sigma_range, poisson_range, gray_prob):
    """gaussian w.p. cfg_g_prob else poisson; per-sample params (batch_transform)."""
    kp, ks, ks2, kg, kn1, kn2 = jax.random.split(key, 6)
    b = img.shape[0]
    sigma = jax.random.uniform(ks, (b,), minval=sigma_range[0], maxval=sigma_range[1])
    pscale = jax.random.uniform(ks2, (b,), minval=poisson_range[0], maxval=poisson_range[1])
    gray = (jax.random.uniform(kg, (b,)) < gray_prob).astype(jnp.float32)
    use_g = jax.random.uniform(kp) < cfg_g_prob
    # lax.cond, not where: the unselected generator is real device work (the
    # poisson path alone was ~50 ms/call at the 768^2 stage-1 canvas), and
    # the reference likewise evaluates exactly one branch per batch
    # (batch_transform.py:169-187).
    noise = jax.lax.cond(
        use_g,
        lambda: generate_gaussian_noise(kn1, img, sigma, gray),
        lambda: generate_poisson_noise(kn2, img, pscale, gray),
    )
    return jnp.clip(img + noise, 0.0, 1.0)


def _rand_scale(key, prob, rng_range):
    """up w.p. prob[0] (1..hi), down w.p. prob[1] (lo..1), keep otherwise."""
    kc, ks = jax.random.split(key)
    p = jnp.asarray(prob) / sum(prob)
    choice = jax.random.choice(kc, 3, p=p)
    u = jax.random.uniform(ks)
    up = 1.0 + u * (rng_range[1] - 1.0)
    down = rng_range[0] + u * (1.0 - rng_range[0])
    return jnp.where(choice == 0, up, jnp.where(choice == 1, down, 1.0))


def degrade_batch(
    key: jax.Array,
    hq: jnp.ndarray,
    cfg: RealESRGANDegradationConfig,
    kernels: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full two-stage synthesis. hq: (B, H, W, 3) in [0,1], H=W static.

    Returns dict(hq=[-1,1], lq=[0,1]) both at (H, W) — matching the
    reference's output contract (jpg / hint, batch_transform.py:266-271).
    """
    b, h, w, _ = hq.shape
    keys = jax.random.split(key, 12)
    if kernels is None:
        kernels = sample_batch_kernels(keys[0], cfg, b)
    kernel1, kernel2, sinc_kernel = kernels

    if cfg.use_sharpener:
        hq_proc = usm_sharpen(hq)
    else:
        hq_proc = hq

    # ---- stage 1 ----
    out = filter2d(hq_proc, kernel1)
    s1 = _rand_scale(keys[1], cfg.resize_prob, cfg.resize_range)
    mode1 = jax.random.randint(keys[2], (), 0, 3)
    c1h, c1w = _round16(h * cfg.resize_range[1]), _round16(w * cfg.resize_range[1])
    vh1, vw1 = s1 * h, s1 * w  # traced virtual size
    out = _resize_traced(out, (c1h, c1w), (float(h), float(w)), (vh1, vw1), mode1)
    out = _add_random_noise(
        keys[3], out, cfg.gaussian_noise_prob, cfg.noise_range,
        cfg.poisson_scale_range, cfg.gray_noise_prob,
    )
    q1 = jax.random.uniform(keys[4], (b,), minval=cfg.jpeg_range[0], maxval=cfg.jpeg_range[1])
    out = jpeg_compress_decompress(jnp.clip(out, 0, 1), q1, differentiable=False)

    # ---- stage 2 ----
    blur2 = jax.random.uniform(keys[5]) < cfg.second_blur_prob
    # cond, not where: the 21x21 depthwise blur on the 768^2 canvas is
    # ~16 ms/call — skip it for real on the (1 - p) branch.
    out = jax.lax.cond(blur2, lambda o: filter2d(o, kernel2), lambda o: o, out)

    if isinstance(cfg.stage2_scale, (tuple, list)):
        s2min, s2max = cfg.stage2_scale
        stage2_scale = jax.random.uniform(keys[6], minval=s2min, maxval=s2max)
        min_div = s2min
    else:
        stage2_scale = jnp.asarray(float(cfg.stage2_scale))
        min_div = float(cfg.stage2_scale)
    t2h, t2w = vh1 / s1 / stage2_scale, vw1 / s1 / stage2_scale  # = h/s2, w/s2

    s2 = _rand_scale(keys[7], cfg.resize_prob2, cfg.resize_range2)
    mode2 = jax.random.randint(keys[8], (), 0, 3)
    c2h = _round16(h / min_div * cfg.resize_range2[1])
    c2w = _round16(w / min_div * cfg.resize_range2[1])
    out = _resize_traced(out, (c2h, c2w), (vh1, vw1), (t2h * s2, t2w * s2), mode2)
    out = _add_random_noise(
        keys[9], out, cfg.gaussian_noise_prob2, cfg.noise_range2,
        cfg.poisson_scale_range2, cfg.gray_noise_prob2,
    )

    # ---- final: {resize-back+sinc, JPEG} in random order, then back to HQ size
    q2 = jax.random.uniform(keys[10], (b,), minval=cfg.jpeg_range2[0], maxval=cfg.jpeg_range2[1])
    mode3 = jax.random.randint(keys[11], (), 0, 3)

    def order_a(img):  # resize back + sinc, then JPEG
        r = _resize_traced(img, (c2h, c2w), (t2h * s2, t2w * s2), (t2h, t2w), mode3)
        r = filter2d(r, sinc_kernel)
        return jpeg_compress_decompress(jnp.clip(r, 0, 1), q2, differentiable=False)

    def order_b(img):  # JPEG, then resize back + sinc
        r = jpeg_compress_decompress(jnp.clip(img, 0, 1), q2, differentiable=False)
        r = _resize_traced(r, (c2h, c2w), (t2h * s2, t2w * s2), (t2h, t2w), mode3)
        return filter2d(r, sinc_kernel)

    use_a = jax.random.uniform(keys[0]) < 0.5
    out = jax.lax.cond(use_a, order_a, order_b, out)

    # resize back to gt size (bicubic, batch_transform.py:252)
    out = _resize_traced(out, (h, w), (t2h, t2w), (float(h), float(w)), jnp.asarray(2))
    lq = jnp.clip(jnp.round(jnp.clip(out, 0, 1) * 255.0), 0, 255) / 255.0

    return {"hq": hq_proc * 2.0 - 1.0, "lq": lq}
