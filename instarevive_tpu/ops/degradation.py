"""Real-ESRGAN-style degradation synthesis, fully on-device and batched.

Parity target: reference ``utils/degradation.py`` (kernel synthesis 17-418,
noise 420-730) and the per-sample kernel sampling in
``dataset/realesrgan.py:129-184``. Unlike the reference — which synthesizes
kernels in CPU dataloader workers with numpy — everything here is jnp,
vmappable, and static-shape: variable kernel sizes are realized as a center
mask on the maximal (pad_to) grid, which is numerically identical to
synthesizing at size k and zero-padding (the reference's ``pad_to=21``).

The Bessel J1 needed by the sinc kernel is implemented with the standard
Abramowitz–Stegun rational approximations so sinc kernels also run on-device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bessel_j1(x: jnp.ndarray) -> jnp.ndarray:
    """Bessel function of the first kind, order 1 (|err| < ~1e-7)."""
    ax = jnp.abs(x)
    y = x * x
    # |x| < 8: rational approximation
    p1 = x * (
        72362614232.0
        + y * (-7895059235.0 + y * (242396853.1 + y * (-2972611.439 + y * (15704.48260 + y * (-30.16036606)))))
    )
    q1 = 144725228442.0 + y * (
        2300535178.0 + y * (18583304.74 + y * (99447.43394 + y * (376.9991397 + y)))
    )
    small = p1 / q1
    # |x| >= 8: asymptotic form
    axs = jnp.maximum(ax, 1e-20)
    z = 8.0 / axs
    y2 = z * z
    p2 = 1.0 + y2 * (
        0.183105e-2 + y2 * (-0.3516396496e-4 + y2 * (0.2457520174e-5 + y2 * (-0.240337019e-6)))
    )
    q2 = 0.04687499995 + y2 * (
        -0.2002690873e-3 + y2 * (0.8449199096e-5 + y2 * (-0.88228987e-6 + y2 * 0.105787412e-6))
    )
    xx = axs - 2.356194491
    large = jnp.sqrt(0.636619772 / axs) * (jnp.cos(xx) * p2 - z * jnp.sin(xx) * q2)
    large = jnp.where(x < 0, -large, large)
    return jnp.where(ax < 8.0, small, large)


def _mesh_grid(kernel_size: int) -> jnp.ndarray:
    """(K, K, 2) grid of (x, y) offsets centered at zero (degradation.py:33)."""
    ax = jnp.arange(-(kernel_size // 2), kernel_size // 2 + 1, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(ax, ax)
    return jnp.stack([xx, yy], axis=-1)


def _center_mask(kernel_size: int, active_size) -> jnp.ndarray:
    """1 inside the central active_size x active_size square, else 0."""
    half = (jnp.asarray(active_size, jnp.float32) - 1.0) / 2.0
    ax = jnp.abs(jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0)
    m1d = (ax <= half + 1e-6).astype(jnp.float32)
    return m1d[:, None] * m1d[None, :]


def _inv_sigma(sig_x, sig_y, theta, isotropic):
    """Inverse of the rotated covariance matrix, as (a, b, c) for
    q(v) = a*x^2 + 2b*x*y + c*y^2."""
    sig_x = jnp.asarray(sig_x, jnp.float32)
    sig_y = jnp.where(isotropic, sig_x, jnp.asarray(sig_y, jnp.float32))
    theta = jnp.where(isotropic, 0.0, jnp.asarray(theta, jnp.float32))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Sigma = R diag(sx^2, sy^2) R^T ; inverse = R diag(1/sx^2, 1/sy^2) R^T
    ix, iy = 1.0 / (sig_x**2), 1.0 / (sig_y**2)
    a = ct * ct * ix + st * st * iy
    c = st * st * ix + ct * ct * iy
    b = ct * st * (ix - iy)
    return a, b, c


def _quad_form(grid, a, b, c):
    x, y = grid[..., 0], grid[..., 1]
    return a * x * x + 2.0 * b * x * y + c * y * y


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0, isotropic=True, active_size=None):
    grid = _mesh_grid(kernel_size)
    a, b, c = _inv_sigma(sig_x, sig_x if sig_y is None else sig_y, theta, isotropic)
    kernel = jnp.exp(-0.5 * _quad_form(grid, a, b, c))
    if active_size is not None:
        kernel = kernel * _center_mask(kernel_size, active_size)
    return kernel / jnp.sum(kernel)


def bivariate_generalized_gaussian(
    kernel_size, sig_x, sig_y, theta, beta, isotropic=True, active_size=None
):
    grid = _mesh_grid(kernel_size)
    a, b, c = _inv_sigma(sig_x, sig_y, theta, isotropic)
    q = jnp.maximum(_quad_form(grid, a, b, c), 0.0)
    kernel = jnp.exp(-0.5 * jnp.power(q, beta))
    if active_size is not None:
        kernel = kernel * _center_mask(kernel_size, active_size)
    return kernel / jnp.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, isotropic=True, active_size=None):
    grid = _mesh_grid(kernel_size)
    a, b, c = _inv_sigma(sig_x, sig_y, theta, isotropic)
    q = jnp.maximum(_quad_form(grid, a, b, c), 0.0)
    kernel = 1.0 / (jnp.power(q, beta) + 1.0)
    if active_size is not None:
        kernel = kernel * _center_mask(kernel_size, active_size)
    return kernel / jnp.sum(kernel)


def circular_lowpass_kernel(cutoff, kernel_size: int, active_size=None) -> jnp.ndarray:
    """2-D sinc filter (degradation.py:390), cutoff in radians, on-device."""
    c = (kernel_size - 1) / 2.0
    ax = jnp.arange(kernel_size, dtype=jnp.float32)
    r = jnp.sqrt((ax[:, None] - c) ** 2 + (ax[None, :] - c) ** 2)
    cutoff = jnp.asarray(cutoff, jnp.float32)
    safe_r = jnp.maximum(r, 1e-10)
    kernel = cutoff * bessel_j1(cutoff * safe_r) / (2.0 * jnp.pi * safe_r)
    kernel = jnp.where(r < 1e-8, cutoff**2 / (4.0 * jnp.pi), kernel)
    if active_size is not None:
        kernel = kernel * _center_mask(kernel_size, active_size)
    return kernel / jnp.sum(kernel)


def pulse_kernel(kernel_size: int) -> jnp.ndarray:
    k = jnp.zeros((kernel_size, kernel_size), dtype=jnp.float32)
    return k.at[kernel_size // 2, kernel_size // 2].set(1.0)


# ---------------------------------------------------------------------------
# Random kernel sampling (dataset/realesrgan.py:129-184 + degradation.py:177-388)
# ---------------------------------------------------------------------------

KERNEL_TYPES = ("iso", "aniso", "generalized_iso", "generalized_aniso", "plateau_iso", "plateau_aniso")


@dataclass(frozen=True)
class KernelConfig:
    """One blur-kernel sampling stage (matches realesrgan train YAML fields)."""

    kernel_list: Sequence[str] = KERNEL_TYPES
    kernel_prob: Sequence[float] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    sinc_prob: float = 0.1
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)
    betap_range: Tuple[float, float] = (1.0, 2.0)
    rotation_range: Tuple[float, float] = (-math.pi, math.pi)
    kernel_range: Sequence[int] = tuple(2 * v + 1 for v in range(3, 11))  # 7..21
    pad_to: int = 21


def _sample_beta(key, lo, hi):
    """Reference samples beta below/above 1 with equal probability."""
    k1, k2, k3 = jax.random.split(key, 3)
    low = jax.random.uniform(k1, minval=lo, maxval=1.0)
    high = jax.random.uniform(k2, minval=1.0, maxval=hi)
    return jnp.where(jax.random.uniform(k3) < 0.5, low, high)


def random_mixed_kernel(key: jax.Array, cfg: KernelConfig, active_size) -> jnp.ndarray:
    """Sample one mixed blur kernel on the (pad_to, pad_to) grid.

    ``active_size`` is a traced odd kernel size <= pad_to. All six kernel
    families are evaluated (21x21 each — negligible) and the sampled one is
    selected, keeping the whole sampler a single static-shape program.
    """
    keys = jax.random.split(key, 6)
    probs = jnp.zeros((len(KERNEL_TYPES),))
    for name, p in zip(cfg.kernel_list, cfg.kernel_prob):
        probs = probs.at[KERNEL_TYPES.index(name)].set(p)
    ktype = jax.random.choice(keys[0], len(KERNEL_TYPES), p=probs / probs.sum())

    sx = jax.random.uniform(keys[1], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    sy = jax.random.uniform(keys[2], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    theta = jax.random.uniform(
        keys[3], minval=cfg.rotation_range[0], maxval=cfg.rotation_range[1]
    )
    betag = _sample_beta(keys[4], *cfg.betag_range)
    betap = _sample_beta(keys[5], *cfg.betap_range)

    p = cfg.pad_to
    kernels = jnp.stack(
        [
            bivariate_gaussian(p, sx, sy, theta, isotropic=True, active_size=active_size),
            bivariate_gaussian(p, sx, sy, theta, isotropic=False, active_size=active_size),
            bivariate_generalized_gaussian(p, sx, sy, theta, betag, True, active_size),
            bivariate_generalized_gaussian(p, sx, sy, theta, betag, False, active_size),
            bivariate_plateau(p, sx, sy, theta, betap, True, active_size),
            bivariate_plateau(p, sx, sy, theta, betap, False, active_size),
        ]
    )
    return kernels[ktype]


def sample_stage_kernel(key: jax.Array, cfg: KernelConfig) -> jnp.ndarray:
    """Sample one degradation-stage kernel: sinc w.p. sinc_prob, else mixed.

    Matches dataset/realesrgan.py:129-160: kernel size drawn from
    kernel_range; sinc cutoff range depends on size (< 13 -> [pi/3, pi]).
    """
    k_sz, k_sinc, k_cut, k_mix = jax.random.split(key, 4)
    sizes = jnp.asarray(cfg.kernel_range, dtype=jnp.int32)
    size = sizes[jax.random.randint(k_sz, (), 0, len(sizes))]

    lo = jnp.where(size < 13, jnp.pi / 3.0, jnp.pi / 5.0)
    cutoff = jax.random.uniform(k_cut, minval=0.0, maxval=1.0) * (jnp.pi - lo) + lo
    sinc = circular_lowpass_kernel(cutoff, cfg.pad_to, active_size=size)
    mixed = random_mixed_kernel(k_mix, cfg, active_size=size)
    use_sinc = jax.random.uniform(k_sinc) < cfg.sinc_prob
    return jnp.where(use_sinc, sinc, mixed)


def sample_final_sinc_kernel(
    key: jax.Array, cfg: KernelConfig, final_sinc_prob: float
) -> jnp.ndarray:
    """Final-stage kernel: sinc w.p. final_sinc_prob else identity pulse
    (dataset/realesrgan.py:166-180)."""
    k_sz, k_p, k_cut = jax.random.split(key, 3)
    sizes = jnp.asarray(cfg.kernel_range, dtype=jnp.int32)
    size = sizes[jax.random.randint(k_sz, (), 0, len(sizes))]
    cutoff = jax.random.uniform(k_cut, minval=jnp.pi / 3.0, maxval=jnp.pi)
    sinc = circular_lowpass_kernel(cutoff, cfg.pad_to, active_size=size)
    return jnp.where(jax.random.uniform(k_p) < final_sinc_prob, sinc, pulse_kernel(cfg.pad_to))


# ---------------------------------------------------------------------------
# Noise (degradation.py:461-730, _pt variants)
# ---------------------------------------------------------------------------


def _luma(img: jnp.ndarray) -> jnp.ndarray:
    """torchvision rgb_to_grayscale weights, NHWC -> NHW1."""
    w = jnp.asarray([0.2989, 0.587, 0.114], dtype=img.dtype)
    return (img @ w)[..., None]


def generate_gaussian_noise(
    key: jax.Array, img: jnp.ndarray, sigma, gray: jnp.ndarray
) -> jnp.ndarray:
    """sigma in [0,255] units, per-sample (B,); gray is per-sample {0,1} (B,)."""
    b = img.shape[0]
    kc, kg = jax.random.split(key)
    sigma = jnp.reshape(sigma, (b, 1, 1, 1)) / 255.0
    color = jax.random.normal(kc, img.shape, dtype=jnp.float32) * sigma
    g = jax.random.normal(kg, img.shape[:3] + (1,), dtype=jnp.float32) * sigma
    gray = jnp.reshape(gray, (b, 1, 1, 1)).astype(jnp.float32)
    return color * (1.0 - gray) + g * gray


def _count_unique_vals(img: jnp.ndarray) -> jnp.ndarray:
    """Per-sample count of distinct 8-bit levels, as 2^ceil(log2(n)).

    Level presence is a compare+any reduction, not a bincount: on TPU,
    bincount lowers to a serialized scatter-add (measured 31 ms for one
    b2 768x768x3 canvas in the r5 train-loop trace) while the (n, 256)
    equality broadcast fuses into the VPU reduce loop without ever
    materializing. Only presence matters here, never the counts.
    """
    b = img.shape[0]
    q = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8).reshape(b, -1)
    levels = jnp.arange(256, dtype=jnp.uint8)
    present = jnp.any(q[:, :, None] == levels, axis=1)
    n = jnp.sum(present, axis=-1).astype(jnp.float32)
    return jnp.exp2(jnp.ceil(jnp.log2(n)))


def generate_poisson_noise(
    key: jax.Array, img: jnp.ndarray, scale, gray: jnp.ndarray
) -> jnp.ndarray:
    """Shot noise matching generate_poisson_noise_pt (degradation.py:610)."""
    b = img.shape[0]

    imgq = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    vals = _count_unique_vals(imgq).reshape(b, 1, 1, 1)
    gray_img = jnp.clip(jnp.round(_luma(img) * 255.0), 0, 255) / 255.0
    gvals = _count_unique_vals(gray_img).reshape(b, 1, 1, 1)

    # ONE flattened poisson draw covers the color and gray fields: separate
    # draws pay two rejection while-loops, and the (B,H,W,1) gray tensor got
    # a T(1,128) layout whose loop body ran 3x slower than the color one
    # (r5 trace: 12.6 ms vs 4.4 ms/call at b2 768^2). Flat 1-D, the loop
    # runs once over a densely tiled buffer.
    lam = jnp.concatenate(
        [(imgq * vals).reshape(-1), (gray_img * gvals).reshape(-1)]
    )
    draw = jax.random.poisson(key, lam).astype(jnp.float32)
    out = draw[: imgq.size].reshape(imgq.shape) / vals
    noise = out - imgq
    gout = draw[imgq.size :].reshape(gray_img.shape) / gvals
    gnoise = jnp.broadcast_to(gout - gray_img, img.shape)

    gray = jnp.reshape(gray, (b, 1, 1, 1)).astype(jnp.float32)
    noise = noise * (1.0 - gray) + gnoise * gray
    return noise * jnp.reshape(scale, (b, 1, 1, 1))


def random_add_gaussian_noise(
    key: jax.Array,
    img: jnp.ndarray,
    sigma_range: Tuple[float, float],
    gray_prob: float,
    clip: bool = True,
) -> jnp.ndarray:
    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (b,), minval=sigma_range[0], maxval=sigma_range[1])
    gray = (jax.random.uniform(kg, (b,)) < gray_prob).astype(jnp.float32)
    out = img + generate_gaussian_noise(kn, img, sigma, gray)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def random_add_poisson_noise(
    key: jax.Array,
    img: jnp.ndarray,
    scale_range: Tuple[float, float],
    gray_prob: float,
    clip: bool = True,
) -> jnp.ndarray:
    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (b,), minval=scale_range[0], maxval=scale_range[1])
    gray = (jax.random.uniform(kg, (b,)) < gray_prob).astype(jnp.float32)
    out = img + generate_poisson_noise(kn, img, scale, gray)
    return jnp.clip(out, 0.0, 1.0) if clip else out
