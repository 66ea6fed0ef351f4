"""Batched filtering primitives: filter2d, gaussian blur, USM sharpening.

Parity targets: reference ``utils/image/common.py:filter2D`` (per-sample
kernels, reflect padding) and ``utils/image/usm_sharp.py:USMSharp``.

Layout is NHWC. Per-sample kernels are applied as a single depthwise
convolution by folding batch into the channel axis — one XLA conv instead of
a Python loop or per-sample vmap dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics: sigma<=0 derives sigma from ksize."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_kernel2d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    k = gaussian_kernel1d(ksize, sigma)
    return np.outer(k, k).astype(np.float32)


def _pad_reflect(x: jnp.ndarray, ph: int, pw: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad H and W of an NHWC array. 'reflect' == torch reflect (no edge repeat)."""
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Correlate NHWC ``img`` with per-sample (B,kh,kw) or shared (kh,kw) kernel.

    Reflect-pads so output shape equals input shape. The same 2-D kernel is
    applied to every channel (reference utils/image/common.py filter2D).
    """
    b, h, w, c = img.shape
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (b,) + kernel.shape)
    kh, kw = kernel.shape[-2:]
    eh, ew = (kh - 1) * dilation + 1, (kw - 1) * dilation + 1
    x = _pad_reflect(img, eh // 2, ew // 2)
    # Fold batch into channels: (1, H, W, B*C) depthwise conv, group per B*C.
    x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, x.shape[1], x.shape[2], b * c)
    # kernel per (b, c): same kernel across channels of a sample.
    k = jnp.repeat(kernel[:, None], c, axis=1)  # (B, C, kh, kw)
    k = jnp.transpose(k.reshape(b * c, kh, kw), (1, 2, 0))[:, :, None, :]  # HWIO (kh,kw,1,B*C)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        k.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    out = out.reshape(out.shape[1], out.shape[2], b, c)
    return jnp.transpose(out, (2, 0, 1, 3)).astype(img.dtype)


def depthwise_conv2d(
    img: jnp.ndarray,
    kernel: jnp.ndarray,
    dilation: int = 1,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Shared-kernel depthwise conv on NHWC with same-shape output."""
    _, _, _, c = img.shape
    kh, kw = kernel.shape
    eh, ew = (kh - 1) * dilation + 1, (kw - 1) * dilation + 1
    x = _pad_reflect(img, eh // 2, ew // 2, mode=pad_mode)
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        k.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(img.dtype)


def gaussian_blur(img: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable reflect-padded gaussian blur on NHWC."""
    k1 = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    out = depthwise_conv2d(img, k1[:, None])
    return depthwise_conv2d(out, k1[None, :])


def usm_sharpen(
    img: jnp.ndarray,
    weight: float = 0.5,
    threshold: float = 10.0,
    radius: int = 51,
    sigma: float = 0.0,
) -> jnp.ndarray:
    """Unsharp-mask with soft threshold mask (reference usm_sharp.py:9-29).

    ``img`` is NHWC in [0, 1].
    """
    blur = gaussian_blur(img, radius, sigma)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = gaussian_blur(mask, radius, sigma)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
