"""Color-space conversion and color-fix ops (NHWC, on-device).

Parity targets: reference ``utils/image/align_color.py`` (wavelet & adain
color fix applied per tile at inference, ``test_scripts/inference.py:146-149``)
and ``utils/image/common.py:rgb2ycbcr_pt``.
"""

from __future__ import annotations

import jax.numpy as jnp

from instarevive_tpu.ops.filters import depthwise_conv2d

_WAVELET_KERNEL = jnp.asarray(
    [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ],
    dtype=jnp.float32,
)


def wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """À-trous blur: 3x3 kernel dilated by ``radius``, replicate padding."""
    return depthwise_conv2d(
        image, _WAVELET_KERNEL.astype(image.dtype), dilation=radius, pad_mode="edge"
    )


def wavelet_decomposition(image: jnp.ndarray, levels: int = 5):
    """Split NHWC image into (high_freq_sum, low_freq) over dyadic radii."""
    high_freq = jnp.zeros_like(image)
    low_freq = image
    for i in range(levels):
        radius = 2**i
        blurred = wavelet_blur(low_freq, radius)
        high_freq = high_freq + (low_freq - blurred)
        low_freq = blurred
    return high_freq, low_freq


def wavelet_color_fix(content: jnp.ndarray, style: jnp.ndarray, levels: int = 5):
    """Content high-frequency + style low-frequency (align_color.py:108)."""
    content_high, _ = wavelet_decomposition(content, levels)
    _, style_low = wavelet_decomposition(style, levels)
    return content_high + style_low


def _mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-sample per-channel spatial mean/std; unbiased var like torch."""
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    mean = flat.mean(axis=1, keepdims=True)
    var = flat.var(axis=1, keepdims=True, ddof=1) + eps
    return mean.reshape(b, 1, 1, c), jnp.sqrt(var).reshape(b, 1, 1, c)


def adain_color_fix(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Adaptive instance norm color transfer (align_color.py:62-76)."""
    style_mean, style_std = _mean_std(style)
    content_mean, content_std = _mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean


# BT.601 "full-range to video-range" matrices as used by basicsr rgb2ycbcr.
_RGB2YCBCR = jnp.asarray(
    [
        [65.481, -37.797, 112.0],
        [128.553, -74.203, -93.786],
        [24.966, 112.0, -18.214],
    ],
    dtype=jnp.float32,
)
_YCBCR_BIAS = jnp.asarray([16.0, 128.0, 128.0], dtype=jnp.float32)


def rgb2ycbcr_matlab(img: jnp.ndarray, y_only: bool = False) -> jnp.ndarray:
    """MATLAB/basicsr rgb2ycbcr on [0,1] NHWC input, output in [0,1].

    Matches reference ``rgb2ycbcr_pt`` (utils/image/common.py) used by the
    Y-channel PSNR/SSIM metrics.
    """
    if y_only:
        w = _RGB2YCBCR[:, 0]
        out = img @ w + 16.0
        out = out[..., None]
    else:
        out = img @ _RGB2YCBCR + _YCBCR_BIAS
    return out / 255.0


def rgb_to_ycbcr(img: jnp.ndarray) -> jnp.ndarray:
    """JPEG full-range RGB->YCbCr (for DiffJPEG), NHWC in [0,255]."""
    m = jnp.asarray(
        [
            [0.299, -0.168736, 0.5],
            [0.587, -0.331264, -0.418688],
            [0.114, 0.5, -0.081312],
        ],
        dtype=jnp.float32,
    )
    out = img @ m + jnp.asarray([0.0, 128.0, 128.0], dtype=jnp.float32)
    return out


def ycbcr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """JPEG full-range YCbCr->RGB, NHWC in [0,255]."""
    m = jnp.asarray(
        [
            [1.0, 1.0, 1.0],
            [0.0, -0.344136, 1.772],
            [1.402, -0.714136, 0.0],
        ],
        dtype=jnp.float32,
    )
    shifted = img - jnp.asarray([0.0, 128.0, 128.0], dtype=jnp.float32)
    return shifted @ m
