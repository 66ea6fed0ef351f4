"""Differentiable JPEG compression (pure jnp, NHWC, batched qualities).

Parity target: reference ``utils/image/diffjpeg.py`` (DiffJPEG modules,
450-492) used by the Real-ESRGAN degradation batch transform. The 8x8 DCT is
expressed as two small matmuls (separable DCT-II basis), which XLA maps onto
the MXU; quality is a per-sample traced value so one compiled program covers
the whole random-quality range.

Input/output images are NHWC in [0, 1]; height and width must be multiples
of 16 (callers pad; the batch transform always works on crops that are).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instarevive_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb

# Standard JPEG base quantization tables (luma / chroma).
Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]]
)


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis with JPEG scaling, as an 8x8 matrix."""
    n = np.arange(8)
    k = n[:, None]
    m = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    alpha = np.full(8, np.sqrt(2.0 / 8.0))
    alpha[0] = np.sqrt(1.0 / 8.0)
    return (alpha[:, None] * m).astype(np.float32)  # (freq, spatial)


_DCT = jnp.asarray(_dct_matrix())


def quality_to_factor(quality) -> jnp.ndarray:
    """JPEG quality (1-100) -> quantization scale factor."""
    quality = jnp.asarray(quality, dtype=jnp.float32)
    factor = jnp.where(quality < 50.0, 5000.0 / quality, 200.0 - quality * 2.0)
    # q=100 gives factor 0 (division by zero in quantization); clamp to the
    # q=99.5 level — visually lossless, numerically safe.
    return jnp.maximum(factor / 100.0, 0.01)


def diff_round(x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable rounding: round(x) + (x - round(x))^3."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blockify(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, nb, 8, 8) in row-major 8x8 block order."""
    b, h, w = plane.shape
    x = plane.reshape(b, h // 8, 8, w // 8, 8)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, (h // 8) * (w // 8), 8, 8)


def _unblockify(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = blocks.shape[0]
    x = blocks.reshape(b, h // 8, w // 8, 8, 8)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, h, w)


def _dct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    # X = D @ (x - 128) @ D^T
    return jnp.einsum(
        "ij,bnjk,lk->bnil", _DCT, blocks - 128.0, _DCT, preferred_element_type=jnp.float32
    )


def _idct8x8(coefs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum(
        "ji,bnjk,kl->bnil", _DCT, coefs, _DCT, preferred_element_type=jnp.float32
    ) + 128.0


def jpeg_compress_decompress(
    img: jnp.ndarray,
    quality,
    differentiable: bool = True,
) -> jnp.ndarray:
    """Round-trip JPEG on NHWC [0,1] images; ``quality`` scalar or (B,)."""
    b, h, w, _ = img.shape
    if h % 16 or w % 16:
        raise ValueError(f"H,W must be multiples of 16, got {(h, w)}")
    rnd = diff_round if differentiable else jnp.round
    factor = jnp.reshape(quality_to_factor(quality), (-1, 1, 1, 1))
    if factor.shape[0] == 1 and b > 1:
        factor = jnp.broadcast_to(factor, (b, 1, 1, 1))

    ycbcr = rgb_to_ycbcr(img.astype(jnp.float32) * 255.0)
    y = ycbcr[..., 0]
    # 2x2 chroma subsampling (average pooling, matching torch avg_pool2d).
    cb = ycbcr[..., 1].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = ycbcr[..., 2].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    y_tab = jnp.asarray(Y_TABLE)
    c_tab = jnp.asarray(C_TABLE)

    def roundtrip(plane, table, ph, pw):
        blocks = _dct8x8(_blockify(plane))
        q = table[None, None] * factor
        quant = rnd(blocks / q)
        return _unblockify(_idct8x8(quant * q), ph, pw)

    y = roundtrip(y, y_tab, h, w)
    cb = roundtrip(cb, c_tab, h // 2, w // 2)
    cr = roundtrip(cr, c_tab, h // 2, w // 2)

    # Chroma upsampling: nearest (repeat), matching the reference's
    # ChromaUpsampling (F.interpolate nearest x2).
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=1), 2, axis=2)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=2), 2, axis=1)

    rgb = ycbcr_to_rgb(jnp.stack([y, cb, cr], axis=-1))
    return jnp.clip(rgb / 255.0, 0.0, 1.0).astype(img.dtype)
