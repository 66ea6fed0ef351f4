"""RAW/ISP processing: bayer -> RGB with CRF interpolation.

Parity target: reference ``utils/process.py:15-174`` (gains, CCM, gamma,
CRF via the vendored torchinterp1d custom autograd op — the repo's only
custom-autograd kernel). In JAX, batched monotone 1-D interpolation is
``jnp.interp`` under vmap, natively differentiable — no custom VJP needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def interp1d(x_new: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched linear interpolation (torchinterp1d.Interp1d equivalent).

    x_new: (B, M); x: (B, N) ascending; y: (B, N) -> (B, M).
    """
    return jax.vmap(jnp.interp)(x_new, x, y)


def apply_gains(bayer: jnp.ndarray, red_gain, blue_gain) -> jnp.ndarray:
    """Per-channel gains on RGGB bayer stack (B, H, W, 4)."""
    gains = jnp.stack(
        [red_gain, jnp.ones_like(red_gain), jnp.ones_like(red_gain), blue_gain], axis=-1
    )
    return bayer * gains[:, None, None, :]


def demosaic_bilinear(bayer: jnp.ndarray) -> jnp.ndarray:
    """Simple RGGB (B, H, W, 4) -> RGB (B, 2H? no: half-res) bilinear-ish:
    the reference works on the half-res stacked representation; green is the
    mean of the two green planes."""
    r = bayer[..., 0]
    g = (bayer[..., 1] + bayer[..., 2]) / 2.0
    b = bayer[..., 3]
    return jnp.stack([r, g, b], axis=-1)


def apply_ccm(rgb: jnp.ndarray, ccm: jnp.ndarray) -> jnp.ndarray:
    """Color correction matrix (B, 3, 3)."""
    return jnp.einsum("bhwc,bdc->bhwd", rgb, ccm)


def gamma_compression(rgb: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    return jnp.maximum(rgb, 1e-8) ** (1.0 / gamma)


def apply_crf(rgb: jnp.ndarray, crf_i: jnp.ndarray, crf_b: jnp.ndarray) -> jnp.ndarray:
    """Camera response function lookup via interpolation (process.py CRF).

    crf_i: (N,) irradiance knots; crf_b: (N,) brightness values.
    """
    flat = rgb.reshape(rgb.shape[0], -1)
    xi = jnp.broadcast_to(crf_i[None], (flat.shape[0], crf_i.shape[0]))
    yi = jnp.broadcast_to(crf_b[None], (flat.shape[0], crf_b.shape[0]))
    out = interp1d(flat, xi, yi)
    return out.reshape(rgb.shape)


def raw2rgb(
    bayer: jnp.ndarray,
    red_gain,
    blue_gain,
    ccm: jnp.ndarray,
    crf_i=None,
    crf_b=None,
    gamma: float = 2.2,
) -> jnp.ndarray:
    """Full pipeline: gains -> demosaic -> CCM -> CRF/gamma (process.py)."""
    x = apply_gains(bayer, red_gain, blue_gain)
    x = jnp.clip(x, 0.0, 1.0)
    x = demosaic_bilinear(x)
    x = apply_ccm(x, ccm)
    x = jnp.clip(x, 0.0, 1.0)
    if crf_i is not None:
        return apply_crf(x, crf_i, crf_b)
    return gamma_compression(x, gamma)
