"""Static-shape separable resizers (MATLAB/PIL bicubic, torch-style interpolate).

Behavior parity targets (see SURVEY.md §2.1/§7): the reference's
``imresize_np`` (MATLAB-convention bicubic, ``utils/util_image.py:312-446``),
``F.interpolate`` nearest/bilinear/bicubic/area modes used throughout the
degradation pipeline, and PIL bicubic used by ``auto_resize``
(``utils/image/common.py:229``).

TPU design: interpolation weights are computed **at trace time** with numpy
for the static (in_size, out_size) pair, then applied on-device as a gather
over the few contributing taps plus a tiny einsum — no dynamic shapes, no
scatter, vectorizes over batch/channels, fuses into surrounding work.
Arrays are NHWC (or any rank; the two spatial axes are given explicitly).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    w = ((a + 2) * ax3 - (a + 3) * ax2 + 1) * (ax <= 1)
    w = w + (a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a) * ((ax > 1) & (ax < 2))
    return w


def _linear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(1.0 - ax, 0.0)


def _apply_boundary(
    indices: np.ndarray, weights: np.ndarray, in_len: int, boundary: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Resolve out-of-range tap indices.

    replicate: clamp to edge (torch non-AA convention);
    symmetric: mirror with edge repeat (MATLAB imresize / reference
               utils/util_image.py:340-371 symmetric copying);
    renorm:    drop out-of-range taps and renormalize (PIL / torch-AA).
    """
    if boundary == "replicate":
        indices = np.clip(indices, 0, in_len - 1)
    elif boundary == "symmetric":
        m = 2 * in_len
        j = np.mod(indices, m)
        indices = np.where(j < in_len, j, m - 1 - j)
    elif boundary == "renorm":
        valid = (indices >= 0) & (indices < in_len)
        weights = weights * valid
        weights = weights / np.sum(weights, axis=1, keepdims=True)
        indices = np.clip(indices, 0, in_len - 1)
    else:
        raise ValueError(boundary)
    return indices.astype(np.int32), weights


def _contributions(
    in_len: int,
    out_len: int,
    scale: float,
    kernel: str,
    antialias: bool,
    a: float,
    boundary: str = "symmetric",
) -> Tuple[np.ndarray, np.ndarray]:
    """MATLAB-convention tap indices and weights for one axis."""
    if kernel == "cubic":
        kfn, kwidth = partial(_cubic, a=a), 4.0
    elif kernel == "linear":
        kfn, kwidth = _linear, 2.0
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    aa = antialias and scale < 1.0
    kscale = scale if aa else 1.0
    width = kwidth / kscale

    # MATLAB mapping: output pixel x (1-based) samples input at u.
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - width / 2.0)
    p = int(np.ceil(width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]  # 1-based tap positions
    dist = u[:, None] - indices
    weights = kscale * kfn(dist * kscale)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    indices, weights = _apply_boundary(indices - 1, weights, in_len, boundary)

    # Trim taps that are zero for every output pixel.
    nz = np.nonzero(np.any(weights != 0, axis=0))[0]
    if len(nz):
        indices = indices[:, nz[0] : nz[-1] + 1]
        weights = weights[:, nz[0] : nz[-1] + 1]
    return indices, weights.astype(np.float32)


def _torch_contributions(
    in_len: int, out_len: int, kernel: str, antialias: bool, a: float,
    align_corners: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """torch.nn.functional.interpolate convention."""
    if kernel == "cubic":
        kfn, kwidth = partial(_cubic, a=a), 4.0
    elif kernel == "linear":
        kfn, kwidth = _linear, 2.0
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    scale = out_len / in_len
    aa = antialias and scale < 1.0
    kscale = scale if aa else 1.0
    width = kwidth / kscale

    i = np.arange(out_len, dtype=np.float64)  # noqa: E741
    if align_corners:
        # torch align_corners=True: endpoints map exactly (no antialias)
        u = i * ((in_len - 1) / (out_len - 1)) if out_len > 1 else np.zeros_like(i)
    else:
        u = (i + 0.5) / scale - 0.5  # 0-based source coordinate
    left = np.floor(u - width / 2.0) + 1.0
    p = int(np.ceil(width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]
    dist = u[:, None] - indices
    weights = kscale * kfn(dist * kscale)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # torch non-AA clamps coordinates (replicate); its AA path is PIL-derived
    # and drops+renormalizes out-of-range taps.
    indices, weights = _apply_boundary(
        indices, weights, in_len, "renorm" if antialias else "replicate"
    )
    nz = np.nonzero(np.any(weights != 0, axis=0))[0]
    if len(nz):
        indices = indices[:, nz[0] : nz[-1] + 1]
        weights = weights[:, nz[0] : nz[-1] + 1]
    return indices, weights.astype(np.float32)


def _apply_taps(x: jnp.ndarray, indices: np.ndarray, weights: np.ndarray, axis: int):
    """out[..., o, ...] = sum_p w[o,p] * x[..., idx[o,p], ...] along ``axis``."""
    out_len, p = indices.shape
    g = jnp.take(x, jnp.asarray(indices.reshape(-1)), axis=axis)
    g = jnp.moveaxis(g, axis, -1)
    g = g.reshape(g.shape[:-1] + (out_len, p))
    w = jnp.asarray(weights, dtype=g.dtype)
    out = jnp.einsum("...op,op->...o", g, w)
    return jnp.moveaxis(out, -1, axis)


def imresize_matlab(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    kernel: str = "cubic",
    antialias: bool = True,
    spatial_axes: Tuple[int, int] = (-3, -2),
    boundary: str = "symmetric",
) -> jnp.ndarray:
    """MATLAB ``imresize``-convention resize (reference utils/util_image.py:312).

    Cubic a=-0.5 with antialiasing on downscale and symmetric boundary —
    bit-matches the reference ``imresize_np``. Pass ``boundary='renorm'`` for
    PIL ``Image.resize(..., BICUBIC)`` semantics (same kernel, PIL edge
    handling) — the reference's ``auto_resize`` path.
    """
    ha, wa = spatial_axes
    in_h, in_w = x.shape[ha], x.shape[wa]
    out_h, out_w = out_hw
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if out_h != in_h:
        idx, w = _contributions(in_h, out_h, out_h / in_h, kernel, antialias, -0.5, boundary)
        xf = _apply_taps(xf, idx, w, ha)
    if out_w != in_w:
        idx, w = _contributions(in_w, out_w, out_w / in_w, kernel, antialias, -0.5, boundary)
        xf = _apply_taps(xf, idx, w, wa)
    return xf.astype(dtype)


def pil_resize_bicubic(
    x: jnp.ndarray, out_hw: Tuple[int, int], spatial_axes: Tuple[int, int] = (-3, -2)
) -> jnp.ndarray:
    """PIL BICUBIC resize (the reference CLI's sr_scale / auto_resize path)."""
    return imresize_matlab(x, out_hw, spatial_axes=spatial_axes, boundary="renorm")


def interpolate(
    x: jnp.ndarray,
    out_hw: Optional[Tuple[int, int]] = None,
    scale_factor: Optional[float] = None,
    mode: str = "bilinear",
    antialias: bool = False,
    spatial_axes: Tuple[int, int] = (-3, -2),
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch ``F.interpolate`` semantics on NHWC arrays.

    Modes: nearest | bilinear | bicubic | area. Used for degradation-pipeline
    parity (reference dataset/batch_transform.py resize stages), the
    SwinIR ``nearest+conv`` upsampler, and the DPT fusion upsamples
    (align_corners=True, midas/midas/blocks.py:335-337).
    """
    if align_corners and mode not in ("bilinear", "bicubic"):
        raise ValueError("align_corners only applies to bilinear/bicubic")
    if align_corners and antialias:
        raise ValueError("align_corners is incompatible with antialias")
    ha, wa = spatial_axes
    in_h, in_w = x.shape[ha], x.shape[wa]
    if out_hw is None:
        if scale_factor is None:
            raise ValueError("need out_hw or scale_factor")
        out_hw = (int(in_h * scale_factor), int(in_w * scale_factor))
    out_h, out_w = out_hw
    if (out_h, out_w) == (in_h, in_w):
        return x

    if mode == "nearest":
        if out_h % in_h == 0 and out_w % in_w == 0 and spatial_axes == (-3, -2):
            # integer upscale: broadcast-reshape (no gather — much faster on
            # TPU; this is the VAE-decoder / SwinIR upsampler hot path)
            fh, fw = out_h // in_h, out_w // in_w
            b = x.shape[:-3]
            xe = x[..., :, None, :, None, :]
            xe = jnp.broadcast_to(xe, b + (in_h, fh, in_w, fw, x.shape[-1]))
            return xe.reshape(b + (out_h, out_w, x.shape[-1]))
        # torch 'nearest': src = floor(dst * in / out)
        ih = np.minimum((np.arange(out_h) * in_h // out_h), in_h - 1).astype(np.int32)
        iw = np.minimum((np.arange(out_w) * in_w // out_w), in_w - 1).astype(np.int32)
        out = jnp.take(x, jnp.asarray(ih), axis=ha)
        out = jnp.take(out, jnp.asarray(iw), axis=wa)
        return out

    if mode == "area":
        # adaptive average pool; exact for integer factors
        if in_h % out_h == 0 and in_w % out_w == 0:
            fh, fw = in_h // out_h, in_w // out_w
            xm = jnp.moveaxis(jnp.moveaxis(x, ha, -2), wa if wa > ha else wa + 1, -1)
            shp = xm.shape[:-2] + (out_h, fh, out_w, fw)
            out = xm.reshape(shp).mean(axis=(-3, -1))
            out = jnp.moveaxis(jnp.moveaxis(out, -1, wa if wa > ha else wa + 1), -2, ha)
            return out
        # general adaptive-average via linear taps with box kernel
        idx_h, w_h = _box_contributions(in_h, out_h)
        idx_w, w_w = _box_contributions(in_w, out_w)
        dtype = x.dtype
        xf = _apply_taps(x.astype(jnp.float32), idx_h, w_h, ha)
        xf = _apply_taps(xf, idx_w, w_w, wa)
        return xf.astype(dtype)

    kern = {"bilinear": "linear", "bicubic": "cubic"}[mode]
    # torch bicubic uses a=-0.75; its antialias path (PIL-derived) uses a=-0.5
    a = -0.5 if antialias else -0.75
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if out_h != in_h:
        idx, w = _torch_contributions(in_h, out_h, kern, antialias, a, align_corners)
        xf = _apply_taps(xf, idx, w, ha)
    if out_w != in_w:
        idx, w = _torch_contributions(in_w, out_w, kern, antialias, a, align_corners)
        xf = _apply_taps(xf, idx, w, wa)
    return xf.astype(dtype)


def _box_contributions(in_len: int, out_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Adaptive average-pool taps (torch adaptive_avg_pool semantics)."""
    starts = (np.arange(out_len) * in_len) // out_len
    ends = -((-(np.arange(out_len) + 1) * in_len) // out_len)  # ceil
    p = int(np.max(ends - starts))
    indices = starts[:, None] + np.arange(p)[None, :]
    valid = indices < ends[:, None]
    weights = valid.astype(np.float32)
    weights /= weights.sum(axis=1, keepdims=True)
    indices = np.clip(indices, 0, in_len - 1).astype(np.int32)
    return indices, weights


def resize_by_scale(
    x: jnp.ndarray,
    scale: float,
    mode: str = "bicubic",
    spatial_axes: Tuple[int, int] = (-3, -2),
) -> jnp.ndarray:
    """Scale-factor resize with torch rounding of the output size."""
    ha, wa = spatial_axes
    out_hw = (int(x.shape[ha] * scale), int(x.shape[wa] * scale))
    if mode == "matlab_bicubic":
        return imresize_matlab(x, out_hw, spatial_axes=spatial_axes)
    return interpolate(x, out_hw, mode=mode, spatial_axes=spatial_axes)
