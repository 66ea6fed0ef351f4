"""Batched filtering primitives: filter2d, gaussian blur, USM sharpening.

Parity targets: reference ``utils/image/common.py:filter2D`` (per-sample
kernels, reflect padding) and ``utils/image/usm_sharp.py:USMSharp``.

Layout is NHWC. Per-sample kernels are applied as a single depthwise
convolution by folding batch into the channel axis — one XLA conv instead of
a Python loop or per-sample vmap dispatch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


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


def filter2d_pallas_enabled() -> bool:
    """Pallas depthwise filter path gate (see ``_filter2d_pallas``).

    Measured NEGATIVE on v5e (r5): 120 ms vs XLA's 21.5 ms for the two
    degradation blurs — Mosaic's per-FMA scalar loads + relayout shifts
    swamp the VPU work at these shapes. Kept opt-in for the record; the
    strip-fold reformulation below is the default fast path instead.
    """
    return os.environ.get("IR_FILTER2D_PALLAS", "0") == "1"


def filter2d_strips_enabled() -> bool:
    """Strip-fold depthwise filter path gate (see ``_filter2d_strips``)."""
    return os.environ.get("IR_FILTER2D_STRIPS", "1") == "1"


def _pick_strips(h: int, bc: int) -> int | None:
    """Smallest divisor s of h reaching >= 96 channels with strips of >= 8
    rows (one lane group, bounded halo); else the largest-channel fallback
    if it still reaches >= 48 channels."""
    best = None
    for s in range(2, h + 1):
        if h % s or h // s < 8:
            continue
        if bc * s >= 96:
            return s
        best = s
    return best if best is not None and bc * best >= 48 else None


def _filter2d_strips(img: jnp.ndarray, kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """Per-sample depthwise correlation with H-strips folded into channels.

    XLA's depthwise-conv emitter serializes over the channel sublanes, so a
    (1, H, W, B*C=6) filter uses 6/128 lanes (21.5 ms for the two 21x21
    degradation blurs at b2 512^2, r5 trace). Splitting H into ``s``
    halo-overlapped strips stacked on the channel axis raises that to
    B*C*s >= 96 channels at ~(strip+kh-1)/strip redundant rows — the same
    filter runs near VPU speed. Exact: strips carry real halo rows.
    """
    b, h, w, c = img.shape
    kh, kw = kernel.shape[-2:]
    x = _pad_reflect(img.astype(jnp.float32), kh // 2, kw // 2)
    hs = h // s
    strips = [x[:, i * hs : i * hs + hs + kh - 1] for i in range(s)]
    xs = jnp.concatenate(strips, axis=-1)  # (b, hs+kh-1, wp, c*s) strip-major
    xs = jnp.transpose(xs, (1, 2, 0, 3)).reshape(
        1, hs + kh - 1, w + kw - 1, b * c * s
    )
    k = jnp.repeat(kernel.astype(jnp.float32), c * s, axis=0)  # b-major
    k = jnp.transpose(k, (1, 2, 0))[:, :, None, :]  # HWIO (kh,kw,1,b*c*s)
    out = jax.lax.conv_general_dilated(
        xs,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c * s,
    )
    # (1, hs, w, b*s*c) -> (b, s*hs=h, w, c)
    out = out.reshape(hs, w, b, s, c)
    out = jnp.transpose(out, (2, 3, 0, 1, 4)).reshape(b, h, w, c)
    return out.astype(img.dtype)


def _filter2d_plane_kernel(x_ref, k_ref, o_ref, *, h, w, kh, kw, bh, slab, wt):
    """One reflect-padded plane -> filtered plane, as kh*kw shifted FMAs.

    x_ref: (1, h-bh+slab, w+kw-1), k_ref: (1, kh, kw), o_ref: (1, h, w).
    Each (bh, wt) tile loads one ``slab``-row block at a bh-aligned dynamic
    offset (Mosaic requires dynamic sublane starts to be 8-aligned and lane
    starts to be 128-aligned), then the kh*kw loop is fully unrolled so
    every shift is a static offset. The tile bounds the unrolled live
    temporaries (scoped-VMEM stack: kh*kw*bh*wt*4 bytes).
    """
    nu = w // wt

    def tile(idx, carry):
        t, u = idx // nu, idx % nu
        rows = x_ref[0, pl.dslice(t * bh, slab), pl.dslice(u * wt, wt + kw - 1)]
        acc = jnp.zeros((bh, wt), jnp.float32)
        for i in range(kh):
            row = rows[i : i + bh, :]
            for j in range(kw):
                acc = acc + row[:, j : j + wt] * k_ref[0, i, j]
        o_ref[0, pl.dslice(t * bh, bh), pl.dslice(u * wt, wt)] = acc
        return carry

    jax.lax.fori_loop(0, (h // bh) * nu, tile, 0)


def _filter2d_pallas(
    img: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-sample depthwise correlation as a Pallas VPU kernel.

    XLA's grouped-conv emitter for the (1, H, W, B*C) depthwise formulation
    serializes over the B*C=6 sublanes (~21.5 ms for the two 21x21 blurs in
    the b2 512^2 degradation program, r5 trace); expressed as shifted FMAs
    over full (bh, W) lane rows, the same filter is bandwidth/VPU-bound.
    """
    b, h, w, c = img.shape
    kh, kw = kernel.shape[-2:]
    x = _pad_reflect(img.astype(jnp.float32), kh // 2, kw // 2)
    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, h + kh - 1, w + kw - 1)
    kp = jnp.repeat(kernel.astype(jnp.float32), c, axis=0)  # b-major (B*C,kh,kw)
    bh = 8
    wt = _pick_col_tile(w)
    # slab rows per tile, 8-aligned; pad the plane so the last slab is in-bounds
    slab = -(-(bh + kh - 1) // 8) * 8
    hp = h - bh + slab
    if hp > h + kh - 1:
        xp = jnp.pad(xp, ((0, 0), (0, hp - (h + kh - 1)), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _filter2d_plane_kernel, h=h, w=w, kh=kh, kw=kw, bh=bh, slab=slab, wt=wt
        ),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec((1, hp, w + kw - 1), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, kh, kw), lambda p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        interpret=interpret,
    )(xp, kp)
    out = out.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return out.astype(img.dtype)


def _pick_col_tile(w: int):
    """Column tile: 128-aligned divisor of w, or w itself when one plane row
    fits the unroll budget (dynamic lane starts must be 128-aligned, so an
    indivisible w is only usable as a single whole-row tile)."""
    for cand in (256, 384, 512, 128):
        if w % cand == 0:
            return cand
    return w if w <= 512 else None


def _pallas_filter_ok(h: int, w: int, kh: int, kw: int) -> bool:
    wt = _pick_col_tile(w)
    if wt is None or h % 8 != 0 or w < 128:
        return False
    # plane + output + double buffering in VMEM; unrolled temps in scoped stack
    lanes = -(-(w + kw - 1) // 128) * 128
    vmem = (h + kh - 1) * lanes * 4 * 2 + h * (-(-w // 128) * 128) * 4 * 2
    stack = kh * kw * 8 * wt * 4
    return vmem < 24_000_000 and stack < 8_000_000


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Correlate NHWC ``img`` with per-sample (B,kh,kw) or shared (kh,kw) kernel.

    Reflect-pads so output shape equals input shape. The same 2-D kernel is
    applied to every channel (reference utils/image/common.py filter2D).
    """
    b, h, w, c = img.shape
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (b,) + kernel.shape)
    kh, kw = kernel.shape[-2:]
    if dilation == 1 and jax.default_backend() == "tpu":
        if filter2d_strips_enabled():
            s = _pick_strips(h, b * c)
            if s is not None and s > 1:
                return _filter2d_strips(img, kernel, s)
        if filter2d_pallas_enabled() and _pallas_filter_ok(h, w, kh, kw):
            return _filter2d_pallas(img, kernel)
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
