"""Fused Pallas kernels for the VAE/UNet hot path: GroupNorm(+SiLU) and
nearest 2x upsampling.

Why (measured on v5e, tools/trace_ops.py, decode @512²): XLA lowers each
GroupNorm to TWO stat passes over the tensor (separate sum and sum-of-
squares multiply_reduce fusions) plus a normalize pass, and lowers the
decoder's nearest-2x upsample (broadcast+reshape) to a materialized
broadcast AND a relayout reshape — together ~12 of the 20 ms decode.

These kernels do the minimum HBM traffic:

- ``group_norm_silu``: pass 1 reads x once and emits per-tile partial
  (sum, sumsq) row-reduced over full lanes; the tiny (N,C) affine
  ``a = gamma·rstd``, ``b = beta − mean·a`` folds normalize+affine into
  one multiply-add; pass 2 reads x once and writes silu(x·a+b).
  (3 moves vs XLA's ~4, and no standalone broadcasts.)
- ``upsample2x_nearest``: one pass, read tile → write the 2×2-repeated
  tile (1 read + 1 write of the 4x output; XLA pays an extra full
  read+write for the reshape relayout).

Both dispatch to reference jnp implementations off-TPU / on odd shapes,
so numerics are testable everywhere (parity tests run the pallas path in
interpret mode). Semantics match flax ``nn.GroupNorm(num_groups,
epsilon)`` with f32 stats + optional SiLU (reference ldm/modules/
diffusionmodules/model.py Normalize/nonlinearity, :34-42).

STATUS (v5e, traced): the kernels themselves hit their traffic targets
(~4 ms/iter for all GN+upsample work in the 512² decode), but swapping
them in wholesale makes XLA's conv fusions balloon 20.2 -> 81.7 ms/iter
— each pallas call is a layout barrier and the surrounding convs fall
off their preferred tilings. Until the layout interaction is solved
(round 2: fuse GN INTO the convs or pin layouts), the pallas path is
OPT-IN via IR_FUSED_KERNELS=1; the default dispatch uses the reference
jnp path, which XLA fuses exactly like the original inline GroupNorm.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["group_norm_silu", "upsample2x_nearest"]

_DISABLE = os.environ.get("IR_FUSED_KERNELS", "0") == "0"  # opt-in (see STATUS)


# ---------------------------------------------------------------- reference


def _gn_silu_ref(x, gamma, beta, groups, eps, silu):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _upsample2x_ref(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
    ).reshape(n, 2 * h, 2 * w, c)


# ------------------------------------------------------------------ kernels


def _stats_kernel(x_ref, out_ref):
    xt = x_ref[0].astype(jnp.float32)  # (Th, W, C)
    th, w, c = xt.shape
    flat = xt.reshape(th * w, c)
    s = jnp.sum(flat, axis=0)  # (C,) full-lane reduce
    ss = jnp.sum(flat * flat, axis=0)
    out_ref[0, 0] = jnp.stack([s, ss])  # (2, C)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu):
    xt = x_ref[0].astype(jnp.float32)  # (Th, W, C)
    y = xt * a_ref[0] + b_ref[0]  # (C,) broadcasts over rows
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_th(h: int, w: int, c: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    per_row = w * c * 8  # bf16 in + out + f32 temp, rough
    th = max(1, budget_bytes // max(per_row, 1))
    while h % th:
        th -= 1
    return th


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def _gn_silu_pallas(x, gamma, beta, groups, eps, silu, interpret=False):
    n, h, w, c = x.shape
    th = _pick_th(h, w, c)
    grid = (n, h // th)

    partial = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h // th, 2, c), jnp.float32),
        interpret=interpret,
    )(x)
    sums = partial.sum(axis=1)  # (N, 2, C)
    cg = c // groups
    cnt = h * w * cg
    gsum = sums[:, 0].reshape(n, groups, cg).sum(-1)  # (N, G)
    gsq = sums[:, 1].reshape(n, groups, cg).sum(-1)
    mean = gsum / cnt
    var = gsq / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)  # (N, G)
    rstd_c = jnp.repeat(rstd, cg, axis=1)  # (N, C)
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = gamma.astype(jnp.float32)[None] * rstd_c
    b = beta.astype(jnp.float32)[None] - mean_c * a

    return pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, a, b)


def _upsample_kernel(x_ref, o_ref):
    xt = x_ref[0]  # (Th, W, C)
    th, w, c = xt.shape
    y = jnp.broadcast_to(xt[:, None, :, None, :], (th, 2, w, 2, c))
    o_ref[0] = y.reshape(2 * th, 2 * w, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upsample2x_pallas(x, interpret=False):
    n, h, w, c = x.shape
    th = _pick_th(h, w, c, budget_bytes=2 * 1024 * 1024)
    grid = (n, h // th)
    return pl.pallas_call(
        _upsample_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(x)


# ----------------------------------------------------------------- dispatch


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-6,
    silu: bool = True,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm (f32 stats) + optional SiLU, fused on TPU.

    Matches flax ``nn.GroupNorm(num_groups=groups, epsilon=eps)`` followed
    by ``nn.silu`` bit-for-bit up to reduction order.
    """
    n, h, w, c = x.shape
    usable = (
        not _DISABLE
        and c % max(groups, 1) == 0
        and c % 128 == 0
        and w * c >= 512
        and (interpret or _on_tpu())
    )
    if not usable:
        if _onepass_gn_enabled() and c % max(groups, 1) == 0:
            return _gn_silu_onepass(x, gamma, beta, groups, eps, silu)
        return _gn_silu_ref(x, gamma, beta, groups, eps, silu)
    return _gn_silu_pallas(x, gamma, beta, groups, eps, silu,
                           interpret=bool(interpret))


def upsample2x_nearest(x: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (NHWC), single-pass on TPU."""
    n, h, w, c = x.shape
    usable = not _DISABLE and c % 128 == 0 and (interpret or _on_tpu())
    if not usable:
        return _upsample2x_ref(x)
    return _upsample2x_pallas(x, interpret=bool(interpret))


def _gn_silu_onepass(x, gamma, beta, groups, eps, silu):
    """GroupNorm with sum and sum-of-squares computed in ONE variadic
    lax.reduce pass (XLA otherwise emits two separate multiply_reduce
    fusions over x — the measured ~6 ms of the 512^2 decode's stat cost).
    Same cancellation behavior as flax GroupNorm (var = E[x^2] - E[x]^2).
    Opt-in via IR_ONEPASS_GN=1."""
    n, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, cg)
    zero = jnp.float32(0)

    def comp(a, b):
        return a[0] + b[0], a[1] + b[1]

    s, ss = jax.lax.reduce((xf, xf * xf), (zero, zero), comp, (1, 3))  # (n, g)
    cnt = h * w * cg
    mean = (s / cnt)[:, None, :, None]
    var = (ss / cnt)[:, None, :, None] - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _onepass_gn_enabled() -> bool:
    return os.environ.get("IR_ONEPASS_GN", "0") == "1"
