"""Fused Pallas window attention for SwinIR (TPU).

Why this kernel exists: the straightforward XLA lowering of Swin window
attention — window_partition (6D transpose) -> qkv head split -> bias
gather/transpose -> sdpa -> merge -> window_reverse — materializes ~7
layout-change copies per block in HBM. At the InstaRevive SwinIR config
(48 blocks, 64x64x180 features) those copies run at ~1% of HBM bandwidth
(pathological strides) and are ~50% of the stage's device time
(BENCH.md round-3 trace: 3.7 ms of 7.5 ms per 512^2 image).

This kernel consumes the fused qkv projection directly in spatial NHWC
(B, H, W, 3C) and produces the attention output in spatial NHWC
(B, H, W, C): the window partition, per-head split, relative-position
bias, shifted-window mask, softmax and PV matmul all happen in VMEM —
zero HBM round-trips between them. Grid: one program per (batch, window
row, window col); each program handles all heads of one window.

Numerics match ``ops.attention.sdpa`` (f32 scores/softmax/PV) and the
reference torch WindowAttention (diffusion/model/swinir.py:76-174);
exactness is asserted against the XLA path in tests/test_swin_pallas.py.

The cyclic shift for shifted windows stays OUTSIDE the kernel
(``jnp.roll`` on NHWC — a cheap fused op; BlockSpec index maps cannot
express the wrap-around window straddle).

STATUS (v5e, measured round 3): NEGATIVE — end-to-end batch-4 bench
regressed 5.92 -> 4.80 MP/s with this kernel wired into SwinBlock. The
grid is one program per window (256 programs/block at 64x64 features)
and each program runs 12 tiny (64x64x30) matmuls: the per-program
overhead and low MXU occupancy cost more than the layout copies saved
(~3.5 us/program vs the ~78 us/block copy budget). The production fix is
the pure-XLA window-resident RSTB layout in models/swinir.py (partition
once per group, shifts as static token-permutation gathers, head merge
folded into the proj matmul). The kernel is kept as a parity-tested
reference experiment; nothing dispatches to it by default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, heads: int, scale: float):
    """One window, all heads.

    qkv_ref: (1, ws, ws, 3C) — spatial tile of the fused qkv projection,
             lane order [q_h0..q_h{H-1}, k_h0.., v_h0..] (the plain
             Dense(3C) output reshaped as (3, heads, hd)).
    bias_ref: (heads, N, N) f32 relative-position bias (N = ws*ws).
    mask_ref: (1, N, N) f32 additive shift mask for THIS window (zeros
              when the block is unshifted).
    o_ref:   (1, ws, ws, C).
    """
    ws = qkv_ref.shape[1]
    n = ws * ws
    c3 = qkv_ref.shape[3]
    c = c3 // 3
    hd = c // heads

    x = qkv_ref[0].reshape(n, c3)  # token order = (row-major in window)
    m = mask_ref[0]  # (N, N) f32
    outs = []
    for h in range(heads):
        qh = x[:, h * hd : (h + 1) * hd]
        kh = x[:, c + h * hd : c + (h + 1) * hd]
        vh = x[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[h] + m
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p,
                vh.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    out = jnp.concatenate(outs, axis=-1)  # (N, C) f32
    o_ref[0] = out.reshape(ws, ws, c).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "window", "scale", "interpret")
)
def swin_window_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    heads: int,
    window: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed MSA on spatial maps. qkv: (B, H, W, 3C) with H, W multiples
    of ``window``; bias: (heads, N, N) f32; mask: (nWindows, N, N) f32
    additive or None. Returns (B, H, W, C) in qkv.dtype."""
    b, hh, ww, c3 = qkv.shape
    c = c3 // 3
    n = window * window
    gw = ww // window
    gh = hh // window
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
        mask_index = lambda bb, i, j: (0, 0, 0)
    else:
        mask = mask.astype(jnp.float32)
        mask_index = lambda bb, i, j: (i * gw + j, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        grid=(b, gh, gw),
        in_specs=[
            pl.BlockSpec((1, window, window, c3), lambda bb, i, j: (bb, i, j, 0)),
            pl.BlockSpec((heads, n, n), lambda bb, i, j: (0, 0, 0)),
            pl.BlockSpec((1, n, n), mask_index),
        ],
        out_specs=pl.BlockSpec((1, window, window, c), lambda bb, i, j: (bb, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32), mask)


