"""Fused GroupNorm + SiLU + 3x3 SAME conv as ONE Pallas kernel (TPU).

Why: every VAE/UNet ResnetBlock (reference ldm/modules/diffusionmodules/
model.py:116-180: ``h = conv(nonlinearity(norm(x)))`` twice per block)
makes XLA materialize the normalized+SiLU'd tensor in HBM before the conv
reads it back — at the 512^2 decode stage that intermediate is 64 MB per
tensor and the elementwise round trips are ~20% of decode device time
(BENCH.md round-3 stage table; the standalone Pallas GN kernels in
ops/norm_kernels.py measured *neutral* because swapping only the GN left
a layout barrier between XLA conv fusions — the fix is fusing the GN/SiLU
*into* the conv, which this kernel does).

Dataflow per grid step (one row-strip of one sample):

  HBM: x strip (+1-row halos)  ──DMA──►  VMEM
  VMEM: y = silu(x * a + b)    (a = gamma*rstd, b = beta - mean*a —
                                the per-(sample,channel) GN affine,
                                precomputed from one cheap XLA stats pass)
  VMEM: out = sum_{dy,dx} y[dy:,dx:,:] @ w[dy,dx]   (9 MXU matmuls,
                                f32 accumulation == the 3x3 SAME conv)
  VMEM ──► HBM: out strip

The normalized tensor never exists in HBM. SAME zero-padding is honored
exactly: the halo rows/columns outside the image are ZERO (the reference
pads the conv *input*, i.e. the silu output, with zeros — not
silu(affine(0))), masked via @pl.when at the first/last strip.

Backward: a jax.custom_vjp recomputes the reference composition under
jax.vjp — the kernel is inference-fast, gradients are exact (VAE weights
are frozen in every reference training recipe; grads only flow through
decode/encode in eval-style losses).

Parity: tests/test_gn_conv.py pins the kernel (interpret mode on CPU) to
the reference composition at every decoder stage geometry.

STATUS (v5e, measured round 3): NEGATIVE, default OFF (IR_GN_CONV=1 to
opt in). Three formulations of the conv all landed ~30% below the XLA
default end-to-end (batch-4 512^2 bench, XLA baseline 6.06 MP/s):
  1. 3D windowed slices, 9 (th,W,C)x(C,Co) dots       -> 4.34 MP/s
  2. flattened strip, 9 contiguous-slice (th*P,C) GEMMs -> 4.29 MP/s
  3. in-VMEM im2col, ONE deep-K (th*P,9C)x(9C,Co) GEMM  -> 4.16 MP/s
(1. first OOM'd the 16 MB scoped VMEM at 512^2/c256 — _pick_th now
models usage exactly.) The device trace shows the fused calls running
near XLA's conv throughput in isolation; the loss is structural around
the custom-call boundary (XLA fusion/pipelining breaks at every pallas
call: nin_shortcut/residual-add/next-stats no longer fuse, and Mosaic's
sublane-misaligned strip copies pay per-tile realignment). The XLA
default path (flax GroupNorm -> silu -> lax.conv, fully fused by XLA)
remains the production configuration.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu_conv3x3", "gn_conv_enabled"]


# ------------------------------------------------------------- reference path


def _reference(x, gamma, beta, w, bias, groups, eps):
    """silu(GroupNorm(x)) -> conv3x3 SAME, matching flax nn.GroupNorm
    (f32 stats) + nn.Conv semantics. Used off-TPU and as the VJP math."""
    n, h, ww, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(n, h * ww, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, ww, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # bias added in the compute dtype, like flax nn.Conv(dtype=...)
    return out + bias.astype(x.dtype)


def _gn_affine(x, gamma, beta, groups, eps):
    """Per-(sample, channel) affine folding the GN statistics:
    y = x*a + b  ==  (x - mean) * rstd * gamma + beta. One fused XLA read."""
    n, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, cg)
    mean = xf.mean(axis=(1, 3))  # (N, G)
    # E[x^2]-mean^2 can go slightly negative under f32 cancellation for
    # near-constant inputs, and rsqrt(var+eps) would then NaN while the
    # two-pass _reference stays finite — clamp to keep the paths aligned.
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean), 0.0
    )
    rstd = jax.lax.rsqrt(var + eps)
    rstd_c = jnp.repeat(rstd, cg, axis=1)  # (N, C)
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = gamma.astype(jnp.float32)[None] * rstd_c
    b = beta.astype(jnp.float32)[None] - mean_c * a
    return a, b


# ------------------------------------------------------------------- kernel


def _kernel(a_ref, b_ref, x_ref, top_ref, bot_ref, w_ref, bias_ref, o_ref,
            scratch, cols, *, th: int):
    i = pl.program_id(1)
    nst = pl.num_programs(1)
    a = a_ref[0]  # (C,) f32
    b = b_ref[0]
    w = x_ref.shape[2]
    c = x_ref.shape[3]
    co = o_ref.shape[3]
    p = w + 4  # padded row: [garbage, zero, real 0..w-1, zero, garbage]

    def norm(t):  # (..., C) -> silu(t*a+b) in compute dtype
        y = t.astype(jnp.float32) * a + b
        return (y * jax.nn.sigmoid(y)).astype(scratch.dtype)

    # The strip lives FLATTENED in scratch as ((th+2)*P, C), row-major with
    # padded width P = W+4: every conv tap (dy, dx) is then a CONTIGUOUS 2D
    # slice flat[dy*P+dx : dy*P+dx + th*P]. The 9 taps are gathered into an
    # im2col buffer ``cols`` (th*P, 9C) so the conv is ONE deep-K MXU
    # matmul — 9 separate K=C matmuls measured ~2x below XLA's conv
    # efficiency, and the 3D-windowed version before that was no better
    # (BENCH.md round 3). Zero-memset covers SAME padding + boundary halo
    # rows in one shot.
    scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
    xs = norm(x_ref[0])  # (th, W, C)
    for y in range(th):
        scratch[(y + 1) * p + 2 : (y + 1) * p + 2 + w] = xs[y]

    @pl.when(i > 0)
    def _():
        scratch[2 : 2 + w] = norm(top_ref[0, 0])

    @pl.when(i < nst - 1)
    def _():
        scratch[(th + 1) * p + 2 : (th + 1) * p + 2 + w] = norm(bot_ref[0, 0])

    for dy in range(3):
        for dx in range(3):
            j = dy * 3 + dx
            cols[:, j * c : (j + 1) * c] = scratch[dy * p + dx : dy * p + dx + th * p]
    acc = jax.lax.dot_general(
        cols[...], w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (th*P, Co)
    out = (acc + bias_ref[0]).reshape(th, p, co)
    # out_pad column xp holds the conv centered at scratch col xp+1, i.e.
    # real output x = xp-1; columns 0 and > w are padding garbage.
    o_ref[0] = out[:, 1 : w + 1].astype(o_ref.dtype)


def _vmem_usage(th: int, w: int, c: int, co: int, esize: int) -> int:
    """Exact-ish scoped-VMEM model for one program: flattened scratch strip
    + im2col buffer + double-buffered x/halo/out blocks (``esize`` bytes
    per element, the compute dtype) + f32 accumulator + weights."""
    p = w + 4
    scratch = ((th + 2) * p + 4) * c * esize
    im2col = th * p * 9 * c * esize
    x_in = 2 * th * w * c * esize
    halos = 2 * 2 * w * c * esize
    out = 2 * th * w * co * esize
    acc = th * p * co * 4
    weights = 9 * c * co * esize  # constant index map — not revolved
    return scratch + im2col + x_in + halos + out + acc + weights


def _pick_th(h: int, w: int, c: int, co: int, esize: int,
             budget: int = 12 * 1024 * 1024) -> Optional[int]:
    # stay well under the 16 MB scoped-VMEM limit (the first TPU run OOM'd
    # at 16.35M with a cruder model; see BENCH.md round 3)
    th = h
    while th > 1 and (h % th or _vmem_usage(th, w, c, co, esize) > budget):
        th -= 1
    if _vmem_usage(th, w, c, co, esize) > budget:
        # even a single-row strip exceeds scoped VMEM (very wide W*C):
        # signal the caller to fall back to the XLA composition instead of
        # launching a kernel that would OOM — the failure mode this picker
        # exists to prevent.
        return None
    return th


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "interpret", "th")
)
def _fused_call(x, gamma, beta, w, bias, groups, eps, interpret=False, th=None):
    n, h, ww, c = x.shape
    co = w.shape[3]
    a, b = _gn_affine(x, gamma, beta, groups, eps)
    if th is not None and h % th:
        raise ValueError(f"th={th} must divide H={h}")
    th = th or _pick_th(h, ww, c, co, jnp.dtype(x.dtype).itemsize)
    if th is None:
        raise ValueError(
            "shape exceeds the scoped-VMEM budget at th=1; use "
            "gn_silu_conv3x3 (which falls back to the XLA composition)"
        )
    grid = (n, h // th)

    def clamp_top(bb, i):
        return (bb, jnp.maximum(i * th - 1, 0), 0, 0)

    def clamp_bot(bb, i):
        return (bb, jnp.minimum(i * th + th, h - 1), 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, th=th),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c), lambda bb, i: (bb, 0)),  # a
            pl.BlockSpec((1, c), lambda bb, i: (bb, 0)),  # b
            pl.BlockSpec((1, th, ww, c), lambda bb, i: (bb, i, 0, 0)),  # x strip
            pl.BlockSpec((1, 1, ww, c), clamp_top),  # top halo row
            pl.BlockSpec((1, 1, ww, c), clamp_bot),  # bottom halo row
            pl.BlockSpec((9 * c, co), lambda bb, i: (0, 0)),  # weights (9C, Co)
            pl.BlockSpec((1, co), lambda bb, i: (0, 0)),  # bias
        ],
        out_specs=pl.BlockSpec((1, th, ww, co), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * (ww + 4) + 4, c), x.dtype),
            pltpu.VMEM((th * (ww + 4), 9 * c), x.dtype),
        ],
        interpret=interpret,
    )(a, b, x, x, x,
      w.astype(x.dtype).reshape(9 * c, co),
      bias.reshape(1, co).astype(jnp.float32))


# ------------------------------------------------------- public entry + vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _gn_silu_conv3x3(x, gamma, beta, w, bias, groups, eps, interpret, th):
    return _fused_call(x, gamma, beta, w, bias, groups, eps, interpret=interpret, th=th)


def _fwd(x, gamma, beta, w, bias, groups, eps, interpret, th):
    return _gn_silu_conv3x3(x, gamma, beta, w, bias, groups, eps, interpret, th), (
        x, gamma, beta, w, bias,
    )


def _bwd(groups, eps, interpret, th, res, g):
    # exact gradients via the reference composition (recompute-in-backward;
    # the kernel itself stays forward-only)
    x, gamma, beta, w, bias = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, groups=groups, eps=eps),
        x, gamma, beta, w, bias,
    )
    return vjp(g)


_gn_silu_conv3x3.defvjp(_fwd, _bwd)


_ENV = "IR_GN_CONV"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def gn_conv_enabled(interpret: Optional[bool] = None) -> bool:
    """Fused GN+SiLU+conv kernel gate. DEFAULT OFF — measured NEGATIVE on
    v5e across three kernel formulations (see the STATUS note in the
    module docstring / BENCH.md round 3); IR_GN_CONV=1 opts in,
    IR_GN_CONV_INTERPRET=1 enables the interpret kernel on CPU (tests)."""
    env = os.environ.get(_ENV)
    if env is not None:
        return env not in ("0", "false", "off")
    # the interpret flag is a CPU-test affordance: never let it turn the
    # compiled (measured-negative) kernel on for a real TPU backend
    return bool(interpret) or gn_interpret()


def gn_interpret() -> bool:
    return os.environ.get("IR_GN_CONV_INTERPRET") == "1" and not _on_tpu()


def gn_silu_conv3x3(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
    th: Optional[int] = None,
) -> jnp.ndarray:
    """conv3x3_SAME(silu(GroupNorm(x; gamma, beta)), w) + bias, fused.

    x: (N, H, W, C) NHWC; w: (3, 3, C, Co) HWIO; gamma/beta: (C,);
    bias: (Co,). Matches flax ``nn.GroupNorm(groups, eps)`` -> ``nn.silu``
    -> ``nn.Conv(Co, (3,3), SAME)`` (reference model.py:116-180 ResnetBlock
    halves). Dispatches to the fused Pallas kernel when eligible, else the
    plain XLA composition.
    """
    n, h, ww, c = x.shape
    co = w.shape[3]
    it = interpret if interpret is not None else gn_interpret()
    eligible = (
        c % 128 == 0
        and co % 128 == 0
        and c % groups == 0
        and h >= 4
        and (it or _on_tpu())
    )
    if not eligible:
        return _reference(x, gamma, beta, w, bias, groups, eps)
    if th is None:
        th = _pick_th(h, ww, c, co, jnp.dtype(x.dtype).itemsize)
        if th is None:  # no strip height fits scoped VMEM for this W*C
            return _reference(x, gamma, beta, w, bias, groups, eps)
    return _gn_silu_conv3x3(x, gamma, beta, w, bias, groups, eps, bool(it), th)
