"""Opt-in int8-quantized 3x3 convs for the VAE decoder (IR_INT8_DECODE=1).

Motivation (VERDICT r4 item 6): decode is 63.5 ms of the 171.5 ms b4
512^2 pipeline and its 3x3 convs run ~40% bf16 MFU; v5e lists 2x int8 MXU
peak (394 vs 197 TOPS), so s8xs8->s32 convs have headroom IF XLA lowers
them to the int8 MXU path — gate-probed by tools/int8_conv_probe.py on
the real chip before wiring anything in.

Scheme: dynamic symmetric quantization — per-tensor activation scale
(abs-max/127, one extra HBM pass) and per-output-channel weight scales,
conv accumulates int32, dequantize in f32, bias added after. Weights are
quantized at trace time from the served params (a one-pass cost per call;
the conv weights are tiny next to the 512^2 activations). Quality is
measured, not assumed: tests/test_int8_conv.py pins the kernel numerics
and the decode-output PSNR vs the f32 path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def int8_decode_enabled() -> bool:
    """IR_INT8_DECODE=1 switches the VAE decoder ResnetBlock 3x3 convs to
    the quantized path (read at trace time, like the other vae toggles).
    Measured +3.8% end-to-end (6.34 vs 6.11 MP/s b4 512^2, BENCH.md r5)."""
    return os.environ.get("IR_INT8_DECODE", "0") == "1"


def int8_upsample_enabled() -> bool:
    """IR_INT8_UPSAMPLE=1 additionally quantizes the decoder's fused
    upsample convs — measured NEGATIVE on v5e (no throughput gain over
    IR_INT8_DECODE alone, extra quantization error); default off."""
    return os.environ.get("IR_INT8_UPSAMPLE", "0") == "1"


def _quantize_per_tensor(x: jnp.ndarray):
    amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_per_out_channel(w: jnp.ndarray):
    # HWIO kernel: one scale per output channel (last axis)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def conv2d_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """SAME-padded stride-1 conv computed s8 x s8 -> s32 on the MXU.

    x: (N, H, W, Cin) any float dtype; kernel: (kh, kw, Cin, Cout) HWIO.
    Returns f32 (or ``out_dtype``) dequantized output + bias.
    """
    xq, xs = _quantize_per_tensor(x.astype(jnp.float32))
    kq, ks = _quantize_per_out_channel(kernel.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs * ks)[None, None, None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype) if out_dtype is not None else y


def upsample2x_conv3x3_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """int8 variant of ops/conv_fused.upsample2x_conv3x3: the 3x3 kernel is
    box-folded to 4x4 in f32 FIRST, then quantized per output channel, so
    the quantization error matches a plain int8 conv (fold-then-quantize,
    not quantize-then-fold)."""
    from instarevive_tpu.ops.conv_fused import _box_fold_kernel

    W = _box_fold_kernel(kernel.astype(jnp.float32))
    xq, xs = _quantize_per_tensor(x.astype(jnp.float32))
    wq, ws = _quantize_per_out_channel(W)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs * ws)[None, None, None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype) if out_dtype is not None else y
