"""Fused nearest-2x-upsample + 3x3 conv as ONE lhs-dilated convolution.

Why: the VAE decoder (models/vae.py Decoder) and the SwinIR nearest+conv
upsampler spend a measured ~6 ms/iter (512^2 decode, v5e, tools/
trace_ops.py) materializing the 2x nearest upsample (broadcast + relayout
reshape) before each 3x3 conv. Algebraically,

    conv3x3_SAME(nearest_up2x(x), w) == conv(x, W, lhs_dilation=2, pad=2)

with ``W`` the 4x4 kernel formed by summing the four 2x2-shifted copies of
``w`` (nearest upsample = zero-insertion followed by a [1,1]x[1,1] box
filter; the box filter folds into the conv kernel). The fused form never
materializes the 4x-sized intermediate: XLA lowers lhs-dilated convs with
its transposed-convolution path.

DEFAULT ON (v5e-measured: batch-4 512^2 end-to-end 5.21 -> 5.83 MP/s,
+12%); disable with IR_FUSED_UPSAMPLE=0. The transform is exact (parity
tests) and parameter-compatible with the unfused checkpoints.

Derivation (per axis, cross-correlation convention):
  u[p] = x[floor(p/2)]          (nearest upsample)
  y[p] = sum_k w[k] u[p+k-1]    (3x3 SAME, pad 1)
Let d = zero-insertion of x (lhs_dilation=2). Then u[m] = d[m] + d[m-1],
so y[p] = sum_t W[t] d[p-2+t] with W[t] = sum_{j in {0,1}} w[t-1+j]:
a 4-tap kernel, padding (2,2) on the dilated input.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["upsample2x_conv3x3", "fused_upsample_enabled"]


def fused_upsample_enabled() -> bool:
    return os.environ.get("IR_FUSED_UPSAMPLE", "1") == "1"


def _box_fold_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,I,O) HWIO -> (4,4,I,O): sum of the four 2x2-shifted copies."""
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))  # (5,5,I,O)
    return wp[0:4, 0:4] + wp[1:5, 0:4] + wp[0:4, 1:5] + wp[1:5, 1:5]


def upsample2x_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b=None,
                       groups: int = 1) -> jnp.ndarray:
    """NHWC x (B,H,W,I), HWIO w (3,3,I/groups,O) -> (B,2H,2W,O); exactly
    equals conv3x3_SAME(nearest_up2x(x), w) (+ b). ``groups`` supports the
    packed batch-in-channels decode (ops/packed_vae.py)."""
    W = _box_fold_kernel(w)
    out = jax.lax.conv_general_dilated(
        x, W, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out
