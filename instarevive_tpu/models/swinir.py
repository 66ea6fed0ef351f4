"""SwinIR stage-1 degradation remover (flax.linen, NHWC, TPU-first).

Parity target: reference ``diffusion/model/swinir.py:25-928`` with the
InstaRevive config (``configs/swinir.yaml``): 8x pixel-unshuffle input,
embed 180, 8 RSTB x 6 blocks, window 8, mlp_ratio 2, ``nearest+conv``
upsampler x8 — net 1x resolution (a cleaner, not an upscaler).

TPU design notes:
  * images stay NHWC; window partition is reshape/transpose (no gather),
    attention over 64-token windows runs as one large batched MXU matmul;
  * shifted windows use jnp.roll + a static additive mask computed at trace
    time (ops/window.py) — no data-dependent control flow under jit;
  * relative-position bias is gathered once per block per shape and folded
    into the attention bias.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.nn.layers import Mlp, trunc_normal_init, pixel_unshuffle
from instarevive_tpu.ops.attention import sdpa
from instarevive_tpu.ops import window as W
from instarevive_tpu.ops.resize import interpolate

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], dtype=np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swinir.py:76-174)."""

    dim: int
    window: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW*B, N, C); mask: (nW, N, N) static np array or None
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = W.relative_position_index(self.window)  # (N, N) static
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, N, N)

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[:, None]  # (nW, 1, N, N)
            bias = bias + jnp.tile(m, (b_ // nw, 1, 1, 1))

        out = sdpa(q, k, v, bias=bias, scale=hd**-0.5)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin transformer block on NHWC feature maps (swinir.py:175-310)."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shift = self.shift if min(h, w) > self.window else 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = W.cyclic_shift(x, shift)
            mask = W.shift_attn_mask(h, w, self.window, shift)
        else:
            mask = None
        xw = W.window_partition(x, self.window)
        xw = WindowAttention(self.dim, self.window, self.num_heads, self.dtype, name="attn")(
            xw, mask
        )
        x = W.window_reverse(xw, self.window, h, w)
        if shift > 0:
            x = W.cyclic_unshift(x, shift)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block group (swinir.py:311-417)."""

    dim: int
    depth: int
    num_heads: int
    window: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            x = SwinBlock(
                self.dim,
                self.num_heads,
                self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        return x + res


class SwinIR(nn.Module):
    """SwinIR for real-world SR / degradation removal (configs/swinir.yaml)."""

    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    window: int = 8
    mlp_ratio: float = 2.0
    sf: int = 8
    img_range: float = 1.0
    upsampler: str = "nearest+conv"
    unshuffle: bool = True
    unshuffle_scale: int = 8
    num_feat: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0, 1]; returns same-range output."""
        b, h0, w0, _ = x.shape
        us = self.unshuffle_scale if self.unshuffle else 1
        # net resolution factor relative to the input image
        net_scale = self.sf // us if self.unshuffle else self.sf

        x, _, _ = W.pad_to_multiple(x, self.window * us, mode="reflect")
        mean = jnp.asarray(_RGB_MEAN, dtype=x.dtype)
        x = (x - mean) * self.img_range

        if self.unshuffle:
            feat = pixel_unshuffle(x, us)
        else:
            feat = x
        feat = nn.Conv(self.embed_dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv_first")(feat)

        # deep features: LayerNorm -> RSTBs -> LayerNorm (+ conv residual)
        deep = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(feat)
        for i, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            deep = RSTB(
                self.embed_dim, d, nh, self.window, self.mlp_ratio, self.dtype, name=f"layers_{i}"
            )(deep)
        deep = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(deep)
        deep = nn.Conv(
            self.embed_dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv_after_body"
        )(deep)
        feat = feat + deep

        if self.upsampler == "nearest+conv":
            feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv_before_upsample")(feat)
            feat = nn.leaky_relu(feat, 0.01)  # torch nn.LeakyReLU default slope
            ups = {4: ("conv_up1", "conv_up2"), 8: ("conv_up1", "conv_up2", "conv_up3")}.get(
                self.sf, ("conv_up1",)
            )
            from instarevive_tpu.ops.conv_fused import fused_upsample_enabled

            for name in ups:
                if fused_upsample_enabled():
                    # one lhs-dilated conv == nearest-2x + conv3x3 (exact;
                    # identical param tree) — skips the 4x intermediate
                    from instarevive_tpu.models.vae import FusedUpsampleConv

                    feat = nn.leaky_relu(
                        FusedUpsampleConv(self.num_feat, self.dtype, name=name)(feat),
                        0.2,
                    )
                else:
                    feat = interpolate(feat, scale_factor=2, mode="nearest")
                    feat = nn.leaky_relu(
                        nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name=name)(feat),
                        0.2,
                    )
            feat = nn.leaky_relu(
                nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv_hr")(feat),
                0.2,
            )
            out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="conv_last")(feat)
        else:
            res = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="conv_last")(feat)
            out = x + res

        out = out / self.img_range + mean
        return out[:, : h0 * net_scale, : w0 * net_scale, :]
