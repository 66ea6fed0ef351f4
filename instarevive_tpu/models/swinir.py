"""SwinIR stage-1 degradation remover (flax.linen, NHWC, TPU-first).

Parity target: reference ``diffusion/model/swinir.py:25-928`` with the
InstaRevive config (``configs/swinir.yaml``): 8x pixel-unshuffle input,
embed 180, 8 RSTB x 6 blocks, window 8, mlp_ratio 2, ``nearest+conv``
upsampler x8 — net 1x resolution (a cleaner, not an upscaler).

TPU design notes:
  * images stay NHWC; tokens are WINDOW-RESIDENT across each RSTB: the
    6D-transpose window partition/reverse happens ONCE per group, not per
    block (the per-block layout copies were ~50% of the stage's device
    time, BENCH.md round-3 trace);
  * shifted windows never leave window layout — the cyclic roll-in/out is
    two static token-permutation gathers (ops/window.py
    shift_window_perm) + a static additive mask computed at trace time;
    no data-dependent control flow under jit;
  * attention runs straight from the fused qkv lanes via dot_general
    batch dims ((B*nW, N, heads, hd) without head-split transposes), and
    the head merge is folded into the proj matmul — zero pure layout ops
    on the hot path;
  * relative-position bias is gathered lane-wise as (heads, N, N) (no
    (N, N, heads) transpose).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.nn.layers import Mlp, trunc_normal_init, pixel_unshuffle
from instarevive_tpu.ops import window as W
from instarevive_tpu.ops.resize import interpolate

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], dtype=np.float32)


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree (kernel/bias, same init), for
    matmuls whose dimension numbers nn.Dense can't express."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return k, b


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swinir.py:76-174).

    Operates on windowed tokens (B*nW, N, C). Matches ``ops.attention.sdpa``
    numerics (f32 scores/softmax/PV) but is expressed transpose-free: q/k/v
    stay (B_, N, heads, hd) lane slices of the fused qkv projection
    (dot_general batch dims do the head bookkeeping), and the (heads, hd)
    -> C merge is folded into the proj matmul's contraction."""

    dim: int
    window: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, batch: int = 1):
        # x: (B*nW, N, C); mask: (nW, N, N) static np array or None
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        # lane slices == reshape(b_, n, 3, h, hd) then index axis 2
        q = qkv[..., :c].reshape(b_, n, h, hd)
        k = qkv[..., c : 2 * c].reshape(b_, n, h, hd)
        v = qkv[..., 2 * c :].reshape(b_, n, h, hd)

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = W.relative_position_index(self.window)  # (N, N) static
        # (heads, N, N) gathered lane-wise — no (N, N, heads) transpose
        bias = jnp.take(table.T, jnp.asarray(idx.reshape(-1)), axis=1)
        bias = bias.reshape(h, n, n).astype(jnp.float32)

        scores = jax.lax.dot_general(
            q, k, (((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # (B_, heads, N, N)
        scores = scores * (hd**-0.5) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)  # (nW, N, N)
            scores = scores.reshape(batch, nw, h, n, n) + m[None, :, None]
            scores = scores.reshape(b_, h, n, n)
        probs = jax.nn.softmax(scores, axis=-1)  # f32, as sdpa
        out = jax.lax.dot_general(
            probs, v.astype(jnp.float32),
            (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # (B_, heads, N, hd)

        wk, wb = _DenseParams(c, c, name="proj")()
        # proj consumes (heads, hd) directly: out @ wk.reshape(h, hd, c)
        y = jax.lax.dot_general(
            out.astype(self.dtype),
            wk.reshape(h, hd, c).astype(self.dtype),
            (((1, 3), (0, 1)), ((), ())),
        )  # (B_, N, C)
        return y + wb.astype(self.dtype)


class SwinBlock(nn.Module):
    """Swin transformer block on window-resident tokens (swinir.py:175-310).

    Input/output: (B, H*W, C) in window layout (window-major, row-major
    within each window). LayerNorm/attention/MLP are per-token, so only
    the shifted blocks touch layout — via two static permutation gathers."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, t, c = x.shape
        n = self.window * self.window
        nw = t // n
        shift = self.shift if min(h, w) > self.window else 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            perm, inv = W.shift_window_perm(h, w, self.window, shift)
            x = jnp.take(x, jnp.asarray(perm), axis=1)
            mask = W.shift_attn_mask(h, w, self.window, shift)
        else:
            mask = None
        xw = WindowAttention(
            self.dim, self.window, self.num_heads, self.dtype, name="attn"
        )(x.reshape(b * nw, n, c), mask, batch=b)
        x = xw.reshape(b, t, c)
        if shift > 0:
            x = jnp.take(x, jnp.asarray(inv), axis=1)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block group (swinir.py:311-417).

    Partitions into window layout ONCE, runs the whole block stack there,
    and reverses once for the trailing conv — the per-block 6D transposes
    of the naive lowering disappear."""

    dim: int
    depth: int
    num_heads: int
    window: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        n = self.window * self.window
        xw = W.window_partition(x, self.window).reshape(b, h * w, c)
        for i in range(self.depth):
            xw = SwinBlock(
                self.dim,
                self.num_heads,
                self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(xw, h, w)
        x = W.window_reverse(xw.reshape(b * (h * w) // n, n, c), self.window, h, w)
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
