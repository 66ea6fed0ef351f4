"""RRDBNet (Real-ESRGAN background upsampler) + tiled driver.

Parity targets: reference ``utils/realesrgan/rrdbnet.py`` (residual-in-
residual dense blocks, pixel-unshuffle for <4x scales) and
``utils/realesrgan/realesrganer.py:71-163`` (pre/mod padding + context-
padded non-overlap tile processing). The tile loop is a lax.scan — fully
on-device, like the restoration pipeline's.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.nn.layers import pixel_unshuffle
from instarevive_tpu.ops.resize import interpolate


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            h = nn.Conv(self.num_grow, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i+1}")(
                jnp.concatenate(feats, axis=-1)
            )
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        out = nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv5")(
            jnp.concatenate(feats, axis=-1)
        )
        return x + 0.2 * out


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.num_feat, self.num_grow, self.dtype, name="rdb1")(x)
        h = ResidualDenseBlock(self.num_feat, self.num_grow, self.dtype, name="rdb2")(h)
        h = ResidualDenseBlock(self.num_feat, self.num_grow, self.dtype, name="rdb3")(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    """rrdbnet.py:131-182; scale in {1,2,4}: <4x uses pixel-unshuffle input."""

    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow, self.dtype, name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv_body")(body)
        feat = feat + body
        for name in ("conv_up1", "conv_up2"):
            feat = interpolate(feat, scale_factor=2, mode="nearest")
            feat = nn.leaky_relu(
                nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name=name)(feat), 0.2
            )
        feat = nn.leaky_relu(
            nn.Conv(self.num_feat, (3, 3), padding="SAME", dtype=self.dtype, name="conv_hr")(feat), 0.2
        )
        return nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="conv_last")(feat)


def tile_process(
    model_apply,
    img: jnp.ndarray,
    scale: int,
    tile_size: int = 400,
    tile_pad: int = 10,
) -> jnp.ndarray:
    """Context-padded non-overlap tiling (realesrganer.py:100-163) as one
    lax.scan; img NHWC, output upscaled by ``scale``."""
    b, h, w, c = img.shape
    th = -(-h // tile_size)
    tw = -(-w // tile_size)
    padded = jnp.pad(
        img, ((0, 0), (tile_pad, tile_pad + th * tile_size - h),
              (tile_pad, tile_pad + tw * tile_size - w), (0, 0)), mode="reflect"
    )
    ext = tile_size + 2 * tile_pad
    out = jnp.zeros((b, th * tile_size * scale, tw * tile_size * scale, 3), img.dtype)

    offsets = jnp.asarray(
        [(i * tile_size, j * tile_size) for i in range(th) for j in range(tw)], dtype=jnp.int32
    )

    def body(acc, off):
        y, x = off[0], off[1]
        tile = jax.lax.dynamic_slice(padded, (0, y, x, 0), (b, ext, ext, c))
        up = model_apply(tile)
        inner = jax.lax.dynamic_slice(
            up, (0, tile_pad * scale, tile_pad * scale, 0),
            (b, tile_size * scale, tile_size * scale, 3),
        )
        acc = jax.lax.dynamic_update_slice(acc, inner, (0, y * scale, x * scale, 0))
        return acc, None

    out, _ = jax.lax.scan(body, out, offsets)
    return out[:, : h * scale, : w * scale]
