"""Packed batch-in-channels VAE decode: N images as ONE N=1 conv program.

Why: XLA picks pathological layouts for N>1 512² convs on TPU (BENCH.md
"batch>1 regression": 4.6x slower per image; convert/copy storms in the
trace). Round 1's workaround is a per-sample ``lax.map`` (exact but
serial). This module packs the batch into the CHANNEL axis instead:

    (N, H, W, C)  ->  (1, H, W, N*C)

and runs every conv as a grouped conv (``feature_group_count=N``) with the
kernel tiled along output channels — mathematically EXACT (group g only
sees image g's channels, FLOPs identical) while presenting XLA a single
N=1 program with fatter channel tiles (better lane utilization, no N>1
layout pathology). GroupNorm becomes 32*N groups over the packed axis;
the mid attention unpacks to per-image heads for the flash kernel.

Functional (params passed explicitly) mirror of models/vae.py Decoder —
kept in lockstep; parity is enforced by tests/test_packed_vae.py against
the flax module at f32 and bf16.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.attention import attention
from instarevive_tpu.ops.conv_fused import fused_upsample_enabled, upsample2x_conv3x3


def _conv(x, p, n, dtype, stride=1, padding="SAME"):
    """Grouped conv over packed channels; p = {'kernel': HWIO, 'bias'}."""
    k = jnp.tile(p["kernel"].astype(dtype), (1, 1, 1, n))
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), k, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=n,
    )
    return out + jnp.tile(p["bias"].astype(dtype), (n,))


def _gn(x, p, n, dtype, eps=1e-6):
    """GroupNorm(32) per packed image: 32*n groups; stats in f32 like
    flax.linen.GroupNorm."""
    b, h, w, nc = x.shape
    c = nc // n
    g = 32 * n
    xf = x.astype(jnp.float32).reshape(b, h, w, g, nc // g)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) / jnp.sqrt(var + eps)
    xf = xf.reshape(b, h, w, nc)
    scale = jnp.tile(p["scale"].astype(jnp.float32), (n,))
    bias = jnp.tile(p["bias"].astype(jnp.float32), (n,))
    return (xf * scale + bias).astype(dtype)


def _resblock(x, p, n, dtype, out_ch, in_ch):
    h = jax.nn.silu(_gn(x, p["norm1"], n, dtype))
    h = _conv(h, p["conv1"], n, dtype)
    h = jax.nn.silu(_gn(h, p["norm2"], n, dtype))
    h = _conv(h, p["conv2"], n, dtype)
    if in_ch != out_ch:
        x = _conv(x, p["nin_shortcut"], n, dtype)
    return x + h


def _attnblock(x, p, n, dtype):
    b, hh, ww, nc = x.shape
    c = nc // n
    y = _gn(x, p["norm"], n, dtype)
    q = _conv(y, p["q"], n, dtype)
    k = _conv(y, p["k"], n, dtype)
    v = _conv(y, p["v"], n, dtype)

    def unpack(t):  # (1, H, W, N*C) -> (N, 1, H*W, C)
        return t.reshape(hh * ww, n, c).transpose(1, 0, 2)[:, None]

    out = attention(unpack(q), unpack(k), unpack(v), scale=c**-0.5)
    out = out[:, 0].transpose(1, 0, 2).reshape(1, hh, ww, nc)
    out = _conv(out, p["proj_out"], n, dtype)
    return x + out


def encode_mode_packed(
    vae_params: Dict[str, Any],
    x: jnp.ndarray,
    *,
    ch: int = 128,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    z_channels: int = 4,
    embed_dim: int = 4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """models/vae.py AutoencoderKL.encode_mode (posterior mean) packed.

    x: (N, H, W, 3) in [-1, 1]. Returns (N, h, w, embed_dim) UN-scaled.
    """
    n, hh, ww, cin = x.shape
    h = x.transpose(1, 2, 0, 3).reshape(1, hh, ww, n * cin)
    p = vae_params["encoder"]
    h = _conv(h, p["conv_in"], n, dtype)
    cur = ch
    for i, mult in enumerate(ch_mult):
        out_ch = ch * mult
        for j in range(num_res_blocks):
            h = _resblock(h, p[f"down_{i}_block_{j}"], n, dtype, out_ch, cur)
            cur = out_ch
        if i != len(ch_mult) - 1:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(h, p[f"down_{i}_downsample"], n, dtype, stride=2,
                      padding="VALID")
    h = _resblock(h, p["mid_block_1"], n, dtype, cur, cur)
    h = _attnblock(h, p["mid_attn_1"], n, dtype)
    h = _resblock(h, p["mid_block_2"], n, dtype, cur, cur)
    h = jax.nn.silu(_gn(h, p["norm_out"], n, dtype))
    h = _conv(h, p["conv_out"], n, dtype)  # -> 2*z_channels per image
    h = _conv(h, vae_params["quant_conv"], n, dtype)  # -> 2*embed_dim
    oh, ow = h.shape[1], h.shape[2]
    moments = h.reshape(oh, ow, n, 2 * embed_dim).transpose(2, 0, 1, 3)
    return moments[..., :embed_dim]  # posterior mean (mode)


def decode_packed(
    vae_params: Dict[str, Any],
    z: jnp.ndarray,
    *,
    ch: int = 128,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """models/vae.py AutoencoderKL.decode on a packed batch.

    vae_params: the 'vae' param subtree (post_quant_conv + decoder).
    z: (N, h, w, zc) scaled-OFF latent (caller divides by VAE_SCALE).
    Returns (N, H, W, 3) in the decoder's native [-1, 1]-ish range.
    """
    n, h, w, zc = z.shape
    x = z.transpose(1, 2, 0, 3).reshape(1, h, w, n * zc)
    x = _conv(x, vae_params["post_quant_conv"], n, dtype)
    p = vae_params["decoder"]

    block_in = ch * ch_mult[-1]
    x = _conv(x, p["conv_in"], n, dtype)
    x = _resblock(x, p["mid_block_1"], n, dtype, block_in, block_in)
    x = _attnblock(x, p["mid_attn_1"], n, dtype)
    x = _resblock(x, p["mid_block_2"], n, dtype, block_in, block_in)
    cur = block_in
    for i in reversed(range(len(ch_mult))):
        out_ch = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            x = _resblock(x, p[f"up_{i}_block_{j}"], n, dtype, out_ch, cur)
            cur = out_ch
        if i != 0:
            up = p[f"up_{i}_upsample"]
            if fused_upsample_enabled():
                x = upsample2x_conv3x3(
                    x.astype(dtype), jnp.tile(up["kernel"].astype(dtype), (1, 1, 1, n)),
                    jnp.tile(up["bias"].astype(dtype), (n,)), groups=n,
                )
            else:
                from instarevive_tpu.ops.resize import interpolate

                x = interpolate(x, scale_factor=2, mode="nearest")
                x = _conv(x, up, n, dtype)
    x = jax.nn.silu(_gn(x, p["norm_out"], n, dtype))
    x = _conv(x, p["conv_out"], n, dtype)
    hh, ww = x.shape[1], x.shape[2]
    return x.reshape(hh, ww, n, 3).transpose(2, 0, 1, 3)
