"""AutoencoderKL (SD VAE, sd-vae-ft-ema) in flax.linen, NHWC.

Parity target: reference ``ldm/models/autoencoder.py:13-219`` +
``ldm/modules/diffusionmodules/model.py:52-855`` (CompVis Encoder/Decoder),
which is weight-compatible with diffusers ``AutoencoderKL`` used by the
shipped CLI (``test_scripts/inference.py:236``). Config is the SD default:
ch 128, ch_mult (1,2,4,4), 2 res blocks, mid attention only, z_channels 4,
scale factor 0.18215.

TPU notes: convs run NHWC (HWIO kernels); the single mid attention block
reuses ``ops.attention.sdpa`` over HW tokens; GroupNorm eps 1e-6 matches
torch.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from instarevive_tpu.ops.attention import attention
from instarevive_tpu.ops.conv_fused import fused_upsample_enabled, upsample2x_conv3x3
from instarevive_tpu.ops.gn_conv import gn_conv_enabled, gn_silu_conv3x3
from instarevive_tpu.ops.int8_conv import (
    conv2d_int8,
    int8_decode_enabled,
    int8_upsample_enabled,
)
from instarevive_tpu.ops.resize import interpolate


def _gn(name: str, dtype=None):
    # dtype: output/compute dtype; flax computes the statistics in f32
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class _GNParams(nn.Module):
    """nn.GroupNorm's param tree (scale/bias, same init) without its
    compute — the fused GN+conv kernel consumes the raw params."""

    feats: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.feats,)),
            self.param("bias", nn.initializers.zeros, (self.feats,)),
        )


class _ConvParams(nn.Module):
    """nn.Conv's 3x3 param tree (kernel/bias, same init), compute-free."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), (3, 3, self.cin, self.cout)),
            self.param("bias", nn.initializers.zeros, (self.cout,)),
        )


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32
    # decoder-only int8 experiment hook (ops/int8_conv.py): the Decoder
    # sets this True so IR_INT8_DECODE never touches the encoder
    int8_ok: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if self.int8_ok and int8_decode_enabled():
            h = _gn("norm1", self.dtype)(x)
            h = nn.silu(h)
            k1, cb1 = _ConvParams(cin, self.out_ch, name="conv1")()
            h = conv2d_int8(h, k1, cb1, out_dtype=self.dtype)
            h = _gn("norm2", self.dtype)(h)
            h = nn.silu(h)
            k2, cb2 = _ConvParams(self.out_ch, self.out_ch, name="conv2")()
            h = conv2d_int8(h, k2, cb2, out_dtype=self.dtype)
            if x.shape[-1] != self.out_ch:
                x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
            return x + h
        fused = (
            gn_conv_enabled()
            and cin % 128 == 0
            and self.out_ch % 128 == 0
            and x.shape[1] >= 4
        )
        if fused:
            # GN+SiLU+conv as ONE Pallas kernel (ops/gn_conv.py): the
            # normalized tensor never round-trips HBM. Param tree is
            # identical to the unfused path — checkpoints interchange.
            g1, b1 = _GNParams(cin, name="norm1")()
            k1, cb1 = _ConvParams(cin, self.out_ch, name="conv1")()
            h = gn_silu_conv3x3(x, g1, b1, k1, cb1)
            g2, b2 = _GNParams(self.out_ch, name="norm2")()
            k2, cb2 = _ConvParams(self.out_ch, self.out_ch, name="conv2")()
            h = gn_silu_conv3x3(h, g2, b2, k2, cb2)
        else:
            h = _gn("norm1", self.dtype)(x)
            h = nn.silu(h)
            h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
            h = _gn("norm2", self.dtype)(h)
            h = nn.silu(h)
            h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over spatial tokens (model.py:AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, 1, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, 1, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, 1, h * w, c)
        # N grows with input size (4096 tokens at 512^2 inputs): the flash
        # kernel avoids materializing the N x N scores in HBM
        out = attention(q, k, v, scale=c**-0.5).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class FusedUpsampleConv(nn.Module):
    """nearest-2x upsample + 3x3 SAME conv as one lhs-dilated conv
    (ops/conv_fused.py); param names match nn.Conv so checkpoints are
    interchangeable with the unfused path."""

    features: int
    dtype: jnp.dtype = jnp.float32
    # decoder-only int8 hook (see ResnetBlock.int8_ok); SwinIR's upsampler
    # reuses this module and stays bf16
    int8_ok: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.int8_ok and int8_upsample_enabled():
            # measured NEGATIVE (BENCH.md r5): quantizing the lhs-dilated
            # upsample convs on top of IR_INT8_DECODE gained nothing
            # (6.31 vs 6.34 MP/s, noise) and cost decode PSNR — kept as a
            # separately-gated experiment, default off
            from instarevive_tpu.ops.int8_conv import upsample2x_conv3x3_int8

            return upsample2x_conv3x3_int8(x, k, b, out_dtype=self.dtype)
        return upsample2x_conv3x3(
            x.astype(self.dtype), k.astype(self.dtype), b.astype(self.dtype)
        )


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, self.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                # CompVis Downsample: asymmetric (0,1,0,1) pad + stride-2 VALID conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_{i}_downsample",
                )(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, self.dtype, int8_ok=True, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, int8_ok=True, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i], self.dtype, int8_ok=True,
                                name=f"up_{i}_block_{j}")(h)
            if i != 0:
                if fused_upsample_enabled():
                    # one lhs-dilated conv instead of materializing the 4x
                    # intermediate (ops/conv_fused.py; exact equivalence,
                    # identical param tree to the nn.Conv path)
                    h = FusedUpsampleConv(
                        h.shape[-1], self.dtype, int8_ok=True,
                        name=f"up_{i}_upsample",
                    )(h)
                else:
                    h = interpolate(h, scale_factor=2, mode="nearest")
                    h = nn.Conv(
                        h.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up_{i}_upsample",
                    )(h)
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder; encode -> (mean, logvar), decode latent -> image."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.ch, self.ch_mult, self.num_res_blocks, self.z_channels, True, self.dtype
        )
        self.decoder = Decoder(self.ch, self.ch_mult, self.num_res_blocks, 3, self.dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x) -> jnp.ndarray:
        """latent_dist.mode(): the mean — what the restoration CLI uses
        (test_scripts/inference.py:106-109)."""
        return self.encode(x)[0]

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar
