"""SD2.1 UNet + DiffBIR-style ControlNet (flax.linen, NHWC, TPU-first).

Parity targets:
  * ``ldm/modules/diffusionmodules/openaimodel.py:31-786`` (UNetModel with
    SpatialTransformer cross-attention, the cldm.yaml config: model_channels
    320, channel_mult (1,2,4,4), 2 res blocks, attention at ds 1/2/4,
    num_head_channels 64, linear proj, transformer_depth 1, context 1024),
  * ``ldm/modules/attention.py:49-350`` (BasicTransformerBlock: self-attn,
    cross-attn, GEGLU feed-forward),
  * ``diffusion/cldm.py:32-293`` (ControlNet: encoder copy over
    concat(x, hint) with per-block zero convs; ControlledUnetModel adds the
    control residuals on skips with frozen encoder).

TPU notes: convs NHWC; attention uses ops.attention.sdpa (fp32 softmax) —
at 64x64 latents the largest self-attention is 4096 tokens at ds=1 which
dispatches to the Pallas flash kernel via ops.attention.attention.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from instarevive_tpu.nn.layers import timestep_embedding
from instarevive_tpu.ops.attention import attention
from instarevive_tpu.ops.resize import interpolate


def _gn(name, dtype=None):
    # flax computes norm statistics in f32; output stays in `dtype`
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)


class ResBlock(nn.Module):
    """openaimodel.py ResBlock (no scale-shift-norm, zero-init out conv)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = _gn("in_norm", self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = _gn("out_norm", self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class BasicTransformerBlock(nn.Module):
    """attention.py BasicTransformerBlock: self-attn, cross-attn, GEGLU FF."""

    dim: int
    num_heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, ctx, prefix):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{prefix}_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{prefix}_k")(ctx)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{prefix}_v")(ctx)

        def heads(t):
            return jnp.transpose(t.reshape(b, -1, h, hd), (0, 2, 1, 3))

        out = attention(heads(q), heads(k), heads(v), scale=hd**-0.5)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name=f"{prefix}_out")(out)

    @nn.compact
    def __call__(self, x, context):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + self._attn(y, y, "attn1")
        x = x + self._attn(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context, "attn2")
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        # GEGLU: proj to 2*4c, split, gelu-gate
        inner = self.dim * 4
        g = nn.Dense(inner * 2, dtype=self.dtype, name="ff_proj")(y)
        a, gate = jnp.split(g, 2, axis=-1)
        y = a * nn.gelu(gate, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(y)


class SpatialTransformer(nn.Module):
    """attention.py SpatialTransformer with linear proj (cldm.yaml)."""

    num_heads: int
    context_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        y = _gn("norm", self.dtype)(x).reshape(b, h * w, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                c, self.num_heads, self.context_dim, self.dtype, name=f"block_{i}"
            )(y, context)
        y = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out")(y)
        return res + y.reshape(b, h, w, c)


def _zero_conv(ch, dtype, name):
    return nn.Conv(ch, (1, 1), kernel_init=nn.initializers.zeros, dtype=dtype, name=name)


class UNetBackbone(nn.Module):
    """Shared encoder/middle/decoder topology for UNetModel + ControlNet."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (1, 2, 4)  # cldm.yaml attention_resolutions
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    context_dim: int = 1024
    transformer_depth: int = 1
    is_controlnet: bool = False
    use_checkpoint: bool = False  # activation rematerialization per block
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, control: Optional[list] = None,
                 only_mid_control: bool = False):
        """x NHWC (+hint pre-concatenated for controlnet); returns output
        NHWC (UNet) or the list of zero-conv'd control residuals."""
        mc = self.model_channels
        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        res_cls = nn.remat(ResBlock) if self.use_checkpoint else ResBlock
        st_cls = nn.remat(SpatialTransformer) if self.use_checkpoint else SpatialTransformer

        def st(ch, name):
            return st_cls(
                ch // self.num_head_channels, self.context_dim,
                self.transformer_depth, self.dtype, name=name,
            )

        outs = []
        hs = []
        h = nn.Conv(mc, (3, 3), padding="SAME", dtype=self.dtype, name="input_conv")(x)
        hs.append(h)
        if self.is_controlnet:
            outs.append(_zero_conv(mc, self.dtype, "zero_conv_0")(h))

        ds = 1
        zi = 1
        block_i = 1
        for level, mult in enumerate(self.channel_mult):
            ch = mc * mult
            for j in range(self.num_res_blocks):
                h = res_cls(ch, self.dtype, name=f"in_{block_i}_res")(h, emb)
                if ds in self.attention_ds:
                    h = st(ch, f"in_{block_i}_st")(h, context)
                hs.append(h)
                if self.is_controlnet:
                    outs.append(_zero_conv(ch, self.dtype, f"zero_conv_{zi}")(h))
                zi += 1
                block_i += 1
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"down_{level}",
                )(h)
                ds *= 2
                hs.append(h)
                if self.is_controlnet:
                    outs.append(_zero_conv(ch, self.dtype, f"zero_conv_{zi}")(h))
                zi += 1
                block_i += 1

        h = res_cls(ch, self.dtype, name="mid_res1")(h, emb)
        h = st(ch, "mid_st")(h, context)
        h = res_cls(ch, self.dtype, name="mid_res2")(h, emb)
        if self.is_controlnet:
            outs.append(_zero_conv(ch, self.dtype, "zero_conv_mid")(h))
            return outs

        control = list(control) if control is not None else None
        if control is not None:
            h = h + control.pop()

        block_i = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = mc * mult
            for j in range(self.num_res_blocks + 1):
                skip = hs.pop()
                if control is not None and not only_mid_control:
                    skip = skip + control.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res_cls(ch, self.dtype, name=f"out_{block_i}_res")(h, emb)
                if ds in self.attention_ds:
                    h = st(ch, f"out_{block_i}_st")(h, context)
                if level and j == self.num_res_blocks:
                    h = interpolate(h, scale_factor=2, mode="nearest")
                    h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"up_{level}")(h)
                    ds //= 2
                block_i += 1

        h = _gn("out_norm", self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="out_conv",
        )(h)


class UNetModel(UNetBackbone):
    """SD UNet (openaimodel.py:412) — alias with is_controlnet=False."""


class ControlNet(nn.Module):
    """DiffBIR ControlNet (cldm.py:59-293): encoder copy over concat(x, hint)
    emitting zero-conv residuals for every input block + middle."""

    backbone: UNetBackbone = None

    @nn.compact
    def __call__(self, x, hint, timesteps, context):
        bb = self.backbone or UNetBackbone(is_controlnet=True)
        xh = jnp.concatenate([x, hint], axis=-1)
        return bb(xh, timesteps, context)


def controlled_unet_apply(unet, unet_params, cn, cn_params, x, hint, t, context,
                          only_mid_control: bool = False):
    """ControlledUnetModel.forward (cldm.py:33-56): run ControlNet, then the
    UNet with control residuals added to middle + skips."""
    control = cn.apply({"params": cn_params}, x, hint, t, context)
    return unet.apply(
        {"params": unet_params}, x, t, context, control=control,
        only_mid_control=only_mid_control,
    )
