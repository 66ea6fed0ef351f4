"""Shared neural-net building blocks (flax.linen, NHWC).

Covers the reference's common blocks: timm ``Mlp``/``DropPath`` (used by
SwinIR and PixArt), torch ``PixelShuffle``/``PixelUnshuffle`` (SwinIR 8x
unshuffle input stage), and the ADM sinusoidal timestep embedding
(``diffusion/model/nets/PixArt_blocks.py:TimestepEmbedder``,
``ldm/modules/diffusionmodules/util.py:timestep_embedding``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with tanh approximation (torch nn.GELU(approximate='tanh'))."""
    return nn.gelu(x, approximate=True)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> fc2."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_tanh
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample; identity when deterministic."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-unshuffle matching torch channel ordering (c*r^2 + i*r + j)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # (B, H/r, W/r, C, r, r)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-shuffle matching torch channel ordering."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # (B, H, r, W, r, Co)
    return x.reshape(b, h * r, w * r, co)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """ADM sinusoidal embedding: (N,) -> (N, dim), cos|sin halves."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_(std) equivalent initializer."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init
