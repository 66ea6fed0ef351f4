"""OpenAI CLIP RN50 — the ModifiedResNet image tower + text transformer.

pyiqa's ``clipiqa`` metric (reference ``evaluate_img.py:17``) runs CLIP
**RN50**, not a ViT: a modified ResNet-50 (3-conv stem, avg-pool
anti-aliased downsampling, attention-pool head) paired with the 512-wide
12-layer text transformer (QuickGELU, causal mask, EOT-argmax pooling).
HF ships no Flax RN50, so this is a native NHWC implementation; weights
import from the OpenAI ``RN50`` state dict via
``convert.torch_import.clip_rn50_params_from_torch`` (BatchNorms folded
into conv scale/bias — eval-mode inference only, the IQA use case).

Architecture source: the openai/CLIP ``model.py`` layout (Bottleneck,
AttentionPool2d, ModifiedResNet, Transformer), reproduced from the paper
and the public checkpoint key schema — not a code translation: NHWC convs,
folded BN, one fused attention per block, jitted end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBottleneck(nn.Module):
    """RN50 bottleneck: all downsampling is a stride-1 conv followed by an
    avg-pool (anti-aliasing), unlike torchvision's strided conv. BN is
    folded into the convs at import (bias carries beta - mean*scale)."""

    planes: int  # bottleneck width; block output is 4x this
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        y = jax.nn.relu(nn.Conv(self.planes, (1, 1), name="conv1")(x))
        y = jax.nn.relu(
            nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        )
        if self.stride > 1:
            s = (self.stride, self.stride)
            y = nn.avg_pool(y, s, strides=s)
        y = nn.Conv(out_ch, (1, 1), name="conv3")(y)
        shortcut = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                s = (self.stride, self.stride)
                shortcut = nn.avg_pool(shortcut, s, strides=s)
            shortcut = nn.Conv(out_ch, (1, 1), name="downsample")(shortcut)
        return jax.nn.relu(y + shortcut)


class AttentionPool(nn.Module):
    """AttentionPool2d: mean token prepended, learned 2D position embedding,
    one cross-attention step (query = the mean token) projecting to the
    joint embedding dim."""

    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda k: jax.random.normal(k, (h * w + 1, c)) / c**0.5,
        )
        tokens = tokens + pos[None]
        q = nn.Dense(c, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, name="k_proj")(tokens)
        v = nn.Dense(c, name="v_proj")(tokens)
        hd = c // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, name="c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP's image tower: 3-conv stem (s2 conv + 2 convs + avg-pool 2),
    four bottleneck stages, attention-pool head. RN50: layers (3,4,6,3),
    width 64, heads 32, output 1024."""

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    width: int = 64

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) CLIP-normalized
        w = self.width
        x = jax.nn.relu(
            nn.Conv(w // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="conv1")(x))
        x = jax.nn.relu(
            nn.Conv(w // 2, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(x))
        x = jax.nn.relu(
            nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for si, depth in enumerate(self.layers):
            planes = w * (2**si)
            for bi in range(depth):
                x = CLIPBottleneck(
                    planes, stride=(2 if si > 0 and bi == 0 else 1),
                    name=f"layer{si + 1}_block{bi}",
                )(x)
        return AttentionPool(self.heads, self.output_dim, name="attnpool")(x)


class CLIPTextBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, mask):  # (B, T, C), additive mask (T, T)
        b, t, c = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * c, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        q = q.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + mask
        out = (jax.nn.softmax(logits, axis=-1) @ v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(c, name="out_proj")(out.reshape(b, t, c))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * c, name="c_fc")(h)
        return x + nn.Dense(c, name="c_proj")(_quick_gelu(h))


class CLIPTextTower(nn.Module):
    """OpenAI CLIP text transformer: causal mask, QuickGELU MLPs, final LN,
    EOT-token (argmax of ids — EOT is the max vocab id) projection."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 1024

    @nn.compact
    def __call__(self, input_ids):  # (B, T) int32
        b, t = input_ids.shape
        tok = self.param(
            "token_embedding",
            lambda k: jax.random.normal(k, (self.vocab_size, self.width)) * 0.02,
        )
        pos = self.param(
            "positional_embedding",
            lambda k: jax.random.normal(k, (self.context_length, self.width)) * 0.01,
        )
        x = tok[input_ids] + pos[None, :t]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
        for i in range(self.layers):
            x = CLIPTextBlock(self.heads, name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param(
            "text_projection",
            lambda k: jax.random.normal(k, (self.width, self.embed_dim))
            * self.width**-0.5,
        )
        eot = jnp.argmax(input_ids, axis=-1)
        return x[jnp.arange(b), eot] @ proj


@dataclass
class _VisionCfg:
    image_size: int = 224


@dataclass
class _Cfg:
    vision_config: _VisionCfg


class OpenAICLIP:
    """Host-side wrapper exposing the HF-CLIP surface ``utils.clipiqa.CLIPIQA``
    consumes (get_image_features / get_text_features / params['logit_scale'] /
    config.vision_config.image_size) over the native RN50 towers."""

    def __init__(self, visual_params, text_params, logit_scale: float,
                 visual: Optional[ModifiedResNet] = None,
                 text: Optional[CLIPTextTower] = None, image_size: int = 224):
        self.visual = visual or ModifiedResNet()
        self.text = text or CLIPTextTower()
        self.visual_params = visual_params
        self.text_params = text_params
        self.params = {"logit_scale": np.asarray(logit_scale, np.float32)}
        self.config = _Cfg(vision_config=_VisionCfg(image_size=image_size))
        self._image_jit = jax.jit(
            lambda p, x: self.visual.apply({"params": p}, x))
        self._text_jit = jax.jit(
            lambda p, ids: self.text.apply({"params": p}, ids))

    @classmethod
    def from_torch(cls, path: str, **kw):
        """Load an OpenAI CLIP RN50 state dict (.pt/.pth; plain or the
        TorchScript archive's state_dict) — zero-egress: the file must be
        local."""
        import torch

        from instarevive_tpu.convert.torch_import import (
            clip_rn50_params_from_torch,
        )

        try:
            sd = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            obj = torch.jit.load(path, map_location="cpu")
            sd = obj.state_dict()
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        vis, txt, scale, meta = clip_rn50_params_from_torch(sd)
        visual = ModifiedResNet(layers=meta["layers"], output_dim=meta["embed_dim"],
                                heads=meta["vision_heads"], width=meta["vision_width"])
        text = CLIPTextTower(width=meta["text_width"], layers=meta["text_layers"],
                             heads=meta["text_heads"], vocab_size=meta["vocab_size"],
                             context_length=meta["context_length"],
                             embed_dim=meta["embed_dim"])
        return cls(vis, txt, scale, visual=visual, text=text,
                   image_size=meta["image_size"], **kw)

    # HF-compatible surface --------------------------------------------------
    def get_image_features(self, pixel_values):
        """pixel_values: (B, 3, H, W) CLIP-normalized (the HF convention the
        CLIPIQA preprocess emits) -> (B, embed_dim)."""
        x = jnp.transpose(jnp.asarray(pixel_values, jnp.float32), (0, 2, 3, 1))
        return self._image_jit(self.visual_params, x)

    def get_text_features(self, input_ids, attention_mask=None):
        """attention_mask is accepted for surface parity and ignored: the
        causal mask + EOT-argmax pooling make right-padding inert (HF CLIP
        tokenizers pad with the EOT token, and argmax picks the first)."""
        ids = jnp.asarray(np.asarray(input_ids), jnp.int32)
        return self._text_jit(self.text_params, ids)
