"""MiDaS DPT monocular depth estimation in flax.linen, NHWC, TPU-first.

Parity target: reference ``ldm/modules/midas/`` — ``midas/dpt_depth.py:26-108``
(DPT + DPTDepthModel), ``midas/blocks.py:49-341`` (scratch convs,
ResidualConvUnit_custom, FeatureFusionBlock_custom), ``midas/vit.py:56-491``
(timm ViT backbones + readout/reassemble postprocess), ``api.py:73-169``
(model factory + MiDaSInference). The reference instantiates its backbones
via ``timm.create_model`` (vit.py:298,481); here the ViT (and, for
dpt_hybrid, the timm ResNetV2 stem/stages with TF-"SAME" weight-standardized
convs) are native flax modules.

TPU-first choices:
- the /16 patch embed is space-to-depth + one matmul (MXU) instead of a
  16x16 conv;
- the non-overlapping ConvTranspose2d reassemble upsamples (k=s=4, k=s=2,
  vit.py:216-248) are a dense projection + depth-to-space reshape — exactly
  equivalent, and a single MXU matmul instead of a scatter-style transposed
  conv;
- ViT attention routes through ``ops.attention.attention`` (Pallas flash on
  TPU for long grids, XLA otherwise);
- fusion upsamples use the shared ``ops.resize.interpolate`` with
  ``align_corners=True`` (blocks.py:335-337).

Weight import: ``convert.torch_import.dpt_params_from_torch`` consumes the
reference DPTDepthModel state_dict (ISL midas checkpoints); timm's runtime
weight standardization (StdConv2dSame, eps 1e-8) is folded into the stored
kernels at import, like the BiT/MUSIQ importer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.ops.attention import attention
from instarevive_tpu.ops.resize import interpolate


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ------------------------------------------------------------------ ViT ---


class ViTBlock(nn.Module):
    """timm VisionTransformer block (pre-LN, fused qkv, exact GELU)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        b, n, d = x.shape
        h = self.heads
        dh = d // h
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        o = attention(heads_first(q), heads_first(k), heads_first(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, name="proj")(o)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), name="fc1")(y)
        y = _gelu(y)
        y = nn.Dense(d, name="fc2")(y)
        return x + y


# ------------------------------------------------- ResNetV2 (dpt_hybrid) ---


class _GNReLU(nn.Module):
    groups: int
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        return jax.nn.relu(x) if self.act else x


class ResNetV2Bottleneck(nn.Module):
    """timm ResNetV2 non-preact Bottleneck (vision_transformer_hybrid
    backbone: preact=False, GroupNormAct, StdConv2dSame — WS folded into
    the imported kernels)."""

    out_chs: int
    mid_chs: int
    stride: int = 1
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_chs or self.stride != 1:
            shortcut = nn.Conv(
                self.out_chs, (1, 1), strides=self.stride, padding="SAME",
                use_bias=False, name="downsample_conv",
            )(x)
            shortcut = _GNReLU(self.gn_groups, act=False, name="downsample_norm")(shortcut)
        y = nn.Conv(self.mid_chs, (1, 1), use_bias=False, name="conv1")(x)
        y = _GNReLU(self.gn_groups, name="norm1")(y)
        y = nn.Conv(
            self.mid_chs, (3, 3), strides=self.stride, padding="SAME",
            use_bias=False, name="conv2",
        )(y)
        y = _GNReLU(self.gn_groups, name="norm2")(y)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, name="conv3")(y)
        y = _GNReLU(self.gn_groups, act=False, name="norm3")(y)
        return jax.nn.relu(y + shortcut)


class ResNetV2Backbone(nn.Module):
    """Stem + 3 stages; returns (stage0, stage1, stage2) NHWC features at
    /4, /8, /16 (the hybrid patch grid). timm _resnetv2(layers=(3,4,9))."""

    layers: Tuple[int, ...] = (3, 4, 9)
    stem_chs: int = 64
    base_chs: int = 256  # stage0 out; doubles per stage
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.stem_chs, (7, 7), strides=2, padding="SAME", use_bias=False,
            name="stem_conv",
        )(x)
        x = _GNReLU(self.gn_groups, name="stem_norm")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for si, depth in enumerate(self.layers):
            out_chs = self.base_chs * (2 ** si)
            mid_chs = out_chs // 4
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = ResNetV2Bottleneck(
                    out_chs, mid_chs, stride, self.gn_groups,
                    name=f"stage{si}_block{bi}",
                )(x)
            feats.append(x)
        return tuple(feats)


# ------------------------------------------------------- DPT components ---


class _Readout(nn.Module):
    """Readout-token handling (vit.py:9-42): ignore | add | project."""

    mode: str
    dim: int

    @nn.compact
    def __call__(self, tokens):  # (B, 1+N, D) -> (B, N, D)
        cls, rest = tokens[:, :1], tokens[:, 1:]
        if self.mode == "ignore":
            return rest
        if self.mode == "add":
            return rest + cls
        if self.mode == "project":
            readout = jnp.broadcast_to(cls, rest.shape)
            y = jnp.concatenate([rest, readout], axis=-1)
            return _gelu(nn.Dense(self.dim, name="project")(y))
        raise ValueError(f"unknown readout {self.mode!r}")


def _depth_to_space(x, k):
    """(B, h, w, k*k*C) -> (B, h*k, w*k, C); channel index = (dy*k+dx)*C+c."""
    b, h, w, kkc = x.shape
    c = kkc // (k * k)
    x = x.reshape(b, h, w, k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * k, w * k, c)


class _Reassemble(nn.Module):
    """act_postprocess (vit.py:205-282): readout -> grid -> 1x1 conv ->
    resample. ``scale`` 4/2 = dense+depth-to-space (== ConvTranspose k=s);
    1 = none; -2 = 3x3 stride-2 conv (torch padding=1)."""

    out_chs: int
    scale: int
    readout: str
    vit_dim: int

    @nn.compact
    def __call__(self, tokens, grid_hw):
        gh, gw = grid_hw
        y = _Readout(self.readout, self.vit_dim, name="readout")(tokens)
        b, n, d = y.shape
        y = y.reshape(b, gh, gw, d)
        y = nn.Conv(self.out_chs, (1, 1), name="conv")(y)
        if self.scale in (2, 4):
            k = self.scale
            y = nn.Dense(k * k * self.out_chs, name="up")(y)
            y = _depth_to_space(y, k)
        elif self.scale == -2:
            y = nn.Conv(
                self.out_chs, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                name="down",
            )(y)
        elif self.scale != 1:
            raise ValueError(f"bad scale {self.scale}")
        return y


class ResidualConvUnit(nn.Module):
    """blocks.py:231-288 (bn=False variant used by DPT)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        return y + x


class FeatureFusionBlock(nn.Module):
    """blocks.py:291-341 (FeatureFusionBlock_custom, align_corners=True,
    deconv=False). ``out_features`` is the expand=True halving used by
    MidasNet_small (blocks.py:308-313); None keeps the DPT behavior."""

    features: int
    out_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = interpolate(x, (h, w), mode="bilinear", align_corners=True)
        return nn.Conv(self.out_features or self.features, (1, 1),
                       name="out_conv")(x)


# ------------------------------------------------------------ the model ---


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    patch: int = 16
    hooks: Tuple[int, int, int, int] = (0, 1, 8, 11)
    layer_chs: Tuple[int, int, int, int] = (256, 512, 768, 768)
    features: int = 256
    readout: str = "project"
    non_negative: bool = True
    hybrid: bool = True
    rn_layers: Tuple[int, ...] = (3, 4, 9)
    rn_stem_chs: int = 64
    rn_base_chs: int = 256
    gn_groups: int = 32
    pos_grid: int = 24  # stored pos-embed grid (384/16)


VARIANTS = {
    # api.py:77-95 — dpt_large / dpt_hybrid; vitb16 kept for completeness
    "vitl16_384": DPTConfig(
        vit_dim=1024, vit_depth=24, vit_heads=16, hooks=(5, 11, 17, 23),
        layer_chs=(256, 512, 1024, 1024), hybrid=False,
    ),
    "vitb16_384": DPTConfig(
        hooks=(2, 5, 8, 11), layer_chs=(96, 192, 384, 768), hybrid=False,
    ),
    "vitb_rn50_384": DPTConfig(),
}


class DPTDepthModel(nn.Module):
    """DPT depth net: ViT(-hybrid) backbone -> 4 reassembled pyramid levels
    -> RefineNet-style fusion -> depth head. Forward contract matches the
    reference (dpt_depth.py:67-108): normalized NHWC image in, (B, H, W)
    non-negative inverse depth out."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, H, W, _ = x.shape
        p = cfg.patch
        gh, gw = H // p, W // p

        # ---- backbone ----------------------------------------------------
        rn_feats = None
        if cfg.hybrid:
            rn_feats = ResNetV2Backbone(
                cfg.rn_layers, cfg.rn_stem_chs, cfg.rn_base_chs, cfg.gn_groups,
                name="backbone",
            )(x)
            y = rn_feats[-1]  # (B, gh, gw, C)
            tokens = nn.Dense(cfg.vit_dim, name="patch_proj")(y).reshape(b, gh * gw, cfg.vit_dim)
        else:
            # space-to-depth patchify + matmul == Conv(k=p, s=p)
            y = x.reshape(b, gh, p, gw, p, x.shape[-1])
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * x.shape[-1])
            tokens = nn.Dense(cfg.vit_dim, name="patch_proj")(y)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.vit_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + cfg.pos_grid * cfg.pos_grid, cfg.vit_dim),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, cfg.vit_dim)), tokens], axis=1
        )
        tokens = tokens + _resize_pos_embed(pos_embed, cfg.pos_grid, gh, gw)

        hook_set = set(cfg.hooks)
        acts = {}
        for i in range(cfg.vit_depth):
            tokens = ViTBlock(cfg.vit_dim, cfg.vit_heads, name=f"block{i}")(tokens)
            if i in hook_set:
                acts[i] = tokens
        # forward_flex applies the final norm (vit.py:151) but the hooks fire
        # on raw block outputs — the norm output is unused by DPT.

        # ---- reassemble ---------------------------------------------------
        scales = (4, 2, 1, -2)
        layers = []
        for li in range(4):
            if cfg.hybrid and li < 2:
                layers.append(rn_feats[li])
            else:
                layers.append(
                    _Reassemble(
                        cfg.layer_chs[li], scales[li], cfg.readout, cfg.vit_dim,
                        name=f"post{li + 1}",
                    )(acts[cfg.hooks[li]], (gh, gw))
                )

        f = cfg.features
        rn = [
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"layer{li + 1}_rn")(layers[li])
            for li in range(4)
        ]

        # ---- fusion (dpt_depth.py:78-81) -----------------------------------
        path = FeatureFusionBlock(f, name="refinenet4")(rn[3])
        path = FeatureFusionBlock(f, name="refinenet3")(path, rn[2])
        path = FeatureFusionBlock(f, name="refinenet2")(path, rn[1])
        path = FeatureFusionBlock(f, name="refinenet1")(path, rn[0])

        # ---- head (dpt_depth.py:92-99) -------------------------------------
        y = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(path)
        y = interpolate(
            y, (y.shape[1] * 2, y.shape[2] * 2), mode="bilinear", align_corners=True
        )
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        if cfg.non_negative:
            y = jax.nn.relu(y)
        return y[..., 0]  # (B, H, W)


def _resize_pos_embed(pos_embed, gs_old, gh, gw):
    """vit.py:100-114 — bilinear-resize the grid part of the pos embed."""
    tok, grid = pos_embed[:, :1], pos_embed[:, 1:]
    if (gh, gw) == (gs_old, gs_old):
        return pos_embed
    d = grid.shape[-1]
    grid = grid.reshape(1, gs_old, gs_old, d)
    grid = interpolate(grid, (gh, gw), mode="bilinear")
    grid = grid.reshape(1, gh * gw, d)
    return jnp.concatenate([tok, grid], axis=1)


# ------------------------------------------------- MidasNet (midas_v21) ---


class ResNeXtBottleneck(nn.Module):
    """torchvision ResNeXt Bottleneck (groups=32, width_per_group=8), BN
    folded into conv scale/bias at import (eval-mode running stats)."""

    planes: int  # output channels (= base * 4)
    width: int
    stride: int = 1
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.planes or self.stride != 1:
            shortcut = nn.Conv(
                self.planes, (1, 1), strides=self.stride, name="downsample"
            )(x)
        y = nn.Conv(self.width, (1, 1), name="conv1")(x)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3), strides=self.stride, padding=((1, 1), (1, 1)),
            feature_group_count=self.groups, name="conv2",
        )(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (1, 1), name="conv3")(y)
        return jax.nn.relu(y + shortcut)


class ResNeXt101Backbone(nn.Module):
    """torchvision resnext101_32x8d feature stages (blocks.py:101-116
    _make_resnet_backbone split: stem+layer1, layer2, layer3, layer4)."""

    layers: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    stem_chs: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.stem_chs, (7, 7), strides=2, padding=((3, 3), (3, 3)),
            name="stem_conv",
        )(x)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = []
        base = self.stem_chs
        for si, depth in enumerate(self.layers):
            planes = base * 4 * (2 ** si)  # 256, 512, 1024, 2048
            width = int(base * (2 ** si) * self.width_per_group * self.groups / 64)
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = ResNeXtBottleneck(
                    planes, width, stride, self.groups,
                    name=f"layer{si + 1}_block{bi}",
                )(x)
            feats.append(x)
        return tuple(feats)


class FeatureFusionBlockV21(nn.Module):
    """blocks.py:194-226 (the non-custom block: no out_conv)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        return interpolate(
            x, (x.shape[1] * 2, x.shape[2] * 2), mode="bilinear",
            align_corners=True,
        )


class MidasNet(nn.Module):
    """midas_net.py:12-76 — MiDaS v2.1 large (ResNeXt101-WSL encoder +
    RefineNet decoder). The reference pulls the encoder from torch.hub
    (blocks.py:114-116); here it is a native flax backbone with BN folded
    at import. midas_v21_small (efficientnet-lite3, also hub-fetched) is
    ``MidasNetSmall`` below."""

    features: int = 256
    non_negative: bool = True
    layers: Tuple[int, ...] = (3, 4, 23, 3)
    stem_chs: int = 64
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        feats = ResNeXt101Backbone(
            self.layers, self.groups, stem_chs=self.stem_chs, name="backbone"
        )(x)
        f = self.features
        rn = [
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"layer{li + 1}_rn")(feats[li])
            for li in range(4)
        ]
        path = FeatureFusionBlockV21(f, name="refinenet4")(rn[3])
        path = FeatureFusionBlockV21(f, name="refinenet3")(path, rn[2])
        path = FeatureFusionBlockV21(f, name="refinenet2")(path, rn[1])
        path = FeatureFusionBlockV21(f, name="refinenet1")(path, rn[0])

        y = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(path)
        # midas_net.py:39 Interpolate has align_corners=False (unlike DPT)
        y = interpolate(y, (y.shape[1] * 2, y.shape[2] * 2), mode="bilinear")
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        if self.non_negative:
            y = jax.nn.relu(y)
        return y[..., 0]


# -------------------------------------- MidasNet_small (midas_v21_small) ---


def _relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


# tf_efficientnet_lite3 stage plan: (repeats, out_ch, kernel, stride,
# expand_ratio). gen-efficientnet _gen_efficientnet_lite arch_def with
# channel_multiplier=1.2 / depth_multiplier=1.4 / fix_first_last /
# fix_stem=32: channels = round_channels(c*1.2, divisor 8, round_limit
# 0.9) -> 24/32/48/96/136/232/384; repeats = ceil(r*1.4) except the fixed
# first/last stages -> 1/3/3/5/5/6/1. Feature taps after stages 1/2/4/6
# give the [32, 48, 136, 384] widths blocks.py:41 hardcodes for scratch.
LITE3_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 24, 3, 1, 1),
    (3, 32, 3, 2, 6),
    (3, 48, 5, 2, 6),
    (5, 96, 3, 2, 6),
    (5, 136, 5, 1, 6),
    (6, 232, 5, 2, 6),
    (1, 384, 3, 1, 6),
)


class _MBConvLite(nn.Module):
    """gen-efficientnet InvertedResidual / DepthwiseSeparableConv, 'lite'
    flavor: no squeeze-excite, ReLU6, TF-SAME padding (flax "SAME" ==
    TF SAME: asymmetric hi-pad for even inputs under stride 2). BN is
    folded into conv scale/bias at import (eval-mode running stats,
    tf_ BN eps 1e-3)."""

    out_ch: int
    kernel: int
    stride: int
    expand: int  # expansion ratio; 1 => depthwise-separable (stage 0)

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = x
        if self.expand > 1:
            y = nn.Conv(x.shape[-1] * self.expand, (1, 1), name="conv_pw")(y)
            y = _relu6(y)
        y = nn.Conv(
            y.shape[-1], (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=y.shape[-1], name="conv_dw",
        )(y)
        y = _relu6(y)
        # the project conv is keyed conv_pw in the DS block, conv_pwl in IR
        y = nn.Conv(self.out_ch, (1, 1),
                    name="conv_pwl" if self.expand > 1 else "conv_pw")(y)
        if self.stride == 1 and shortcut.shape[-1] == self.out_ch:
            y = y + shortcut
        return y


class EfficientNetLite3Backbone(nn.Module):
    """tf_efficientnet_lite3 feature stages, split as the reference's
    _make_efficientnet_backbone does (blocks.py:88-98): layer1 = stem +
    stages 0-1 (/4), layer2 = stage 2 (/8), layer3 = stages 3-4 (/16),
    layer4 = stages 5-6 (/32). The reference torch.hub-fetches this
    encoder (blocks.py:78-85); here it is native flax."""

    stages: Tuple[Tuple[int, int, int, int, int], ...] = LITE3_STAGES
    stem_ch: int = 32  # fix_stem: NOT width-scaled

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.stem_ch, (3, 3), strides=2, padding="SAME",
                    name="conv_stem")(x)
        x = _relu6(x)
        feats = []
        for si, (reps, out_ch, k, s, e) in enumerate(self.stages):
            for bi in range(reps):
                x = _MBConvLite(out_ch, k, s if bi == 0 else 1, e,
                                name=f"stage{si}_block{bi}")(x)
            if si in (1, 2, 4, 6):
                feats.append(x)
        return tuple(feats)


class MidasNetSmall(nn.Module):
    """midas_net_custom.py:12-105 — MidasNet_small(features=64,
    backbone="efficientnet_lite3", non_negative=True, blocks={'expand':
    True}), the api.py:105-112 configuration. Decoder = _make_scratch with
    expand (64/128/256/512 rn widths, blocks.py:49-75) + four
    FeatureFusionBlock_custom (align_corners=True, out_conv halves
    channels when expanding) + the output_conv head whose Interpolate uses
    align_corners=False (midas_net_custom.py:59-67)."""

    features: int = 64
    non_negative: bool = True

    @nn.compact
    def __call__(self, x):
        feats = EfficientNetLite3Backbone(name="backbone")(x)
        f = self.features
        fs = (f, f * 2, f * 4, f * 8)  # expand=True scratch widths
        rn = [
            nn.Conv(fs[li], (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"layer{li + 1}_rn")(feats[li])
            for li in range(4)
        ]
        path = FeatureFusionBlock(fs[3], out_features=fs[2], name="refinenet4")(rn[3])
        path = FeatureFusionBlock(fs[2], out_features=fs[1], name="refinenet3")(path, rn[2])
        path = FeatureFusionBlock(fs[1], out_features=fs[0], name="refinenet2")(path, rn[1])
        path = FeatureFusionBlock(fs[0], name="refinenet1")(path, rn[0])

        y = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(path)
        y = interpolate(y, (y.shape[1] * 2, y.shape[2] * 2), mode="bilinear")
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        if self.non_negative:
            y = jax.nn.relu(y)
        return y[..., 0]


# --------------------------------------------------------- MiDaSInference ---

# api.py:34-49 — per-model input normalization (applied to [0,1] RGB)
_NORM = {
    "dpt": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "midas_v21": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
}


def build_dpt(model_type: str = "dpt_hybrid") -> DPTDepthModel:
    """api.py:73-116 factory (dpt_large | dpt_hybrid | dpt_vitb16)."""
    backbone = {
        "dpt_large": "vitl16_384",
        "dpt_hybrid": "vitb_rn50_384",
        "dpt_vitb16": "vitb16_384",
    }[model_type]
    return DPTDepthModel(VARIANTS[backbone])


def build_midas(model_type: str = "dpt_hybrid") -> nn.Module:
    """api.py load_model (api.py:73-133): the full model_type switch incl.
    the MiDaS v2.1 family. Pair with ``MiDaSInference(model, params,
    model_type)`` for the reference's transform conventions."""
    if model_type.startswith("dpt_"):
        return build_dpt(model_type)
    if model_type == "midas_v21":
        return MidasNet()
    if model_type == "midas_v21_small":
        return MidasNetSmall()
    raise ValueError(f"unknown MiDaS model_type: {model_type}")


def midas_transform_size(
    h: int, w: int, net: int = 384, multiple_of: int = 32, method: str = "minimal"
) -> Tuple[int, int]:
    """midas/transforms.py:105-160 ``Resize.get_size`` (keep_aspect_ratio)."""
    sh, sw = net / h, net / w
    if method == "minimal":  # fit whichever side changes least
        s = sw if abs(1 - sw) < abs(1 - sh) else sh
    elif method == "lower_bound":
        s = max(sh, sw)
    elif method == "upper_bound":
        s = min(sh, sw)
    else:
        raise ValueError(method)

    def constrain(x, lo=None, hi=None):
        y = int(round(x / multiple_of) * multiple_of)
        if hi is not None and y > hi:
            y = int(np.floor(x / multiple_of) * multiple_of)
        if lo is not None and y < lo:
            y = int(np.ceil(x / multiple_of) * multiple_of)
        return y

    lo = net if method == "lower_bound" else None
    hi = net if method == "upper_bound" else None
    return constrain(s * h, lo, hi), constrain(s * w, lo, hi)


class MiDaSInference:
    """api.py:137-169 equivalent: holds the model + params and maps a [0,1]
    NHWC batch to (B, H, W, 1) inverse depth at the input resolution.

    Unlike the reference (which expects the resize/normalize transform to
    have been applied in the dataloader), ``__call__`` here performs the
    whole pipeline on-device in one jittable program: aspect-preserving
    cubic resize to the net size (transforms.py Resize, cv2.INTER_CUBIC ==
    bicubic a=-0.75, no antialias), channel normalization, DPT forward and
    bicubic resize back (api.py:162-167, align_corners=False)."""

    def __init__(
        self,
        model: DPTDepthModel,
        params,
        model_type: str = "dpt_hybrid",
        net_size: Optional[int] = None,
    ):
        self.model = model
        self.params = params
        mean, std = _NORM["midas_v21" if model_type.startswith("midas") else "dpt"]
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        if net_size is None:
            net_size = 256 if model_type == "midas_v21_small" else 384
        self.net_size = net_size
        # api.py:33,43 — dpt_* use "minimal", midas_v21* use "upper_bound"
        self.method = "upper_bound" if model_type.startswith("midas") else "minimal"

    def __call__(self, x01: jnp.ndarray) -> jnp.ndarray:
        h, w = x01.shape[1], x01.shape[2]
        nh, nw = midas_transform_size(h, w, self.net_size, method=self.method)
        y = interpolate(x01, (nh, nw), mode="bicubic")
        y = (y - self._mean) / self._std
        depth = self.model.apply({"params": self.params}, y)  # (B, nh, nw)
        depth = interpolate(depth[..., None], (h, w), mode="bicubic")
        return depth

    def depth_fn(self):
        """Adapter for ``train.ldm_tasks.depth2image_loss(depth_fn=...)``:
        takes HQ images in [-1, 1] (the training batch convention) and
        returns (B, H, W, 1) depth, gradients stopped (frozen estimator)."""

        def fn(hq):
            return jax.lax.stop_gradient(self((hq + 1.0) * 0.5))

        return fn
