"""Torch transcription of the timm backbones MiDaS builds on, plus a loader
for the reference's own vendored DPT code (/root/reference/ldm/modules/midas).

The reference DPT modules (dpt_depth.py, blocks.py, vit.py) are pure torch
EXCEPT for ``timm.create_model`` (vit.py:298,481) — timm is absent here, so
these classes transcribe exactly the two timm models MiDaS instantiates:

- ``vit_large_patch16_384`` / ``vit_base_patch16_384``: the classic timm
  VisionTransformer (conv patch embed, cls token, learned pos embed, pre-LN
  blocks with fused qkv + exact GELU);
- ``vit_base_resnet50_384``: the hybrid — timm ResNetV2 backbone with
  preact=False, GroupNormAct (eps 1e-5), TF-"SAME" padded weight-
  standardized convs (StdConv2dSame, eps 1e-8), stem 64ch conv7x7/2 +
  maxpool 3x3/2, stages (3,4,9) -> /16 feature grid, then a 1x1 proj.

With ``create_model`` stubbed to return these, the reference's own
``_make_vit_*_backbone`` / ``forward_vit`` / ``DPTDepthModel`` run verbatim
as the numerical oracle, and ``model.state_dict()`` feeds
``convert.torch_import.dpt_params_from_torch`` directly.
"""

from __future__ import annotations

import math
import sys

import torch
import torch.nn as nn
import torch.nn.functional as F

_REF = "/root/reference"


# --------------------------------------------- timm 'Same' conv/pool ops ---


def _pad_same(x, k, s, value=0.0):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2), value=value)


class StdConv2dSame(nn.Conv2d):
    """timm StdConv2dSame: runtime weight standardization (biased var over
    (I,kH,kW), eps 1e-8) + TF-SAME padding."""

    def __init__(self, in_chs, out_chs, k, stride=1, bias=False, eps=1e-8):
        super().__init__(in_chs, out_chs, k, stride=stride, padding=0, bias=bias)
        self.eps = eps

    def forward(self, x):
        w = self.weight
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - m) / torch.sqrt(v + self.eps)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride, 0)


class MaxPool2dSame(nn.Module):
    def __init__(self, k=3, stride=2):
        super().__init__()
        self.k, self.stride = k, stride

    def forward(self, x):
        x = _pad_same(x, self.k, self.stride, value=float("-inf"))
        return F.max_pool2d(x, self.k, self.stride)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, groups, chs, act=True):
        super().__init__(groups, chs, eps=1e-5)
        self.apply_act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.apply_act else x


# ----------------------------------------------------- ResNetV2 (hybrid) ---


class _Downsample(nn.Module):
    def __init__(self, in_chs, out_chs, stride, groups):
        super().__init__()
        self.conv = StdConv2dSame(in_chs, out_chs, 1, stride)
        self.norm = GroupNormAct(groups, out_chs, act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class _Bottleneck(nn.Module):
    def __init__(self, in_chs, out_chs, mid_chs, stride, groups):
        super().__init__()
        self.downsample = (
            _Downsample(in_chs, out_chs, stride, groups)
            if (in_chs != out_chs or stride != 1)
            else None
        )
        self.conv1 = StdConv2dSame(in_chs, mid_chs, 1)
        self.norm1 = GroupNormAct(groups, mid_chs)
        self.conv2 = StdConv2dSame(mid_chs, mid_chs, 3, stride)
        self.norm2 = GroupNormAct(groups, mid_chs)
        self.conv3 = StdConv2dSame(mid_chs, out_chs, 1)
        self.norm3 = GroupNormAct(groups, out_chs, act=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = self.norm1(self.conv1(x))
        y = self.norm2(self.conv2(y))
        y = self.norm3(self.conv3(y))
        return F.relu(y + shortcut)


class _Stage(nn.Module):
    def __init__(self, in_chs, out_chs, depth, stride, groups):
        super().__init__()
        blocks = []
        for bi in range(depth):
            blocks.append(
                _Bottleneck(
                    in_chs if bi == 0 else out_chs,
                    out_chs,
                    out_chs // 4,
                    stride if bi == 0 else 1,
                    groups,
                )
            )
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class _Stem(nn.Module):
    def __init__(self, stem_chs, groups):
        super().__init__()
        self.conv = StdConv2dSame(3, stem_chs, 7, 2)
        self.norm = GroupNormAct(groups, stem_chs)
        self.pool = MaxPool2dSame(3, 2)

    def forward(self, x):
        return self.pool(self.norm(self.conv(x)))


class TimmResNetV2(nn.Module):
    """timm _resnetv2(layers): stem/4 + stages with strides (1,2,2,...)."""

    def __init__(self, layers=(3, 4, 9), stem_chs=64, base_chs=256, groups=32):
        super().__init__()
        self.stem = _Stem(stem_chs, groups)
        stages = []
        in_chs = stem_chs
        for si, depth in enumerate(layers):
            out_chs = base_chs * (2 ** si)
            stages.append(_Stage(in_chs, out_chs, depth, 1 if si == 0 else 2, groups))
            in_chs = out_chs
        self.stages = nn.ModuleList(stages)
        self.out_chs = in_chs

    def forward(self, x):
        x = self.stem(x)
        for s in self.stages:
            x = s(x)
        return x


# ----------------------------------------------------------------- ViT ---


class _ViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-1, -2) * (d // h) ** -0.5, dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


class TimmViT(nn.Module):
    """Just enough timm VisionTransformer surface for MiDaS's injected
    ``forward_flex`` (vit.py:117-153): patch_embed(.backbone/.proj),
    cls_token, pos_embed, pos_drop, blocks, norm."""

    def __init__(self, dim, depth, heads, patch=16, pos_grid=24, backbone=None):
        super().__init__()
        self.patch_embed = nn.Module()
        if backbone is not None:
            self.patch_embed.backbone = backbone
            self.patch_embed.proj = nn.Conv2d(backbone.out_chs, dim, 1)
        else:
            self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + pos_grid * pos_grid, dim) * 0.02)
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.ModuleList(_ViTBlock(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)


def make_create_model(tiny=None):
    """A ``timm.create_model`` stand-in covering the names MiDaS requests.
    ``tiny`` optionally overrides (dim, depth, heads, pos_grid, rn) for
    reduced-size tests."""

    def create_model(name, pretrained=False, **kw):
        assert not pretrained
        if name == "vit_large_patch16_384":
            return TimmViT(1024, 24, 16)
        if name == "vit_base_patch16_384":
            return TimmViT(768, 12, 12)
        if name == "vit_base_resnet50_384":
            return TimmViT(768, 12, 12, backbone=TimmResNetV2())
        raise ValueError(name)

    return create_model


# ------------------------------------------------------ reference loader ---


def load_reference_midas():
    """Import the reference midas modules standalone (package ``refmidas``)
    with timm.create_model stubbed to the transcriptions above. Returns
    (vit, blocks, dpt_depth) modules."""
    from tests.oracles import _ensure_stubs, _load_as

    _ensure_stubs()
    sys.modules["timm"].create_model = make_create_model()
    base = f"{_REF}/ldm/modules/midas/midas"
    _load_as("refmidas", "base_model", f"{base}/base_model.py")
    vit = _load_as("refmidas", "vit", f"{base}/vit.py")
    blocks = _load_as("refmidas", "blocks", f"{base}/blocks.py")
    dpt = _load_as("refmidas", "dpt_depth", f"{base}/dpt_depth.py")
    return vit, blocks, dpt


def build_reference_tiny_dpt(dim=48, depth=4, heads=4, pos_grid=4,
                             chs=(16, 32, 40, 48), features=16, hybrid=True,
                             hooks=(0, 1, 2, 3), rn_layers=(1, 1, 1),
                             rn_stem=8, rn_base=16, groups=4, seed=0):
    """Assemble a reduced-size DPT from the REFERENCE's own pieces
    (_make_vit_*_backbone, _make_scratch, _make_fusion_block, the
    DPTDepthModel head layout) — the full-size channel specs are hardcoded
    in DPT.__init__ (dpt_depth.py:41-57), so tiny configs go through the
    same underlying builders the class calls. Forward follows
    dpt_depth.py:67-85 exactly."""
    vit_mod, blocks_mod, dpt_mod = load_reference_midas()
    torch.manual_seed(seed)

    if hybrid:
        backbone = TimmResNetV2(rn_layers, rn_stem, rn_base, groups)
        model = TimmViT(dim, depth, heads, pos_grid=pos_grid, backbone=backbone)
        pretrained = vit_mod._make_vit_b_rn50_backbone(
            model, features=list(chs), size=[pos_grid * 16, pos_grid * 16],
            hooks=list(hooks), vit_features=dim, use_readout="project",
        )
    else:
        model = TimmViT(dim, depth, heads, pos_grid=pos_grid)
        pretrained = vit_mod._make_vit_b16_backbone(
            model, features=list(chs), size=[pos_grid * 16, pos_grid * 16],
            hooks=list(hooks), vit_features=dim, use_readout="project",
        )

    scratch = blocks_mod._make_scratch(list(chs), features)
    for i in range(1, 5):
        setattr(scratch, f"refinenet{i}", dpt_mod._make_fusion_block(features, False))
    scratch.output_conv = nn.Sequential(
        nn.Conv2d(features, features // 2, 3, padding=1),
        blocks_mod.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        nn.Conv2d(features // 2, 32, 3, padding=1),
        nn.ReLU(True),
        nn.Conv2d(32, 1, 1),
        nn.ReLU(True),
        nn.Identity(),
    )

    root = nn.Module()
    root.pretrained = pretrained
    root.scratch = scratch

    def forward(x):  # dpt_depth.py:67-85 + DPTDepthModel.forward squeeze
        l1, l2, l3, l4 = vit_mod.forward_vit(root.pretrained, x)
        r1 = root.scratch.layer1_rn(l1)
        r2 = root.scratch.layer2_rn(l2)
        r3 = root.scratch.layer3_rn(l3)
        r4 = root.scratch.layer4_rn(l4)
        p4 = root.scratch.refinenet4(r4)
        p3 = root.scratch.refinenet3(p4, r3)
        p2 = root.scratch.refinenet2(p3, r2)
        p1 = root.scratch.refinenet1(p2, r1)
        return root.scratch.output_conv(p1).squeeze(1)

    root.forward_fn = forward
    return root


# ----------------------------------------- torchvision ResNeXt (midas_v21) ---


class _TVBottleneck(nn.Module):
    """torchvision.models.resnet.Bottleneck with groups/width_per_group."""

    def __init__(self, in_chs, planes, width, stride, groups):
        super().__init__()
        self.conv1 = nn.Conv2d(in_chs, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if in_chs != planes or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_chs, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class TVResNeXt(nn.Module):
    """torchvision resnext101_32x8d layout (conv1/bn1/relu/maxpool +
    layer1..4) — what torch.hub's resnext101_32x8d_wsl returns."""

    def __init__(self, layers=(3, 4, 23, 3), groups=32, width_per_group=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_chs = 64
        for si, depth in enumerate(layers):
            planes = 64 * 4 * (2 ** si)
            width = int(64 * (2 ** si) * width_per_group * groups / 64)
            blocks = []
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(_TVBottleneck(in_chs, planes, width,
                                            stride if bi == 0 else 1, groups))
                in_chs = planes
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):  # unused by MidasNet (it calls the split layers)
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _randomize_bn_stats(model, seed=0):
    """Default running stats (mean 0, var 1) would make BN folding vacuous."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)


# -------------------------- gen-efficientnet lite3 (midas_v21_small) ---


class Conv2dSame(nn.Conv2d):
    """gen-efficientnet Conv2dSame(Export): plain conv with TF-SAME dynamic
    padding (what every conv in a tf_ model resolves to; for stride-1 odd-k
    convs it equals static padding k//2)."""

    def __init__(self, in_chs, out_chs, k, stride=1, groups=1, bias=False):
        super().__init__(in_chs, out_chs, k, stride=stride, padding=0,
                         groups=groups, bias=bias)

    def forward(self, x):
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _DSBlockLite(nn.Module):
    """DepthwiseSeparableConv, lite flavor (no SE, ReLU6, BN eps 1e-3):
    conv_dw+bn1+act1, conv_pw+bn2 — gen-efficientnet key names."""

    def __init__(self, in_ch, out_ch, k=3, stride=1):
        super().__init__()
        self.conv_dw = Conv2dSame(in_ch, in_ch, k, stride, groups=in_ch)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.act1 = nn.ReLU6(inplace=True)
        self.conv_pw = Conv2dSame(in_ch, out_ch, 1)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        s = x
        x = self.act1(self.bn1(self.conv_dw(x)))
        x = self.bn2(self.conv_pw(x))
        return x + s if self.has_residual else x


class _IRBlockLite(nn.Module):
    """InvertedResidual, lite flavor: conv_pw+bn1+act1, conv_dw+bn2+act2,
    conv_pwl+bn3 (no SE)."""

    def __init__(self, in_ch, out_ch, k, stride, exp=6):
        super().__init__()
        mid = in_ch * exp
        self.conv_pw = Conv2dSame(in_ch, mid, 1)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.act1 = nn.ReLU6(inplace=True)
        self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.act2 = nn.ReLU6(inplace=True)
        self.conv_pwl = Conv2dSame(mid, out_ch, 1)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        s = x
        x = self.act1(self.bn1(self.conv_pw(x)))
        x = self.act2(self.bn2(self.conv_dw(x)))
        x = self.bn3(self.conv_pwl(x))
        return x + s if self.has_residual else x


# must stay in lockstep with models/dpt.py LITE3_STAGES
_LITE3_STAGES = (
    (1, 24, 3, 1, 1),
    (3, 32, 3, 2, 6),
    (3, 48, 5, 2, 6),
    (5, 96, 3, 2, 6),
    (5, 136, 5, 1, 6),
    (6, 232, 5, 2, 6),
    (1, 384, 3, 1, 6),
)


class TorchEffnetLite3(nn.Module):
    """The exact gen-efficientnet tf_efficientnet_lite3 surface that the
    reference's _make_efficientnet_backbone slices (blocks.py:88-98):
    conv_stem/bn1/act1 + blocks[0..6] stage Sequentials, width 1.2 / depth
    1.4 lite scaling (stem fixed 32, first/last stage repeats fixed)."""

    def __init__(self):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 32, 3, 2)
        self.bn1 = nn.BatchNorm2d(32, eps=1e-3)
        self.act1 = nn.ReLU6(inplace=True)
        stages = []
        in_ch = 32
        for reps, out_ch, k, s, e in _LITE3_STAGES:
            blocks = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                blocks.append(
                    _DSBlockLite(in_ch, out_ch, k, stride) if e == 1
                    else _IRBlockLite(in_ch, out_ch, k, stride, e)
                )
                in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)


def build_reference_midas_v21_small(seed=0):
    """Reference MidasNet_small (midas/midas_net_custom.py:12-105) with
    torch.hub stubbed to the TorchEffnetLite3 transcription — init and
    forward are the reference's own code; only the hub-fetched encoder is
    transcribed. Full lite3 depth (the net is only ~7M params)."""
    load_reference_midas()
    import importlib.util

    torch.manual_seed(seed)
    effnet = TorchEffnetLite3()
    _randomize_bn_stats(effnet, seed)

    orig_hub_load = torch.hub.load
    torch.hub.load = lambda *a, **k: effnet
    try:
        spec = importlib.util.spec_from_file_location(
            "refmidas.midas_net_custom",
            f"{_REF}/ldm/modules/midas/midas/midas_net_custom.py",
        )
        mnc = importlib.util.module_from_spec(spec)
        sys.modules["refmidas.midas_net_custom"] = mnc
        spec.loader.exec_module(mnc)
        model = mnc.MidasNet_small()
    finally:
        torch.hub.load = orig_hub_load
    model.eval()
    return model


def build_reference_midas_v21(layers=(1, 1, 1, 1), features=64, seed=0):
    """Reference MidasNet (midas/midas_net.py) with torch.hub stubbed to the
    TVResNeXt transcription (real stage widths 256..2048; tiny depth)."""
    load_reference_midas()
    import importlib.util

    torch.manual_seed(seed)
    backbone = TVResNeXt(layers)
    _randomize_bn_stats(backbone, seed)

    orig_hub_load = torch.hub.load
    torch.hub.load = lambda *a, **k: backbone
    try:
        spec = importlib.util.spec_from_file_location(
            "refmidas.midas_net", f"{_REF}/ldm/modules/midas/midas/midas_net.py"
        )
        mn = importlib.util.module_from_spec(spec)
        sys.modules["refmidas.midas_net"] = mn
        spec.loader.exec_module(mn)
        model = mn.MidasNet(features=features)
    finally:
        torch.hub.load = orig_hub_load
    model.eval()
    return model
