"""Load reference PyTorch modules from /root/reference as numerical oracles.

The reference tree is read-only and its heavy deps (timm, lightning, lpips,
mmcv, xformers) are absent, so we stub just enough for the model files to
import. Used ONLY in tests, to verify checkpoint-conversion fidelity of our
JAX models against the original implementations.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import torch
import torch.nn as nn

_REF = "/root/reference"


def _ensure_stubs():
    if "pytorch_lightning" in sys.modules and hasattr(
        sys.modules["pytorch_lightning"], "LightningModule"
    ):
        return

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = nn.Module
    pl.seed_everything = lambda *a, **k: None
    sys.modules["pytorch_lightning"] = pl
    plu = types.ModuleType("pytorch_lightning.utilities")
    plut = types.ModuleType("pytorch_lightning.utilities.types")
    plut.STEP_OUTPUT = object
    plrz = types.ModuleType("pytorch_lightning.utilities.rank_zero")
    plrz.rank_zero_only = lambda fn: fn
    sys.modules["pytorch_lightning.utilities"] = plu
    sys.modules["pytorch_lightning.utilities.types"] = plut
    sys.modules["pytorch_lightning.utilities.rank_zero"] = plrz

    timm = types.ModuleType("timm")
    timm_m = types.ModuleType("timm.models")
    timm_l = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm_l.DropPath = DropPath
    timm_l.to_2tuple = to_2tuple
    timm_l.trunc_normal_ = trunc_normal_
    # a real ModuleSpec so importlib.util.find_spec("timm") (used by
    # transformers' _is_package_available) doesn't raise on the stub
    for mod in (timm, timm_m, timm_l):
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_m
    sys.modules["timm.models.layers"] = timm_l

    # reference's `utils.metrics` / `utils.common` pull in lpips et al.
    umetrics = types.ModuleType("utils.metrics")
    umetrics.calculate_psnr_pt = lambda *a, **k: None
    umetrics.LPIPS = lambda **kw: nn.Identity()
    upkg = types.ModuleType("utils")
    upkg.__path__ = [f"{_REF}/utils"]
    sys.modules.setdefault("utils", upkg)
    sys.modules["utils.metrics"] = umetrics


def _load_as(package: str, module: str, path: str):
    full = f"{package}.{module}"
    if full in sys.modules:
        return sys.modules[full]
    if package not in sys.modules:
        pkg = types.ModuleType(package)
        pkg.__path__ = [path.rsplit("/", 1)[0]]
        sys.modules[package] = pkg
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_swinir_module():
    """Import the reference swinir.py standalone (as package `refmodel.swinir`)."""
    _ensure_stubs()
    _load_as("refmodel", "mixins", f"{_REF}/diffusion/model/mixins.py")
    return _load_as("refmodel", "swinir", f"{_REF}/diffusion/model/swinir.py")


def load_reference_ldm():
    """Import the reference `ldm` package (VAE etc.) with stubbed deps."""
    _ensure_stubs()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import ldm.models.autoencoder as ae  # noqa: F401

    return ae


def _ensure_pixart_stubs():
    if "xformers" in sys.modules:
        return
    import torch.nn.functional as F

    xf = types.ModuleType("xformers")
    xops = types.ModuleType("xformers.ops")
    fmha = types.ModuleType("xformers.ops.fmha")

    class BlockDiagonalMask:
        def __init__(self, q_lens, kv_lens):
            self.q_lens, self.kv_lens = q_lens, kv_lens

        @classmethod
        def from_seqlens(cls, q_lens, kv_lens):
            return cls(q_lens, kv_lens)

        def bias(self, mq, mk, device, dtype):
            m = torch.full((mq, mk), float("-inf"), device=device, dtype=dtype)
            qo = ko = 0
            for ql, kl in zip(self.q_lens, self.kv_lens):
                m[qo : qo + ql, ko : ko + kl] = 0.0
                qo += ql
                ko += kl
            return m

    def memory_efficient_attention(q, k, v, p=0.0, attn_bias=None, op=None, **kw):
        # xformers layout: (B, M, H, K); ldm's MemoryEfficientAttnBlock
        # passes (B, M, K) 3-D tensors (single head)
        squeeze = q.ndim == 3
        if squeeze:
            q, k, v = (t.unsqueeze(2) for t in (q, k, v))
        b, mq, h, d = q.shape
        mk = k.shape[1]
        qh = q.permute(0, 2, 1, 3)
        kh = k.permute(0, 2, 1, 3)
        vh = v.permute(0, 2, 1, 3)
        scale = d ** -0.5
        attn = qh @ kh.transpose(-1, -2) * scale
        if attn_bias is not None:
            if isinstance(attn_bias, BlockDiagonalMask):
                attn = attn + attn_bias.bias(mq, mk, q.device, q.dtype)
            else:
                attn = attn + attn_bias.view(b, h, mq, mk)
        attn = attn.softmax(dim=-1)
        out = attn @ vh
        out = out.permute(0, 2, 1, 3).contiguous()
        return out.squeeze(2) if squeeze else out

    fmha.BlockDiagonalMask = BlockDiagonalMask
    xops.fmha = fmha
    xops.memory_efficient_attention = memory_efficient_attention
    xf.ops = xops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = xops
    sys.modules["xformers.ops.fmha"] = fmha

    # timm.models.vision_transformer: Mlp, Attention, PatchEmbed
    tvt = types.ModuleType("timm.models.vision_transformer")

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer() if isinstance(act_layer, type) or callable(act_layer) else act_layer
            if isinstance(self.act, type):
                self.act = self.act()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0, proj_drop=0.0, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                     norm_layer=None, flatten=True, bias=True, **kw):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.img_size = (img_size, img_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    tvt.Mlp = Mlp
    tvt.Attention = Attention
    tvt.PatchEmbed = PatchEmbed
    sys.modules["timm.models.vision_transformer"] = tvt

    # mmcv Registry
    mmcv = types.ModuleType("mmcv")

    class Registry:
        def __init__(self, name):
            self._m = {}

        def register_module(self, *args, **kw):
            def deco(obj):
                self._m[obj.__name__] = obj
                return obj

            if args and callable(args[0]):
                return deco(args[0])
            return deco

    mmcv.Registry = Registry
    sys.modules["mmcv"] = mmcv

    # torchvision.transforms stub (imported by diffusion/model/utils.py)
    tv = types.ModuleType("torchvision")
    tvtr = types.ModuleType("torchvision.transforms")
    tv.transforms = tvtr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvtr

    # diffusion package skeleton pointing at the reference tree (no __init__ exec)
    for name, path in [
        ("diffusion", f"{_REF}/diffusion"),
        ("diffusion.model", f"{_REF}/diffusion/model"),
        ("diffusion.model.nets", f"{_REF}/diffusion/model/nets"),
        ("diffusion.utils", f"{_REF}/diffusion/utils"),
    ]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg

    dlog = types.ModuleType("diffusion.utils.logger")
    dlog.get_root_logger = lambda *a, **k: None
    sys.modules["diffusion.utils.logger"] = dlog


def load_reference_pixart():
    """Import reference PixArt + controlnet modules with stubbed deps."""
    _ensure_stubs()
    _ensure_pixart_stubs()
    import importlib

    pixart = importlib.import_module("diffusion.model.nets.PixArt")
    pixart_ms = importlib.import_module("diffusion.model.nets.PixArtMS")
    nets_pkg = sys.modules["diffusion.model.nets"]
    for mod in (pixart, pixart_ms):
        for attr in ("PixArt", "PixArtBlock", "PixArtMS", "PixArtMSBlock"):
            if hasattr(mod, attr):
                setattr(nets_pkg, attr, getattr(mod, attr))
    cn = importlib.import_module("diffusion.model.nets.pixart_controlnet")
    return pixart, pixart_ms, cn


def load_reference_pixart_ms_controlnet():
    """Import the vestigial PixArtMS_controlnet (controlnet.py:86-290)."""
    load_reference_pixart()
    import importlib

    return importlib.import_module("diffusion.model.nets.controlnet")


def load_reference_diffusion():
    """Import reference gaussian_diffusion/respace/dpm_solver standalone."""
    _ensure_stubs()
    _load_as("refdiff", "diffusion_utils", f"{_REF}/diffusion/model/diffusion_utils.py")
    gd = _load_as("refdiff", "gaussian_diffusion", f"{_REF}/diffusion/model/gaussian_diffusion.py")
    rs = _load_as("refdiff", "respace", f"{_REF}/diffusion/model/respace.py")
    dpm = _load_as("refdiff", "dpm_solver", f"{_REF}/diffusion/model/dpm_solver.py")
    return gd, rs, dpm


def load_reference_cldm():
    """Import reference diffusion/cldm.py (ControlNet/ControlLDM/Reflow)."""
    _ensure_stubs()
    _ensure_pixart_stubs()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.ListConfig = list
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = list
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "torchvision.utils" not in sys.modules:
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tvu.make_grid = lambda x, **k: x
        sys.modules["torchvision"].utils = tvu
        sys.modules["torchvision.utils"] = tvu
    if "diffusers" not in sys.modules:
        dif = types.ModuleType("diffusers")
        dif.AutoencoderTiny = type("AutoencoderTiny", (), {})
        sys.modules["diffusers"] = dif
    if "utils.common" not in sys.modules:
        uc = types.ModuleType("utils.common")
        uc.frozen_module = lambda m: m
        def _inst(cfg):
            raise NotImplementedError
        uc.instantiate_from_config = _inst
        sys.modules["utils.common"] = uc

    return _load_as("refcldm", "cldm", f"{_REF}/diffusion/cldm.py")


def load_reference_mpt():
    """Import the reference MPT package standalone (diffusion/model/llava/
    mpt — pure torch + transformers + einops, all present). Returns the
    modeling_mpt module."""
    _ensure_stubs()
    base = f"{_REF}/diffusion/model/llava/mpt"
    _load_as("refmpt", "norm", f"{base}/norm.py")
    _load_as("refmpt", "attention", f"{base}/attention.py")
    _load_as("refmpt", "blocks", f"{base}/blocks.py")
    _load_as("refmpt", "configuration_mpt", f"{base}/configuration_mpt.py")
    _load_as("refmpt", "param_init_fns", f"{base}/param_init_fns.py")
    return _load_as("refmpt", "modeling_mpt", f"{base}/modeling_mpt.py")


def load_reference_llava_mpt():
    """Import reference llava_mpt.py (CLIP splice + LlavaMPTForCausalLM);
    aliases the standalone refmpt modules under the absolute package path
    the file imports from."""
    mm = load_reference_mpt()
    _ensure_pixart_stubs()
    for name in ("diffusion.model.llava", "diffusion.model.llava.mpt"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [f"{_REF}/{name.replace('.', '/')}"]
            sys.modules[name] = pkg
    sys.modules.setdefault("diffusion.model.llava.mpt.modeling_mpt", mm)
    return _load_as(
        "refllava", "llava_mpt", f"{_REF}/diffusion/model/llava/llava_mpt.py"
    )
