"""MANIQA no-reference IQA network (NTIRE'22 winner) + weight importer.

Parity target: the reference metric set ``evaluate_img.py:13-33`` creates
``pyiqa.create_metric('maniqa')``; pyiqa wraps the official IIGROUP/MANIQA
model: a ViT-B/8 backbone whose blocks 6-9 token features are concatenated,
refined by channel-transposed attention (TAB) + windowed (swin-style)
attention stages, and scored by a dual branch (patch score x patch weight,
weighted average).

Zero-egress note: the pretrained weights cannot ship with this repo. The
architecture + ``params_from_torch`` importer follow the LPIPS/CLIP pattern
(utils/metrics.py): the metric works the moment a local
``ckpt_kadid10k.pt``-style checkpoint (plus the timm ViT-B/8 state dict)
is provided. The importer validates coverage and raises with the list of
unmatched keys so any naming drift in a given checkpoint release is a
visible one-line fix, not silent garbage.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ViT-B/8 backbone hyperparameters (timm vit_base_patch8_224)
_VIT_DEPTH = 12
_VIT_DIM = 768
_VIT_HEADS = 12
_PATCH = 8
_IMG = 224
_GRID = _IMG // _PATCH  # 28
_FEAT_BLOCKS = (6, 7, 8, 9)  # blocks whose outputs are concatenated
_EMBED = 768
_NUM_TAB = 2
_WINDOW = 4
_SWIN_HEADS = 4
_SWIN_LAYERS = 2  # official depths=[2, 2]: 2 BasicLayers ...
_SWIN_DEPTH = 2  # ... of 2 SwinTransformerBlocks each
_SCALE = 0.8  # per-LAYER residual scale (official SwinTransformer.forward)
_DIM_MLP = 768  # official dim_mlp (MLP hidden width in both stages)


def _ln(x, p, name, eps=1e-6):
    g, b = p[f"{name}/scale"], p[f"{name}/bias"]
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g + b


def _linear(x, p, name):
    return x @ p[f"{name}/kernel"] + p[f"{name}/bias"]


def _mha(x, p, name, heads):
    b, n, d = x.shape
    qkv = _linear(x, p, f"{name}/qkv").reshape(b, n, 3, heads, d // heads)
    q, k, v = jnp.moveaxis(qkv, 2, 0)
    q = jnp.swapaxes(q, 1, 2)  # (b, h, n, dh)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    a = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) * (d // heads) ** -0.5, axis=-1)
    o = jnp.swapaxes(a @ v, 1, 2).reshape(b, n, d)
    return _linear(o, p, f"{name}/proj")


def _vit_forward(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
    """timm ViT-B/8 trunk on NHWC [0,1]-normalized 224 input; returns the
    token features (without CLS) of blocks ``_FEAT_BLOCKS`` concatenated on
    the channel axis: (B, 784, 3072)."""
    p = params
    b = x.shape[0]
    # patch embed: conv P x P stride P
    h = jax.lax.conv_general_dilated(
        x, p["vit/patch_embed/kernel"], (_PATCH, _PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["vit/patch_embed/bias"]
    tokens = h.reshape(b, _GRID * _GRID, _VIT_DIM)
    cls = jnp.broadcast_to(p["vit/cls_token"], (b, 1, _VIT_DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1) + p["vit/pos_embed"]
    feats = []
    for i in range(_VIT_DEPTH):
        n = f"vit/block{i}"
        tokens = tokens + _mha(_ln(tokens, p, f"{n}/norm1"), p, f"{n}/attn", _VIT_HEADS)
        y = _ln(tokens, p, f"{n}/norm2")
        y = _linear(y, p, f"{n}/mlp1")
        y = jax.nn.gelu(y, approximate=False)
        tokens = tokens + _linear(y, p, f"{n}/mlp2")
        if i in _FEAT_BLOCKS:
            feats.append(tokens[:, 1:])  # drop CLS
    return jnp.concatenate(feats, axis=2)  # (B, 784, 4*768)


def _tab(x, p, name):
    """Transposed attention block (official models/maniqa.py TABlock):
    attention ACROSS channels; q/k/v are linear maps over the spatial dim.

    Includes the official ``(attn @ v).transpose(1, 2).reshape(B, C, N)``
    idiom: with C != N that transpose+reshape is a genuine deterministic
    entry permutation (NOT a no-op) which the released weights were trained
    through — parity requires reproducing it (tests/iqa_oracles.py)."""
    q = _linear(x, p, f"{name}/c_q")
    k = _linear(x, p, f"{name}/c_k")
    v = _linear(x, p, f"{name}/c_v")
    b, c, n = x.shape
    a = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) * n**-0.5, axis=-1)  # (B,C,C)
    o = jnp.swapaxes(a @ v, 1, 2).reshape(b, c, n)
    return o + x


def _rel_position_index(window: int) -> np.ndarray:
    """Swin relative-position index for a window x window grid
    -> (W^2, W^2) int indices into the (2W-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, W^2)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _shift_attn_mask(hw: int, window: int, shift: int) -> np.ndarray:
    """Swin shifted-window attention mask (swin_transformer.py img_mask):
    (num_windows, W^2, W^2) with 0 / -100 entries."""
    img_mask = np.zeros((hw, hw), np.int32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    nw = hw // window
    wins = img_mask.reshape(nw, window, nw, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(nw * nw, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_attn(x, p, name, heads, shift):
    """Swin WindowAttention on (B, H, W, C): cyclic shift + windowed MHSA
    with relative-position bias and the standard shifted-window attention
    mask (official MANIQA models/swin.py adapts Swin's WindowAttention
    verbatim, incl. relative_position_bias_table — ADVICE r2)."""
    b, hh, ww, c = x.shape
    if shift:
        x = jnp.roll(x, (-_WINDOW // 2, -_WINDOW // 2), axis=(1, 2))
    nwh, nww = hh // _WINDOW, ww // _WINDOW
    nw = nwh * nww
    wsq = _WINDOW * _WINDOW
    xw = x.reshape(b, nwh, _WINDOW, nww, _WINDOW, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nw, wsq, c)

    dh = c // heads
    qkv = _linear(xw, p, f"{name}/qkv").reshape(b * nw, wsq, 3, heads, dh)
    q, k, v = jnp.moveaxis(qkv, 2, 0)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # (B*nw, h, wsq, dh)
    s = q @ jnp.swapaxes(k, -1, -2) * dh**-0.5
    bias = p[f"{name}/rel_bias_table"][jnp.asarray(_rel_position_index(_WINDOW))]
    s = s + jnp.transpose(bias, (2, 0, 1))[None]  # (1, h, wsq, wsq)
    if shift:
        am = jnp.asarray(_shift_attn_mask(hh, _WINDOW, _WINDOW // 2))
        s = s.reshape(b, nw, heads, wsq, wsq) + am[None, :, None]
        s = s.reshape(b * nw, heads, wsq, wsq)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.swapaxes(a @ v, 1, 2).reshape(b * nw, wsq, c)
    o = _linear(o, p, f"{name}/proj")

    o = o.reshape(b, nwh, nww, _WINDOW, _WINDOW, c).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hh, ww, c)
    if shift:
        o = jnp.roll(o, (_WINDOW // 2, _WINDOW // 2), axis=(1, 2))
    return o


def _swin_stage(x, p, name, dim):
    """Official MANIQA SwinTransformer stage: ``_SWIN_LAYERS`` BasicLayers
    of ``_SWIN_DEPTH`` standard Swin blocks (plain transformer residuals),
    with the 0.8 residual scale applied per LAYER:
    ``x = scale * layer(x) + x`` (models/swin.py forward)."""
    for l in range(_SWIN_LAYERS):
        x_in = x
        for d in range(_SWIN_DEPTH):
            n = f"{name}/layer{l}/block{d}"
            # official swin blocks use nn.LayerNorm default eps=1e-5
            # (unlike the timm ViT trunk's 1e-6)
            y = _ln(x, p, f"{n}/norm1", eps=1e-5)
            y = _window_attn(y, p, f"{n}/attn", _SWIN_HEADS, shift=(d % 2 == 1))
            x = x + y
            y = _ln(x, p, f"{n}/norm2", eps=1e-5)
            y = _linear(y, p, f"{n}/mlp1")
            y = jax.nn.gelu(y, approximate=False)
            x = x + _linear(y, p, f"{n}/mlp2")
        x = _SCALE * x + x_in
    return x


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def maniqa_forward(params: Dict[str, jnp.ndarray], img01: jnp.ndarray) -> jnp.ndarray:
    """Score a batch of (B, 224, 224, 3) RGB [0,1] crops -> (B,) in [0,1]."""
    x = (img01 - _IMAGENET_MEAN) / _IMAGENET_STD
    f = _vit_forward(params, x)  # (B, N=784, C=3072)
    x = jnp.swapaxes(f, 1, 2)  # (B, C, N) — TAB attends across channels
    for i in range(_NUM_TAB):
        x = _tab(x, params, f"tab1_{i}")
    x = x.reshape(-1, 4 * _EMBED, _GRID, _GRID).transpose(0, 2, 3, 1)  # NHWC
    x = jax.lax.conv_general_dilated(
        x, params["conv1/kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv1/bias"]
    x = _swin_stage(x, params, "swin1", _EMBED)
    x = x.transpose(0, 3, 1, 2).reshape(-1, _EMBED, _GRID * _GRID)  # (B,C,N)
    for i in range(_NUM_TAB):
        x = _tab(x, params, f"tab2_{i}")
    x = x.reshape(-1, _EMBED, _GRID, _GRID).transpose(0, 2, 3, 1)
    x = jax.lax.conv_general_dilated(
        x, params["conv2/kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv2/bias"]
    x = _swin_stage(x, params, "swin2", _EMBED // 2)
    tok = x.reshape(-1, _GRID * _GRID, _EMBED // 2)
    s = _linear(tok, params, "fc_score1")
    s = jax.nn.relu(s)
    s = _linear(s, params, "fc_score2")
    s = jax.nn.relu(s)  # (B, N, 1)
    w = _linear(tok, params, "fc_weight1")
    w = jax.nn.relu(w)
    w = _linear(w, params, "fc_weight2")
    w = jax.nn.sigmoid(w)
    return (s * w).sum(axis=(1, 2)) / jnp.maximum(w.sum(axis=(1, 2)), 1e-8)


class MANIQA:
    """Callable wrapper: crops the input to 224 center (or averages random
    crops like pyiqa when ``num_crops`` > 1) and scores it."""

    def __init__(self, params: Dict[str, jnp.ndarray], num_crops: int = 1, seed: int = 0):
        self.params = params
        self.num_crops = num_crops
        self.seed = seed
        self._fwd = jax.jit(maniqa_forward)

    def __call__(self, img01: np.ndarray) -> np.ndarray:
        img01 = np.asarray(img01, np.float32)
        if img01.ndim == 3:
            img01 = img01[None]
        b, h, w, _ = img01.shape
        rng = np.random.default_rng(self.seed)
        scores = []
        for i in range(self.num_crops):
            if self.num_crops == 1 or (h == _IMG and w == _IMG):
                top, left = max((h - _IMG) // 2, 0), max((w - _IMG) // 2, 0)
            else:
                top = rng.integers(0, max(h - _IMG, 0) + 1)
                left = rng.integers(0, max(w - _IMG, 0) + 1)
            crop = img01[:, top : top + _IMG, left : left + _IMG]
            if crop.shape[1] != _IMG or crop.shape[2] != _IMG:
                crop = np.pad(
                    crop,
                    ((0, 0), (0, _IMG - crop.shape[1]), (0, _IMG - crop.shape[2]), (0, 0)),
                    mode="reflect",
                )
            scores.append(np.asarray(self._fwd(self.params, jnp.asarray(crop))))
        return np.mean(scores, axis=0)


def init_random_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random-init parameter tree (shape contract for tests / importer)."""
    rng = np.random.default_rng(seed)

    def t(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0] if len(shape) == 2 else np.prod(shape[:-1]))
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    p = {
        "vit/patch_embed/kernel": t(_PATCH, _PATCH, 3, _VIT_DIM),
        "vit/patch_embed/bias": jnp.zeros((_VIT_DIM,)),
        "vit/cls_token": t(1, _VIT_DIM, scale=0.02),
        "vit/pos_embed": t(1, _GRID * _GRID + 1, _VIT_DIM, scale=0.02),
    }

    def lin(name, din, dout):
        p[f"{name}/kernel"] = t(din, dout)
        p[f"{name}/bias"] = jnp.zeros((dout,))

    def lnp(name, d):
        p[f"{name}/scale"] = jnp.ones((d,))
        p[f"{name}/bias"] = jnp.zeros((d,))

    for i in range(_VIT_DEPTH):
        n = f"vit/block{i}"
        lnp(f"{n}/norm1", _VIT_DIM)
        lin(f"{n}/attn/qkv", _VIT_DIM, 3 * _VIT_DIM)
        lin(f"{n}/attn/proj", _VIT_DIM, _VIT_DIM)
        lnp(f"{n}/norm2", _VIT_DIM)
        lin(f"{n}/mlp1", _VIT_DIM, 4 * _VIT_DIM)
        lin(f"{n}/mlp2", 4 * _VIT_DIM, _VIT_DIM)
    n_sp = _GRID * _GRID
    for i in range(_NUM_TAB):
        for nm in (f"tab1_{i}", f"tab2_{i}"):
            lin(f"{nm}/c_q", n_sp, n_sp)
            lin(f"{nm}/c_k", n_sp, n_sp)
            lin(f"{nm}/c_v", n_sp, n_sp)
    p["conv1/kernel"] = t(1, 1, 4 * _EMBED, _EMBED)
    p["conv1/bias"] = jnp.zeros((_EMBED,))
    p["conv2/kernel"] = t(1, 1, _EMBED, _EMBED // 2)
    p["conv2/bias"] = jnp.zeros((_EMBED // 2,))
    for stage, dim in (("swin1", _EMBED), ("swin2", _EMBED // 2)):
        for l in range(_SWIN_LAYERS):
            for d in range(_SWIN_DEPTH):
                n = f"{stage}/layer{l}/block{d}"
                lnp(f"{n}/norm1", dim)
                lin(f"{n}/attn/qkv", dim, 3 * dim)
                lin(f"{n}/attn/proj", dim, dim)
                p[f"{n}/attn/rel_bias_table"] = t(
                    (2 * _WINDOW - 1) ** 2, _SWIN_HEADS, scale=0.02
                )
                lnp(f"{n}/norm2", dim)
                lin(f"{n}/mlp1", dim, _DIM_MLP)
                lin(f"{n}/mlp2", _DIM_MLP, dim)
    lin("fc_score1", _EMBED // 2, _EMBED // 2)
    lin("fc_score2", _EMBED // 2, 1)
    lin("fc_weight1", _EMBED // 2, _EMBED // 2)
    lin("fc_weight2", _EMBED // 2, 1)
    return p


def params_from_torch(sd: Dict[str, "np.ndarray"]) -> Dict[str, jnp.ndarray]:
    """Convert an official MANIQA checkpoint (IIGROUP/MANIQA ``maniqa.py``
    module names; pyiqa ships the same graph) to the functional tree.

    Raises with the full list of unmatched checkpoint keys so a renamed
    release is a visible fix. Tensors: torch Linear weights are (out, in) ->
    transposed; convs OIHW -> HWIO.
    """
    import torch

    def a(k):
        v = sd.pop(k)
        return jnp.asarray(
            v.detach().float().numpy() if isinstance(v, torch.Tensor) else np.asarray(v, np.float32)
        )

    sd = {k.replace("module.", "", 1): v for k, v in sd.items()}
    p = {}

    def lin(dst, src):
        p[f"{dst}/kernel"] = jnp.swapaxes(a(f"{src}.weight"), 0, 1)
        p[f"{dst}/bias"] = a(f"{src}.bias")

    def lnp(dst, src):
        p[f"{dst}/scale"] = a(f"{src}.weight")
        p[f"{dst}/bias"] = a(f"{src}.bias")

    # ViT-B/8 (timm naming, embedded under 'vit.')
    p["vit/patch_embed/kernel"] = jnp.transpose(a("vit.patch_embed.proj.weight"), (2, 3, 1, 0))
    p["vit/patch_embed/bias"] = a("vit.patch_embed.proj.bias")
    p["vit/cls_token"] = a("vit.cls_token").reshape(1, _VIT_DIM)
    p["vit/pos_embed"] = a("vit.pos_embed")
    for i in range(_VIT_DEPTH):
        n, s = f"vit/block{i}", f"vit.blocks.{i}"
        lnp(f"{n}/norm1", f"{s}.norm1")
        lin(f"{n}/attn/qkv", f"{s}.attn.qkv")
        lin(f"{n}/attn/proj", f"{s}.attn.proj")
        lnp(f"{n}/norm2", f"{s}.norm2")
        lin(f"{n}/mlp1", f"{s}.mlp.fc1")
        lin(f"{n}/mlp2", f"{s}.mlp.fc2")
    for i in range(_NUM_TAB):
        lin(f"tab1_{i}/c_q", f"tablock1.{i}.c_q")
        lin(f"tab1_{i}/c_k", f"tablock1.{i}.c_k")
        lin(f"tab1_{i}/c_v", f"tablock1.{i}.c_v")
        lin(f"tab2_{i}/c_q", f"tablock2.{i}.c_q")
        lin(f"tab2_{i}/c_k", f"tablock2.{i}.c_k")
        lin(f"tab2_{i}/c_v", f"tablock2.{i}.c_v")
    p["conv1/kernel"] = jnp.transpose(a("conv1.weight"), (2, 3, 1, 0))
    p["conv1/bias"] = a("conv1.bias")
    p["conv2/kernel"] = jnp.transpose(a("conv2.weight"), (2, 3, 1, 0))
    p["conv2/bias"] = a("conv2.bias")
    for stage, src in (("swin1", "swintransformer1"), ("swin2", "swintransformer2")):
        for l in range(_SWIN_LAYERS):
            for d in range(_SWIN_DEPTH):
                n = f"{stage}/layer{l}/block{d}"
                s = f"{src}.layers.{l}.blocks.{d}"
                lnp(f"{n}/norm1", f"{s}.norm1")
                lin(f"{n}/attn/qkv", f"{s}.attn.qkv")
                lin(f"{n}/attn/proj", f"{s}.attn.proj")
                p[f"{n}/attn/rel_bias_table"] = a(
                    f"{s}.attn.relative_position_bias_table"
                )
                lnp(f"{n}/norm2", f"{s}.norm2")
                lin(f"{n}/mlp1", f"{s}.mlp.fc1")
                lin(f"{n}/mlp2", f"{s}.mlp.fc2")
    lin("fc_score1", "fc_score.0")
    lin("fc_score2", "fc_score.3")
    lin("fc_weight1", "fc_weight.0")
    lin("fc_weight2", "fc_weight.3")

    # the timm trunk carries extra heads/norms we don't use (vit.norm, head);
    # relative_position_index / attn_mask are deterministic buffers we
    # recompute (standard Swin registers them in the state dict)
    ignorable = ("vit.norm.", "vit.head", "vit.pre_logits")
    sd = {
        k: v
        for k, v in sd.items()
        if not k.endswith((".relative_position_index", ".attn_mask"))
    }
    leftover = [k for k in sd if not k.startswith(ignorable)]
    if leftover:
        raise KeyError(
            "MANIQA importer: unmatched checkpoint keys (naming drift?): "
            + ", ".join(sorted(leftover)[:20])
        )
    return p
