"""MUSIQ no-reference IQA network (multi-scale image quality transformer).

Parity target: the reference metric set ``evaluate_img.py:13-33`` creates
``pyiqa.create_metric('musiq')`` — the Google multi-scale IQA transformer
(Ke et al., ICCV 2021): the image is represented at its NATIVE resolution
plus aspect-ratio-preserving resizes (longer side 384 and 224); every scale
is cut into 32x32 patches, each patch is encoded by the paper's 5-layer
ResNet root (WS-conv 7x7/2 + GN + maxpool + one bottleneck unit 64->256) +
linear projection, and all patches from all scales go through ONE
transformer encoder with (a) a hash-based 2-D spatial embedding on a GxG
grid (G=10) shared across scales and (b) a learned per-scale embedding,
plus a CLS token whose final state regresses the score.

This multi-resolution design is why MUSIQ handles arbitrary input sizes
without the fixed-crop compromise of ViT metrics. Patch counts are dynamic
per image; for XLA-friendliness we pad each scale's patch sequence to a
static cap and mask (same convention as the text masks in the DiT).

Zero-egress note: pretrained weights cannot ship here; ``params_from_torch``
imports a pyiqa-format checkpoint (which itself ports the official JAX
release) and raises listing unmatched keys on naming drift, per the
LPIPS/CLIP importer pattern.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_P = 32  # patch size
_D = 384  # transformer hidden size
_LAYERS = 14
_HEADS = 6
_MLP = 1152
_GRID = 10  # hash-based spatial grid
_SCALES = (0, 384, 224)  # 0 = native resolution
_MAX_SEQ = 512  # static per-image patch cap (native 512x512 -> 256 patches)
_ROOT_W = 64  # ResNet-root width (conv_root / bottleneck cmid)
_ROOT_OUT = 256  # bottleneck output channels
_ROOT_HW = _P // 4  # patch spatial size after root (stride-2 conv + pool)


def _ln(x, p, name):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-6) * p[f"{name}/scale"] + p[f"{name}/bias"]


def _linear(x, p, name):
    return x @ p[f"{name}/kernel"] + p[f"{name}/bias"]


def _encoder_block(x, mask, p, name):
    b, n, d = x.shape
    y = _ln(x, p, f"{name}/norm1")
    qkv = _linear(y, p, f"{name}/qkv").reshape(b, n, 3, _HEADS, d // _HEADS)
    q, k, v = jnp.moveaxis(qkv, 2, 0)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    s = q @ jnp.swapaxes(k, -1, -2) * (d // _HEADS) ** -0.5
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.swapaxes(a @ v, 1, 2).reshape(b, n, d)
    x = x + _linear(o, p, f"{name}/proj")
    y = _ln(x, p, f"{name}/norm2")
    y = _linear(y, p, f"{name}/mlp1")
    y = jax.nn.gelu(y, approximate=False)
    return x + _linear(y, p, f"{name}/mlp2")


def _patchify(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Cut an HWC image into P x P patches (pad to multiples of P).
    Returns (patches (N, P*P*3), row_idx, col_idx, n_rows, n_cols)."""
    h, w, c = img.shape
    ph, pw = -(-h // _P), -(-w // _P)
    img = np.pad(img, ((0, ph * _P - h), (0, pw * _P - w), (0, 0)))
    x = img.reshape(ph, _P, pw, _P, c).transpose(0, 2, 1, 3, 4).reshape(ph * pw, -1)
    rows = np.repeat(np.arange(ph), pw)
    cols = np.tile(np.arange(pw), ph)
    return x, rows, cols, ph, pw


def _resize_longer(img: np.ndarray, longer: int) -> np.ndarray:
    """Aspect-ratio-preserving resize so max(h, w) == longer (area resample
    like the official preprocessing)."""
    from instarevive_tpu.ops.resize import interpolate

    h, w = img.shape[:2]
    s = longer / max(h, w)
    nh, nw = max(int(round(h * s)), _P), max(int(round(w * s)), _P)
    out = interpolate(jnp.asarray(img)[None], (nh, nw), mode="area")[0]
    return np.asarray(out)


def musiq_prepare(img01: np.ndarray):
    """Host-side multi-scale patch extraction for ONE image.
    Returns (patches, spatial_hash, scale_ids, mask): all (_MAX_SEQ*len(
    _SCALES)+1,)-shaped device-ready arrays incl. the CLS slot 0."""
    seqs, hashes, scales, masks = [], [], [], []
    for si, longer in enumerate(_SCALES):
        im = img01 if longer == 0 else _resize_longer(img01, longer)
        x, rows, cols, ph, pw = _patchify(im.astype(np.float32))
        # hash-based 2D embedding index on a G x G grid (paper eq. 2)
        gr = np.minimum((rows * _GRID) // max(ph, 1), _GRID - 1)
        gc = np.minimum((cols * _GRID) // max(pw, 1), _GRID - 1)
        hidx = gr * _GRID + gc
        n = min(len(x), _MAX_SEQ)
        pad = _MAX_SEQ - n
        seqs.append(np.pad(x[:n], ((0, pad), (0, 0))))
        hashes.append(np.pad(hidx[:n], (0, pad)))
        scales.append(np.full(_MAX_SEQ, si, np.int32))
        masks.append(np.arange(_MAX_SEQ) < n)
    return (
        np.concatenate(seqs, 0),
        np.concatenate(hashes, 0).astype(np.int32),
        np.concatenate(scales, 0),
        np.concatenate(masks, 0),
    )


def musiq_forward(params, patches, hash_idx, scale_ids, mask) -> jnp.ndarray:
    """Batched transformer over prepared patch sequences.

    patches: (B, N, P*P*3), hash_idx/scale_ids: (B, N) int32, mask: (B, N).
    Returns (B,) scores (single-output head; the AVA variant's 10-way
    distribution head reduces to its mean under the importer).
    """
    p = params
    b, n, _ = patches.shape
    x = patches.reshape(b, n, _P, _P, 3)
    # ResNet patch-encoding root (paper §3.1 "5-layer ResNet root";
    # BiT/ViT-hybrid layout: WS-conv 7x7/2 'conv_root' + GN + relu +
    # maxpool 3x3/2 + one PreActBottleneck unit 64->256), then projection.
    # Weight standardization is folded into the stored kernels at import.
    x = x.reshape(b * n, _P, _P, 3)

    def conv(x, name, stride=1, padding="SAME"):
        return jax.lax.conv_general_dilated(
            x, p[f"{name}/kernel"], (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def gn(x, name, groups=32):
        c = x.shape[-1]
        g = min(groups, c)
        xg = x.reshape(*x.shape[:-1], g, c // g)
        mu = xg.mean((-4, -3, -1), keepdims=True)
        var = ((xg - mu) ** 2).mean((-4, -3, -1), keepdims=True)
        xg = (xg - mu) / jnp.sqrt(var + 1e-6)
        return xg.reshape(x.shape) * p[f"{name}/scale"] + p[f"{name}/bias"]

    # torch-port padding semantics, NOT XLA "SAME": Conv2d(7, stride=2,
    # padding=3) pads (3, 3) where SAME would pad (2, 3) on even inputs
    # (one-pixel alignment shift), and MaxPool2d(3, 2, padding=1) pads
    # (1, 1) where SAME pads (0, 1). Verified against the torch oracle
    # (tests/iqa_oracles.py TorchMUSIQ).
    x = conv(x, "conv_root", stride=2, padding=((3, 3), (3, 3)))  # 32 -> 16
    x = jax.nn.relu(gn(x, "gn_root"))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )  # 16 -> 8
    res = gn(conv(x, "unit1/downsample"), "unit1/gn_proj", groups=_ROOT_OUT)
    y = jax.nn.relu(gn(conv(x, "unit1/conv1"), "unit1/gn1"))
    y = jax.nn.relu(gn(conv(y, "unit1/conv2"), "unit1/gn2"))
    y = gn(conv(y, "unit1/conv3"), "unit1/gn3")
    x = jax.nn.relu(res + y)  # (B*N, 8, 8, 256)

    x = x.reshape(b, n, -1)
    x = _linear(x, p, "embed")  # (B, N, D)
    x = x + p["spatial_embed"][hash_idx] + p["scale_embed"][scale_ids]

    cls = jnp.broadcast_to(p["cls"], (b, 1, _D))
    x = jnp.concatenate([cls, x], axis=1)
    mask = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)
    for i in range(_LAYERS):
        x = _encoder_block(x, mask, p, f"block{i}")
    x = _ln(x, p, "norm")
    out = _linear(x[:, 0], p, "head")  # (B, O)
    if out.shape[-1] > 1:  # AVA 10-way distribution head -> mean score
        bins = jnp.arange(1, out.shape[-1] + 1, dtype=out.dtype)
        return (jax.nn.softmax(out, -1) * bins).sum(-1)
    return out[:, 0]


class MUSIQ:
    """Callable wrapper: host-side multi-scale patchify + jitted transformer."""

    def __init__(self, params: Dict[str, jnp.ndarray]):
        self.params = params
        self._fwd = jax.jit(musiq_forward)

    def __call__(self, img01: np.ndarray) -> np.ndarray:
        img01 = np.asarray(img01, np.float32)
        if img01.ndim == 3:
            img01 = img01[None]
        prepped = [musiq_prepare(im) for im in img01]
        patches = jnp.asarray(np.stack([q[0] for q in prepped]))
        hidx = jnp.asarray(np.stack([q[1] for q in prepped]))
        sid = jnp.asarray(np.stack([q[2] for q in prepped]))
        mask = jnp.asarray(np.stack([q[3] for q in prepped]))
        return np.asarray(self._fwd(self.params, patches, hidx, sid, mask))


def init_random_params(seed: int = 0, head_out: int = 1) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)

    def t(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(
            shape[0] if len(shape) == 2 else np.prod(shape[:-1])
        )
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    flat = _ROOT_HW * _ROOT_HW * _ROOT_OUT
    p = {
        "conv_root/kernel": t(7, 7, 3, _ROOT_W),
        "gn_root/scale": jnp.ones((_ROOT_W,)),
        "gn_root/bias": jnp.zeros((_ROOT_W,)),
        "unit1/conv1/kernel": t(1, 1, _ROOT_W, _ROOT_W),
        "unit1/gn1/scale": jnp.ones((_ROOT_W,)),
        "unit1/gn1/bias": jnp.zeros((_ROOT_W,)),
        "unit1/conv2/kernel": t(3, 3, _ROOT_W, _ROOT_W),
        "unit1/gn2/scale": jnp.ones((_ROOT_W,)),
        "unit1/gn2/bias": jnp.zeros((_ROOT_W,)),
        "unit1/conv3/kernel": t(1, 1, _ROOT_W, _ROOT_OUT),
        "unit1/gn3/scale": jnp.ones((_ROOT_OUT,)),
        "unit1/gn3/bias": jnp.zeros((_ROOT_OUT,)),
        "unit1/downsample/kernel": t(1, 1, _ROOT_W, _ROOT_OUT),
        "unit1/gn_proj/scale": jnp.ones((_ROOT_OUT,)),
        "unit1/gn_proj/bias": jnp.zeros((_ROOT_OUT,)),
        "embed/kernel": t(flat, _D),
        "embed/bias": jnp.zeros((_D,)),
        "spatial_embed": t(_GRID * _GRID, _D, scale=0.02),
        "scale_embed": t(len(_SCALES), _D, scale=0.02),
        "cls": t(1, _D, scale=0.02),
        "norm/scale": jnp.ones((_D,)),
        "norm/bias": jnp.zeros((_D,)),
        "head/kernel": t(_D, head_out),
        "head/bias": jnp.zeros((head_out,)),
    }
    for i in range(_LAYERS):
        n = f"block{i}"
        p[f"{n}/norm1/scale"] = jnp.ones((_D,))
        p[f"{n}/norm1/bias"] = jnp.zeros((_D,))
        p[f"{n}/qkv/kernel"] = t(_D, 3 * _D)
        p[f"{n}/qkv/bias"] = jnp.zeros((3 * _D,))
        p[f"{n}/proj/kernel"] = t(_D, _D)
        p[f"{n}/proj/bias"] = jnp.zeros((_D,))
        p[f"{n}/norm2/scale"] = jnp.ones((_D,))
        p[f"{n}/norm2/bias"] = jnp.zeros((_D,))
        p[f"{n}/mlp1/kernel"] = t(_D, _MLP)
        p[f"{n}/mlp1/bias"] = jnp.zeros((_MLP,))
        p[f"{n}/mlp2/kernel"] = t(_MLP, _D)
        p[f"{n}/mlp2/bias"] = jnp.zeros((_D,))
    return p


def save_params_npz(path: str, params: Dict[str, jnp.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def params_from_npz(path: str) -> Dict[str, jnp.ndarray]:
    """Load the native checkpoint format (a flat npz of this module's
    parameter names) — the persistence target after a one-time fit of a
    foreign checkpoint via the raised key listing in params_from_torch."""
    f = np.load(path)
    return {k: jnp.asarray(f[k]) for k in f.files}


def _std_conv_kernel(w_oihw: np.ndarray) -> np.ndarray:
    """Fold BiT weight standardization (per-output-channel zero-mean /
    unit-var over (in, kh, kw)) into the stored kernel, OIHW -> HWIO."""
    w = np.asarray(w_oihw, np.float32)
    mu = w.mean(axis=(1, 2, 3), keepdims=True)
    var = w.var(axis=(1, 2, 3), keepdims=True)
    w = (w - mu) / np.sqrt(var + 1e-10)
    return w.transpose(2, 3, 1, 0)


# The torch-side key layout this importer consumes (also the literal list
# tests/test_iqa_nets.py asserts against). It follows the structure of the
# pyiqa/anse3832 MUSIQ port — BiT/ViT-hybrid ResNet-root naming
# (conv_root / gn_root / block1.unit1.{gn1..3, conv1..3, downsample,
# gn_proj}) + ViT-pytorch-style transformer naming (attention_norm /
# attn.query|key|value|out / ffn_norm / ffn.fc1|fc2 / encoder_norm).
# Reconstructed without checkpoint access (zero egress): if a concrete
# local release drifts from this, the importer raises with the exact
# unmatched keys, never silently corrupts. `params_from_npz` remains the
# native persistence format.
_TORCH_DIALECT = {
    "cls": "transformer_encoder.cls_token",
    "spatial_embed": "transformer_encoder.pos_emb",
    "scale_embed": "transformer_encoder.scale_emb",
}


def params_from_torch(sd: Dict[str, "np.ndarray"]) -> Dict[str, jnp.ndarray]:
    """Import a torch MUSIQ checkpoint in the documented dialect (see
    ``_TORCH_DIALECT`` comment). Tensor conventions: Linear (out,in) ->
    transposed; convs OIHW -> HWIO with BiT weight standardization folded
    in; the 10-way AVA head is kept as-is (forward reduces it to a mean).
    Raises with the full unmatched-key list on naming drift."""
    import torch

    sd = dict(sd)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    def a(k):
        if k not in sd:
            raise KeyError(
                f"MUSIQ importer: missing key {k!r}; checkpoint keys: "
                + ", ".join(sorted(sd)[:20])
            )
        v = sd.pop(k)
        return (
            v.detach().float().numpy()
            if isinstance(v, torch.Tensor)
            else np.asarray(v, np.float32)
        )

    p = {}
    p["cls"] = jnp.asarray(a(_TORCH_DIALECT["cls"]).reshape(1, _D))
    p["spatial_embed"] = jnp.asarray(
        a(_TORCH_DIALECT["spatial_embed"]).reshape(-1, _D)[: _GRID * _GRID]
    )
    p["scale_embed"] = jnp.asarray(
        a(_TORCH_DIALECT["scale_embed"]).reshape(-1, _D)[: len(_SCALES)]
    )

    def lin(dst, src):
        p[f"{dst}/kernel"] = jnp.asarray(a(f"{src}.weight").T)
        p[f"{dst}/bias"] = jnp.asarray(a(f"{src}.bias"))

    def lnp(dst, src):
        p[f"{dst}/scale"] = jnp.asarray(a(f"{src}.weight"))
        p[f"{dst}/bias"] = jnp.asarray(a(f"{src}.bias"))

    def gnp(dst, src):
        p[f"{dst}/scale"] = jnp.asarray(a(f"{src}.weight"))
        p[f"{dst}/bias"] = jnp.asarray(a(f"{src}.bias"))

    # ResNet root (weight-standardized convs, no conv biases)
    p["conv_root/kernel"] = jnp.asarray(_std_conv_kernel(a("conv_root.weight")))
    gnp("gn_root", "gn_root")
    for c in ("conv1", "conv2", "conv3", "downsample"):
        p[f"unit1/{c}/kernel"] = jnp.asarray(
            _std_conv_kernel(a(f"block1.unit1.{c}.weight"))
        )
    for g in ("gn1", "gn2", "gn3", "gn_proj"):
        gnp(f"unit1/{g}", f"block1.unit1.{g}")
    # torch ports feed the embedding with `.flatten(1)` of the NCHW root
    # output — in-feature order (C, H, W); our forward flattens NHWC
    # (H, W, C). Permute the in-feature axis accordingly (the "conv-root
    # key map fit", verified against tests/iqa_oracles.py TorchMUSIQ).
    ew = a("embedding.weight")  # (D, C*H*W)
    ew = (
        ew.reshape(_D, _ROOT_OUT, _ROOT_HW, _ROOT_HW)
        .transpose(0, 2, 3, 1)
        .reshape(_D, -1)
    )
    p["embed/kernel"] = jnp.asarray(ew.T)
    p["embed/bias"] = jnp.asarray(a("embedding.bias"))

    for i in range(_LAYERS):
        n, s = f"block{i}", f"transformer_encoder.layers.{i}"
        lnp(f"{n}/norm1", f"{s}.attention_norm")
        q_w, k_w, v_w = (a(f"{s}.attn.{t}.weight") for t in ("query", "key", "value"))
        q_b, k_b, v_b = (a(f"{s}.attn.{t}.bias") for t in ("query", "key", "value"))
        p[f"{n}/qkv/kernel"] = jnp.asarray(np.concatenate([q_w.T, k_w.T, v_w.T], 1))
        p[f"{n}/qkv/bias"] = jnp.asarray(np.concatenate([q_b, k_b, v_b]))
        lin(f"{n}/proj", f"{s}.attn.out")
        lnp(f"{n}/norm2", f"{s}.ffn_norm")
        lin(f"{n}/mlp1", f"{s}.ffn.fc1")
        lin(f"{n}/mlp2", f"{s}.ffn.fc2")
    lnp("norm", "transformer_encoder.encoder_norm")
    lin("head", "head")

    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftover:
        raise KeyError(
            "MUSIQ importer: unmatched checkpoint keys (naming drift?): "
            + ", ".join(sorted(leftover)[:20])
        )
    return p
