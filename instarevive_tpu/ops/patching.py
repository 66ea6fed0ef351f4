"""Patch fold/unfold for split-input (patch-wise) diffusion.

TPU-native rebuild of the reference's LDM split-input machinery
(reference ldm/models/diffusion/ddpm.py:680-767: ``meshgrid`` /
``delta_border`` / ``get_weighting`` / ``get_fold_unfold``), which patch-
ifies an image with torch.nn.Unfold, runs the first-stage/denoiser on
each crop, and torch.nn.Fold-s the results back with a border-distance
weighting that feathers the overlaps.

Redesign rather than translation:

- Patch offsets are static at trace time, so ``unfold`` lowers to a
  stack of XLA static slices and ``fold`` to static scatter-adds — no
  im2col buffers, no dynamic shapes.
- The high-level ``patched_apply`` folds the L patches into the *batch*
  dimension and calls the wrapped function ONCE on a (B*L, kh, kw, C)
  tensor — exactly the big-batched layout the MXU wants — instead of the
  reference's per-crop Python loop.
- The border weighting (clipped normalized distance-to-border, optional
  "tie_braker" over the patch grid) is computed in numpy at trace time;
  it is a compile-time constant.

Layouts are NHWC throughout (framework convention).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "delta_border",
    "patch_weighting",
    "unfold",
    "fold",
    "patched_apply",
]


def delta_border(h: int, w: int) -> np.ndarray:
    """Normalized distance to the nearest image border (0 at border,
    0.5 at center). Matches reference ddpm.py:687-699."""
    y = np.arange(h, dtype=np.float64) / max(h - 1, 1)
    x = np.arange(w, dtype=np.float64) / max(w - 1, 1)
    dy = np.minimum(y, 1.0 - y)[:, None]
    dx = np.minimum(x, 1.0 - x)[None, :]
    return np.minimum(dy, dx)


def patch_weighting(
    kh: int,
    kw: int,
    ly: int,
    lx: int,
    clip_min_weight: float = 0.01,
    clip_max_weight: float = 0.5,
    tie_braker: bool = True,
    clip_min_tie_weight: float = 0.01,
    clip_max_tie_weight: float = 0.5,
) -> np.ndarray:
    """Per-patch feathering weights, shape (ly*lx, kh, kw).

    Each patch is weighted by its pixels' distance to the patch border
    (so overlaps blend), optionally scaled by the patch's position in
    the (ly, lx) grid ("tie_braker", reference ddpm.py:707-714) so that
    interior patches dominate border ones on overlap.
    """
    w = np.clip(delta_border(kh, kw), clip_min_weight, clip_max_weight)
    w = np.broadcast_to(w[None], (ly * lx, kh, kw)).copy()
    if tie_braker:
        lw = np.clip(delta_border(ly, lx), clip_min_tie_weight, clip_max_tie_weight)
        w *= lw.reshape(ly * lx, 1, 1)
    return w


def _grid(size: int, k: int, stride: int) -> list[int]:
    n = (size - k) // stride + 1
    if n < 1:
        raise ValueError(f"kernel {k} larger than size {size}")
    return [i * stride for i in range(n)]


def unfold(
    x: jnp.ndarray, kernel_size: Tuple[int, int], stride: Tuple[int, int]
) -> jnp.ndarray:
    """(B, H, W, C) → (B, L, kh, kw, C) patch extraction.

    Same crop set as torch.nn.Unfold with padding=0/dilation=1
    (reference ddpm.py:730), row-major over the (Ly, Lx) grid. Offsets
    are static → XLA static slices.
    """
    kh, kw = kernel_size
    oys = _grid(x.shape[1], kh, stride[0])
    oxs = _grid(x.shape[2], kw, stride[1])
    patches = [x[:, oy : oy + kh, ox : ox + kw, :] for oy in oys for ox in oxs]
    return jnp.stack(patches, axis=1)


def fold(
    patches: jnp.ndarray,
    output_hw: Tuple[int, int],
    stride: Tuple[int, int],
    weighting: np.ndarray | None = None,
    normalize: bool = True,
) -> jnp.ndarray:
    """(B, L, kh, kw, C) → (B, H, W, C) weighted overlap-add.

    With ``normalize`` the accumulated weight map divides the sum, so
    fold(unfold(x)) == x for any positive weighting — the reference gets
    the same effect by dividing by fold(weighting) (ddpm.py:735).
    """
    b, l, kh, kw, c = patches.shape
    h, w = output_hw
    oys = _grid(h, kh, stride[0])
    oxs = _grid(w, kw, stride[1])
    if len(oys) * len(oxs) != l:
        raise ValueError(
            f"{l} patches cannot tile {output_hw} with kernel {(kh, kw)} stride {stride}"
        )
    if weighting is None:
        weighting = np.ones((l, kh, kw), dtype=np.float64)
    weighting = np.asarray(weighting, dtype=np.float64).reshape(l, kh, kw)

    out = jnp.zeros((b, h, w, c), dtype=jnp.float32)
    norm = np.zeros((h, w), dtype=np.float64)
    idx = 0
    for oy in oys:
        for ox in oxs:
            wgt = weighting[idx]
            out = out.at[:, oy : oy + kh, ox : ox + kw, :].add(
                patches[:, idx].astype(jnp.float32) * wgt[None, :, :, None]
            )
            norm[oy : oy + kh, ox : ox + kw] += wgt
            idx += 1
    if normalize:
        out = out / jnp.asarray(norm[None, :, :, None], dtype=jnp.float32)
    return out.astype(patches.dtype)


def patched_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    kernel_size: Tuple[int, int],
    stride: Tuple[int, int],
    uf: int = 1,
    df: int = 1,
    **weighting_kwargs,
) -> jnp.ndarray:
    """Apply ``fn`` patch-wise with feathered overlap-add recombination.

    The TPU-shaped replacement for the reference's split-input path
    (ddpm.py:717-767): patches are folded into the batch axis and ``fn``
    is called once on (B*L, kh, kw, C); the output may change resolution
    by ``uf`` (upscale, e.g. VAE decode ×8) or ``1/df`` (downscale, e.g.
    VAE encode) and is recombined on the scaled grid with the same
    border weighting, normalized over overlaps.
    """
    if uf != 1 and df != 1:
        raise ValueError("uf and df are mutually exclusive")
    kh, kw = kernel_size
    b = x.shape[0]
    ly = len(_grid(x.shape[1], kh, stride[0]))
    lx = len(_grid(x.shape[2], kw, stride[1]))

    patches = unfold(x, kernel_size, stride)  # (B, L, kh, kw, C)
    l = patches.shape[1]
    flat = patches.reshape((b * l,) + patches.shape[2:])
    out = fn(flat)  # (B*L, kh', kw', C')
    okh, okw = out.shape[1], out.shape[2]
    exp_kh = kh * uf // df
    if okh != exp_kh or okw != kw * uf // df:
        raise ValueError(
            f"fn changed patch {kernel_size} -> {(okh, okw)}, expected scale uf={uf} df={df}"
        )
    out = out.reshape((b, l) + out.shape[1:])

    out_hw = (x.shape[1] * uf // df, x.shape[2] * uf // df)
    out_stride = (stride[0] * uf // df, stride[1] * uf // df)
    wgt = patch_weighting(okh, okw, ly, lx, **weighting_kwargs)
    return fold(out, out_hw, out_stride, weighting=wgt)
