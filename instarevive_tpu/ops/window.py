"""Window partitioning utilities for Swin-style attention (NHWC).

Parity target: reference ``diffusion/model/swinir.py:25-74`` (window_partition
/ window_reverse, shifted-window attention masks) and the ViT-det windowing in
``diffusion/model/utils.py:74-120``. Masks and relative-position indices are
static (numpy at trace time); the roll for shifted windows is an on-device
``jnp.roll``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWindows, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window * window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """(B * nWindows, window*window, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=64)
def relative_position_index(window: int) -> np.ndarray:
    """Swin relative-position bias lookup index, shape (win^2, win^2)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask for shifted windows.

    Returns (nWindows, win^2, win^2) float32 with 0 / -100 entries, matching
    the Swin convention (swinir.py:calculate_mask).
    """
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    m = img_mask.reshape(h // window, window, w // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=64)
def shift_window_perm(h: int, w: int, window: int, shift: int) -> Tuple[np.ndarray, np.ndarray]:
    """Token permutations realizing the cyclic shift IN window layout.

    Let ``win(x) = window_partition(x, window).reshape(B, H*W, C)`` (tokens
    ordered window-major, row-major within each window). Returns static
    int32 ``(perm, inv)`` with

        win(roll(x, (-shift, -shift)))  ==  win(x)[:, perm]
        win(roll(x, (+shift, +shift)))  ==  win(x)[:, inv]

    so a shifted Swin block never leaves window layout: the roll-in/out
    pair becomes two gathers instead of window_reverse -> jnp.roll ->
    window_partition (three full-tensor strided copies each way). Math
    parity with the reference's torch.roll path (swinir.py:230-259) is
    pinned by tests/test_swinir.py.
    """
    sp = np.arange(h * w).reshape(h, w)

    def to_win(a: np.ndarray) -> np.ndarray:
        return (
            a.reshape(h // window, window, w // window, window)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    base = to_win(sp)  # window-layout position -> spatial flat id
    pos_of_spatial = np.empty(h * w, np.int64)
    pos_of_spatial[base] = np.arange(h * w)
    rolled = to_win(np.roll(sp, (-shift, -shift), axis=(0, 1)))
    perm = pos_of_spatial[rolled].astype(np.int32)
    inv = np.empty(h * w, np.int32)
    inv[perm] = np.arange(h * w, dtype=np.int32)
    return perm, inv


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll H and W by -shift (NHWC)."""
    return jnp.roll(x, (-shift, -shift), axis=(1, 2))


def cyclic_unshift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return jnp.roll(x, (shift, shift), axis=(1, 2))


def pad_to_multiple(x: jnp.ndarray, multiple: int, mode: str = "reflect") -> Tuple[jnp.ndarray, int, int]:
    """Pad NHWC H/W up to a multiple; returns (padded, orig_h, orig_w)."""
    b, h, w, c = x.shape
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    return x, h, w
