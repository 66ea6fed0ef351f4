"""Host-side image IO + the CLI's resize/pad conventions.

Parity target: reference ``utils/image/common.py`` (``auto_resize``: short
edge up to >= size via PIL bicubic; ``pad``: zero-pad bottom/right to a
multiple) and ``center_crop_arr`` (``utils/image/common.py`` / ADM center
crop used with ``--use_center_crop``).
"""

from __future__ import annotations

import math
import os
from typing import Iterable, List, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")


def list_image_files(folder: str, recursive: bool = False) -> List[str]:
    out = []
    if recursive:
        for root, _, files in os.walk(folder):
            out += [os.path.join(root, f) for f in files if f.lower().endswith(IMG_EXTS)]
    else:
        out = [
            os.path.join(folder, f)
            for f in sorted(os.listdir(folder))
            if f.lower().endswith(IMG_EXTS)
        ]
    return sorted(out)


def load_image(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def save_image(arr01: np.ndarray, path: str) -> None:
    """[0,1] HWC float -> PNG."""
    img = np.clip(arr01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def auto_resize(img: Image.Image, size: int) -> Image.Image:
    """Upscale so the short edge >= size (PIL bicubic), else copy."""
    short_edge = min(img.size)
    if short_edge < size:
        r = size / short_edge
        img = img.resize(tuple(math.ceil(x * r) for x in img.size), Image.BICUBIC)
    else:
        img = img.copy()
    return img


def pad_to_multiple(img: np.ndarray, scale: int) -> np.ndarray:
    """Zero-pad bottom/right so H, W are multiples of ``scale``."""
    h, w = img.shape[:2]
    ph = (scale - h % scale) % scale
    pw = (scale - w % scale) % scale
    if ph == 0 and pw == 0:
        return img
    return np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="constant")


def center_crop_arr(img: Image.Image, size: int) -> np.ndarray:
    """ADM-style center crop: downsample by halves, then bicubic to short
    edge == size, then center crop (utils/image/common.py center_crop_arr)."""
    while min(*img.size) >= 2 * size:
        img = img.resize(tuple(x // 2 for x in img.size), Image.BOX)
    scale = size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size), Image.BICUBIC)
    arr = np.array(img)
    y = (arr.shape[0] - size) // 2
    x = (arr.shape[1] - size) // 2
    return arr[y : y + size, x : x + size]
