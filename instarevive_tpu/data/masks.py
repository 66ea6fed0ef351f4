"""Inpainting mask synthesis (brush strokes) + 8-mode augmentation.

Parity targets: reference ``dataset/codeformer.py:20-70``
(``brush_stroke_mask``: random multi-vertex strokes with joints, the
Codeformer_Mask_prompt dataset's inpaint masks — host-side numpy/PIL, like
the reference) and ``utils/util_image.py`` ``data_aug_np`` (8-mode
flip/rotate dihedral augmentation — on-device jnp here).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image, ImageDraw

import jax.numpy as jnp


def brush_stroke_mask(
    rng: np.random.Generator,
    hw: Tuple[int, int] = (512, 512),
    min_num_vertex: int = 4,
    max_num_vertex: int = 12,
    mean_angle: float = 2 * math.pi / 5,
    angle_range: float = 2 * math.pi / 15,
    min_width: int = 12,
    max_width: int = 40,
) -> np.ndarray:
    """Random brush-stroke mask, 1 = hole; returns (H, W) float32."""
    h, w = hw
    average_radius = math.sqrt(h * h + w * w) / 8
    mask = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(mask)
    for _ in range(int(rng.integers(1, 4))):
        num_vertex = int(rng.integers(min_num_vertex, max_num_vertex))
        angle_min = mean_angle - rng.uniform(0, angle_range)
        angle_max = mean_angle + rng.uniform(0, angle_range)
        angles = []
        for i in range(num_vertex):
            a = rng.uniform(angle_min, angle_max)
            angles.append(2 * math.pi - a if i % 2 == 0 else a)

        vertex = [(int(rng.integers(0, w)), int(rng.integers(0, h)))]
        for a in angles:
            r = float(np.clip(rng.normal(average_radius, average_radius // 2), 0, 2 * average_radius))
            x = np.clip(vertex[-1][0] + r * math.cos(a), 0, w)
            y = np.clip(vertex[-1][1] + r * math.sin(a), 0, h)
            vertex.append((int(x), int(y)))

        width = int(rng.uniform(min_width, max_width))
        draw.line(vertex, fill=1, width=width)
        for v in vertex:
            draw.ellipse(
                (v[0] - width // 2, v[1] - width // 2, v[0] + width // 2, v[1] + width // 2),
                fill=1,
            )
    if rng.random() > 0.5:
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    if rng.random() > 0.5:
        mask = mask.transpose(Image.FLIP_TOP_BOTTOM)
    return np.asarray(mask, np.float32)


def augment_dihedral(img: jnp.ndarray, mode: int) -> jnp.ndarray:
    """8-mode flip/rot augmentation on NHWC (util_image data_aug_np):
    mode 0-3 = rot90 x mode; 4-7 = flipud then rot90 x (mode-4)."""
    if mode >= 4:
        img = img[:, ::-1]
        mode -= 4
    return jnp.rot90(img, k=mode, axes=(1, 2))


def invert_augment_dihedral(img: jnp.ndarray, mode: int) -> jnp.ndarray:
    if mode < 4:
        return jnp.rot90(img, k=-mode, axes=(1, 2))
    out = jnp.rot90(img, k=-(mode - 4), axes=(1, 2))
    return out[:, ::-1]
