"""MAE-style token masking for DiT training.

Parity target: reference ``diffusion/model/utils.py:192-330`` — ``get_mask``
(random / FFT-importance / Laplacian-importance token selection),
``mask_out_token`` (gather kept tokens), ``unmask_tokens`` (scatter back
with a learned mask token). These are the reference's sequence-length
scaling levers (SURVEY.md §5) and map to static-shape gathers on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.filters import depthwise_conv2d


def _importance_laplacian(x_tokens: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Per-token magnitude of a Laplacian response (detail importance)."""
    b, n, c = x_tokens.shape
    h, w = hw
    img = x_tokens.reshape(b, h, w, c)
    k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    resp = depthwise_conv2d(img, k)
    return jnp.abs(resp).mean(axis=-1).reshape(b, n)


def _importance_fft(x_tokens: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """High-frequency energy per token (FFT high-pass importance)."""
    b, n, c = x_tokens.shape
    h, w = hw
    img = x_tokens.reshape(b, h, w, c)
    f = jnp.fft.fft2(img, axes=(1, 2))
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]
    highpass = ((jnp.abs(fy) > 0.25 / 2) | (jnp.abs(fx) > 0.25 / 2))[None, ..., None]
    hf = jnp.fft.ifft2(f * highpass, axes=(1, 2)).real
    return jnp.abs(hf).mean(axis=-1).reshape(b, n)


def get_mask_indices(
    rng: jax.Array,
    x_tokens: jnp.ndarray,
    keep_ratio: float,
    mask_type: str = "random",
    hw: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (keep_idx (B, K), restore_idx (B, N)); K = int(N * keep_ratio).

    'random' shuffles; 'fft'/'laplacian' keep the most detailed tokens with
    noise-perturbed scores (the reference's stochastic importance pick).
    """
    b, n, _ = x_tokens.shape
    k = max(1, int(n * keep_ratio))
    if mask_type == "random":
        scores = jax.random.uniform(rng, (b, n))
    else:
        imp = _importance_laplacian(x_tokens, hw) if mask_type == "laplacian" else _importance_fft(x_tokens, hw)
        imp = imp / jnp.maximum(imp.max(axis=1, keepdims=True), 1e-8)
        scores = imp + 0.1 * jax.random.uniform(rng, (b, n))
    order = jnp.argsort(-scores, axis=1)  # keep highest first
    keep_idx = order[:, :k]
    restore_idx = jnp.argsort(order, axis=1)
    return keep_idx, restore_idx


def mask_out_tokens(x: jnp.ndarray, keep_idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, K, C) gather (utils.py mask_out_token)."""
    return jnp.take_along_axis(x, keep_idx[..., None], axis=1)


def unmask_tokens(
    x_kept: jnp.ndarray, restore_idx: jnp.ndarray, mask_token: jnp.ndarray, n: int
) -> jnp.ndarray:
    """(B, K, C) + mask token -> (B, N, C) in original order."""
    b, k, c = x_kept.shape
    fill = jnp.broadcast_to(mask_token.reshape(1, 1, c), (b, n - k, c))
    full = jnp.concatenate([x_kept, fill], axis=1)
    return jnp.take_along_axis(full, restore_idx[..., None], axis=1)
