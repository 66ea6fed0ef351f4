"""Fused Pallas window attention == the XLA windowed-sdpa path.

The kernel (ops/swin_attention.py) is a MEASURED-NEGATIVE experiment
(see its STATUS docstring): nothing dispatches to it in production. This
test keeps its numerics pinned to the plain composition in interpret
mode so the record stays verifiable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from instarevive_tpu.ops import window as W
from instarevive_tpu.ops.attention import sdpa
from instarevive_tpu.ops.swin_attention import swin_window_attention


def _ref_window_attention(qkv, bias_h, mask, heads, window, scale):
    """Pure-XLA composition of the same math (partition + sdpa + reverse)."""
    b, hh, ww, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    n = window * window
    xw = W.window_partition(qkv, window)  # (B*nW, N, 3C)
    b_ = xw.shape[0]
    q, k, v = xw[..., :c], xw[..., c : 2 * c], xw[..., 2 * c :]

    def split(t):  # (B_, N, C) -> (B_, H, N, hd)
        return jnp.transpose(t.reshape(b_, n, heads, hd), (0, 2, 1, 3))

    bias = bias_h[None]  # (1, H, N, N)
    if mask is not None:
        nw = mask.shape[0]
        bias = bias + jnp.tile(jnp.asarray(mask)[:, None], (b_ // nw, 1, 1, 1))
    out = sdpa(split(q), split(k), split(v), bias=bias, scale=scale)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, n, c)
    return W.window_reverse(out, window, hh, ww)


@pytest.mark.parametrize("shifted", [False, True])
def test_kernel_matches_sdpa_composition(shifted):
    heads, window, c = 6, 8, 60
    hh = ww = 16
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, hh, ww, 3 * c)), jnp.float32)
    bias_h = jnp.asarray(rng.standard_normal((heads, 64, 64)), jnp.float32) * 0.1
    mask = W.shift_attn_mask(hh, ww, window, window // 2) if shifted else None
    scale = (c // heads) ** -0.5

    got = swin_window_attention(qkv, bias_h, None if mask is None else jnp.asarray(mask),
                                heads, window, scale, interpret=True)
    want = _ref_window_attention(qkv, bias_h, mask, heads, window, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
