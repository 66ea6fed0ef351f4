"""Fused GroupNorm+SiLU / upsample2x pallas kernels (interpret mode) vs
flax GroupNorm and the broadcast-reshape upsample they replace."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instarevive_tpu.ops.norm_kernels import (_gn_silu_pallas,
                                              _upsample2x_pallas,
                                              group_norm_silu,
                                              upsample2x_nearest)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 128), 32), ((1, 4, 16, 256), 32)])
@pytest.mark.parametrize("silu", [True, False])
def test_gn_silu_matches_flax(shape, groups, silu):
    k = jax.random.key(0)
    x = jax.random.normal(k, shape, jnp.float32) * 2.0 + 0.3
    gamma = jax.random.normal(jax.random.key(1), (shape[-1],)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.key(2), (shape[-1],)) * 0.1

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    if silu:
        ref = nn.silu(ref)

    out = _gn_silu_pallas(x, gamma, beta, groups, 1e-6, silu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # dispatcher parity for the reference (non-pallas) path too
    out2 = group_norm_silu(x, gamma, beta, groups, 1e-6, silu)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gn_silu_bf16_io():
    x = (jax.random.normal(jax.random.key(0), (1, 8, 8, 128)) * 3).astype(jnp.bfloat16)
    gamma = jnp.ones((128,))
    beta = jnp.zeros((128,))
    out = _gn_silu_pallas(x, gamma, beta, 32, 1e-6, True, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = group_norm_silu(x, gamma, beta)  # reference path off-TPU
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_upsample2x_matches_broadcast():
    x = jax.random.normal(jax.random.key(0), (2, 8, 4, 128), jnp.float32)
    ref = upsample2x_nearest(x)  # reference path off-TPU
    out = _upsample2x_pallas(x, interpret=True)
    assert out.shape == (2, 16, 8, 128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # and both equal torch-style F.interpolate nearest
    from instarevive_tpu.ops.resize import interpolate

    ref2 = interpolate(x, scale_factor=2, mode="nearest")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref2))


def test_odd_channels_fall_back():
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 96), jnp.float32)
    gamma, beta = jnp.ones((96,)), jnp.zeros((96,))
    out = group_norm_silu(x, gamma, beta, groups=32)  # c % 128 != 0 -> ref path
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    ref = nn.silu(gn.apply({"params": {"scale": gamma, "bias": beta}}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
