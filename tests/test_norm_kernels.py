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


def test_fused_upsample_conv_exact():
    """ops/conv_fused.upsample2x_conv3x3 == nearest-2x + conv3x3 SAME,
    exactly (the lhs-dilated rewrite that skips the 4x intermediate)."""
    import jax
    import jax.numpy as jnp

    from instarevive_tpu.ops.conv_fused import upsample2x_conv3x3
    from instarevive_tpu.ops.resize import interpolate

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        interpolate(x, scale_factor=2, mode="nearest"), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = upsample2x_conv3x3(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_upsample_vae_toggle_param_compat(monkeypatch):
    """IR_FUSED_UPSAMPLE=1 uses the SAME param tree and produces identical
    decoder outputs (checkpoints interchangeable)."""
    import jax
    import jax.numpy as jnp

    from instarevive_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    p = vae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
    base = vae.apply(p, x)[0]
    monkeypatch.setenv("IR_FUSED_UPSAMPLE", "1")
    fused = vae.apply(p, x)[0]
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused), atol=1e-5)


def test_onepass_gn_matches_ref():
    """The single-pass variadic-reduce GN variant matches the two-pass
    reference numerics (kept for documentation: it measured 1.9x SLOWER
    end-to-end on v5e — XLA's variadic lax.reduce lowers poorly — so
    nothing wires it in by default)."""
    import jax.numpy as jnp

    from instarevive_tpu.ops.norm_kernels import _gn_silu_onepass, _gn_silu_ref

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 64)).astype(np.float32) + 0.5)
    g = jnp.asarray(np.random.default_rng(1).standard_normal(64).astype(np.float32))
    b = jnp.asarray(np.random.default_rng(2).standard_normal(64).astype(np.float32))
    a = _gn_silu_ref(x, g, b, 32, 1e-6, True)
    c = _gn_silu_onepass(x, g, b, 32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
