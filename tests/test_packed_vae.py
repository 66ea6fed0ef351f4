"""Packed batch-in-channels VAE decode (ops/packed_vae.py) must EXACTLY
mirror the flax Decoder — grouped convs with tiled kernels, 32*N-group GN,
unpacked mid attention. Guards the lockstep with models/vae.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instarevive_tpu.models.vae import AutoencoderKL
from instarevive_tpu.ops.packed_vae import decode_packed


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_decode_matches_flax(dtype):
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, embed_dim=4, dtype=dtype)
    z = jax.random.normal(jax.random.key(0), (3, 8, 8, 4))
    params = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))["params"]

    want = vae.apply({"params": params}, z, method=vae.decode)
    got = decode_packed(params, z, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dtype=dtype)
    assert got.shape == want.shape
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


def test_packed_decode_in_pipeline(monkeypatch):
    """IR_PACKED_DECODE=1 path in RestorationPipeline.decode equals the
    per-sample map path."""
    from instarevive_tpu.pipelines.restore import RestorationPipeline

    pipe = RestorationPipeline(
        vae=AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, embed_dim=4)
    )
    params = {"vae": pipe.vae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]}
    z = jax.random.normal(jax.random.key(2), (2, 8, 8, 4)) * 0.2

    monkeypatch.delenv("IR_PACKED_DECODE", raising=False)
    base = np.asarray(pipe.decode(params, z))
    monkeypatch.setenv("IR_PACKED_DECODE", "1")
    packed = np.asarray(pipe.decode(params, z))
    np.testing.assert_allclose(packed, base, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_encode_matches_flax(dtype):
    from instarevive_tpu.ops.packed_vae import encode_mode_packed

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, embed_dim=4, dtype=dtype)
    x = jax.random.uniform(jax.random.key(3), (3, 16, 16, 3)) * 2 - 1
    params = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))["params"]
    want = vae.apply({"params": params}, x, method=vae.encode_mode)
    got = encode_mode_packed(params, x, ch=32, ch_mult=(1, 2),
                             num_res_blocks=1, z_channels=4, embed_dim=4,
                             dtype=dtype)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )
