"""VAE parity: flax AutoencoderKL + converted weights vs reference ldm VAE."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import vae_params_from_torch
from instarevive_tpu.models.vae import AutoencoderKL

from tests.oracles import load_reference_ldm

# scaled-down SD VAE: same topology, fewer channels
DDCONFIG = dict(
    double_z=True,
    z_channels=4,
    resolution=64,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2, 2],
    num_res_blocks=2,
    attn_resolutions=[],
    dropout=0.0,
)


@pytest.fixture(scope="module")
def ref_and_ours():
    ae = load_reference_ldm()
    torch.manual_seed(0)
    ref = ae.AutoencoderKL(
        ddconfig=DDCONFIG,
        lossconfig={"target": "torch.nn.Identity"},
        embed_dim=4,
    ).eval()
    params = vae_params_from_torch(
        ref.state_dict(), ch_mult=DDCONFIG["ch_mult"], num_res_blocks=2
    )
    ours = AutoencoderKL(ch=32, ch_mult=(1, 2, 2), num_res_blocks=2, z_channels=4, embed_dim=4)
    return ref, ours, {"params": params}


def test_vae_encode_mode_matches(ref_and_ours):
    ref, ours, variables = ref_and_ours
    rng = np.random.default_rng(0)
    x = (rng.random((1, 32, 32, 3), dtype=np.float32) * 2 - 1)

    with torch.no_grad():
        posterior = ref.encode(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        want = posterior.mode().numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(ours.apply(variables, jnp.asarray(x), method=ours.encode_mode))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_vae_decode_matches(ref_and_ours):
    ref, ours, variables = ref_and_ours
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)

    with torch.no_grad():
        want = ref.decode(torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(ours.apply(variables, jnp.asarray(z), method=ours.decode))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
