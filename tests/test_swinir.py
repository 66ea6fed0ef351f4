"""SwinIR parity: our flax model + converted weights vs the reference torch model."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import swinir_params_from_torch
from instarevive_tpu.models.swinir import SwinIR

from tests.oracles import load_reference_swinir_module


def _small_cfg():
    # a scaled-down InstaRevive SwinIR (same topology, fewer/smaller blocks)
    return dict(
        embed_dim=60,
        depths=(2, 2),
        num_heads=(6, 6),
        window=8,
        mlp_ratio=2.0,
        sf=8,
        unshuffle=True,
        unshuffle_scale=8,
    )


@pytest.fixture(scope="module")
def ref_and_ours():
    mod = load_reference_swinir_module()
    cfg = _small_cfg()
    torch.manual_seed(0)
    ref = mod.SwinIR(
        img_size=64,
        patch_size=1,
        in_chans=3,
        embed_dim=cfg["embed_dim"],
        depths=list(cfg["depths"]),
        num_heads=list(cfg["num_heads"]),
        window_size=cfg["window"],
        mlp_ratio=cfg["mlp_ratio"],
        sf=cfg["sf"],
        img_range=1.0,
        upsampler="nearest+conv",
        resi_connection="1conv",
        unshuffle=True,
        unshuffle_scale=8,
    ).eval()
    params = swinir_params_from_torch(
        ref.state_dict(), depths=cfg["depths"], upsampler="nearest+conv", sf=cfg["sf"]
    )
    ours = SwinIR(**cfg)
    return ref, ours, {"params": params}


def test_swinir_matches_reference(ref_and_ours):
    ref, ours, variables = ref_and_ours
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_swinir_shapes_net_1x(ref_and_ours):
    _, ours, variables = ref_and_ours
    x = jnp.zeros((1, 128, 192, 3))
    out = ours.apply(variables, x)
    assert out.shape == (1, 128, 192, 3)


def test_swinir_jit_compiles(ref_and_ours):
    _, ours, variables = ref_and_ours
    f = jax.jit(lambda v, x: ours.apply(v, x))
    out = f(variables, jnp.ones((1, 64, 64, 3)) * 0.5)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("h,w,window,shift", [
    (16, 16, 8, 4), (32, 16, 8, 4), (24, 40, 8, 3), (16, 16, 4, 2),
    (64, 64, 8, 4),
])
def test_shift_window_perm_property(h, w, window, shift):
    """win(roll(x, -s)) == win(x)[:, perm] and the inverse, for assorted
    geometries (the permutation that keeps shifted Swin blocks
    window-resident, ops/window.py)."""
    from instarevive_tpu.ops import window as W

    rng = np.random.default_rng(h * w + shift)
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)), jnp.float32)

    def win(t):
        return W.window_partition(t, window).reshape(2, h * w, 5)

    perm, inv = W.shift_window_perm(h, w, window, shift)
    np.testing.assert_array_equal(
        np.asarray(win(W.cyclic_shift(x, shift))),
        np.asarray(win(x)[:, jnp.asarray(perm)]),
    )
    np.testing.assert_array_equal(
        np.asarray(win(W.cyclic_unshift(x, shift))),
        np.asarray(win(x)[:, jnp.asarray(inv)]),
    )
