"""PixArt DiT parity: flax model + converted weights vs reference torch PixArt."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import pixart_params_from_torch
from instarevive_tpu.models.pixart import PixArt, sincos_pos_embed_2d

from tests.oracles import load_reference_pixart

CFG = dict(
    input_size=16,
    patch_size=2,
    in_channels=4,
    hidden_size=64,
    depth=4,
    num_heads=4,
    mlp_ratio=4.0,
    caption_channels=32,
    model_max_length=8,
)


@pytest.fixture(scope="module")
def ref_and_ours():
    pixart_mod, _, cn_mod = load_reference_pixart()
    torch.manual_seed(0)
    ref = pixart_mod.PixArt(
        input_size=CFG["input_size"],
        patch_size=CFG["patch_size"],
        in_channels=CFG["in_channels"],
        hidden_size=CFG["hidden_size"],
        depth=CFG["depth"],
        num_heads=CFG["num_heads"],
        mlp_ratio=CFG["mlp_ratio"],
        caption_channels=CFG["caption_channels"],
        model_max_length=CFG["model_max_length"],
    ).eval()
    params = pixart_params_from_torch(ref.state_dict(), depth=CFG["depth"])
    ours = PixArt(**CFG)
    return ref, cn_mod, ours, {"params": params}


def test_pos_embed_matches_reference(ref_and_ours):
    ref, _, _, _ = ref_and_ours
    want = ref.pos_embed.numpy()[0]  # initialized by initialize_weights()
    got = sincos_pos_embed_2d(CFG["hidden_size"], 8, 8, 1.0, 8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pixart_forward_matches(ref_and_ours):
    ref, _, ours, variables = ref_and_ours
    rng = np.random.default_rng(0)
    b, latent, L = 2, 16, CFG["model_max_length"]
    x = rng.standard_normal((b, latent, latent, 4), dtype=np.float32)
    t = np.array([400.0, 999.0], dtype=np.float32)
    y = rng.standard_normal((b, L, CFG["caption_channels"]), dtype=np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(y[:, None]),  # (B, 1, L, C)
        ).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(ours.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y)))
    assert got.shape == want.shape  # (B, 16, 16, 8)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_pixart_masked_text_matches(ref_and_ours):
    ref, _, ours, variables = ref_and_ours
    rng = np.random.default_rng(1)
    b, latent, L = 2, 16, CFG["model_max_length"]
    x = rng.standard_normal((b, latent, latent, 4), dtype=np.float32)
    t = np.array([100.0, 500.0], dtype=np.float32)
    y = rng.standard_normal((b, L, CFG["caption_channels"]), dtype=np.float32)
    mask = np.zeros((b, L), dtype=np.int64)
    mask[0, :3] = 1
    mask[1, :6] = 1

    with torch.no_grad():
        want = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(y[:, None]),
            mask=torch.from_numpy(mask),
        ).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(
        ours.apply(
            variables,
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(y),
            y_mask=jnp.asarray(mask.astype(bool)),
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_pixart_ms_controlnet_matches():
    """PixArtMS_controlnet (controlnet.py:86-290) is a PixArtMS duplicate
    whose forward has no control wiring; verify our unified PixArt (with
    micro-conditioning) reproduces the actual reference class."""
    from instarevive_tpu.convert.torch_import import (
        pixart_ms_extra_params_from_torch,
    )

    from tests.oracles import load_reference_pixart_ms_controlnet

    cn = load_reference_pixart_ms_controlnet()
    torch.manual_seed(3)
    hidden = 96  # divisible by 3 for the size/AR embed split
    ref = cn.PixArtMS_controlnet(
        input_size=16,
        patch_size=2,
        in_channels=4,
        hidden_size=hidden,
        depth=2,
        num_heads=4,
        mlp_ratio=4.0,
        caption_channels=32,
        model_max_length=8,
        micro_condition=True,
    ).eval()
    # initialize() zeroes cross-attn proj + final linear; randomize every
    # param so the comparison is non-trivial end to end
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.data.normal_(0, 0.02)

    params = pixart_params_from_torch(ref.state_dict(), depth=2)
    params = pixart_ms_extra_params_from_torch(params, ref.state_dict())
    ours = PixArt(
        input_size=16,
        patch_size=2,
        in_channels=4,
        hidden_size=hidden,
        depth=2,
        num_heads=4,
        mlp_ratio=4.0,
        caption_channels=32,
        model_max_length=8,
        micro_condition=True,
    )

    rng = np.random.default_rng(4)
    b, latent, L = 2, 16, 8
    x = rng.standard_normal((b, latent, latent, 4), dtype=np.float32)
    t = np.array([400.0, 999.0], dtype=np.float32)
    y = rng.standard_normal((b, L, 32), dtype=np.float32)
    img_hw = np.array([[512.0, 512.0], [256.0, 384.0]], dtype=np.float32)
    ar = np.array([[1.0], [0.6667]], dtype=np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(y[:, None]),
            data_info={
                "img_hw": torch.from_numpy(img_hw),
                "aspect_ratio": torch.from_numpy(ar),
            },
        ).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(
        ours.apply(
            {"params": params},
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(y),
            data_info={"img_hw": jnp.asarray(img_hw), "aspect_ratio": jnp.asarray(ar)},
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_controlnet_half_matches(ref_and_ours):
    ref, cn_mod, ours, variables = ref_and_ours
    import copy

    torch.manual_seed(1)
    base = copy.deepcopy(ref)
    for blk in base.blocks:  # ControlT2IDitBlockHalf expects PixArtMSBlock API
        blk.hidden_size = CFG["hidden_size"]
    ctrl = cn_mod.ControlPixArtHalf(base, copy_blocks_num=2).eval()
    # give the zero-init projections real values so the test is non-trivial
    with torch.no_grad():
        for blk in ctrl.controlnet:
            blk.after_proj.weight.normal_(0, 0.02)
            blk.after_proj.bias.normal_(0, 0.02)
        ctrl.controlnet[0].before_proj.weight.normal_(0, 0.02)
        ctrl.controlnet[0].before_proj.bias.normal_(0, 0.02)

    params = pixart_params_from_torch(
        {("base_model." in k and k.replace("base_model.", "") or k): v
         for k, v in ctrl.state_dict().items()},
        depth=CFG["depth"],
    )

    rng = np.random.default_rng(2)
    b, latent, L = 2, 16, CFG["model_max_length"]
    x = rng.standard_normal((b, latent, latent, 4), dtype=np.float32)
    c = rng.standard_normal((b, latent, latent, 4), dtype=np.float32)
    t = np.array([400.0, 400.0], dtype=np.float32)
    y = rng.standard_normal((b, L, CFG["caption_channels"]), dtype=np.float32)

    with torch.no_grad():
        want = ctrl(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(y[:, None]),
            c=torch.from_numpy(np.transpose(c, (0, 3, 1, 2))),
        ).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(
        ours.apply(
            {"params": params},
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(y),
            c=jnp.asarray(c),
            control_depth=2,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
