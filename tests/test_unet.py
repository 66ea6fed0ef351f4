"""SD UNet + ControlNet parity vs reference ldm/cldm torch models."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import unet_params_from_torch
from instarevive_tpu.models.unet import UNetBackbone

from tests.oracles import load_reference_ldm  # ensures stubs + sys.path

# scaled-down cldm.yaml UNet: same topology, small dims
KW = dict(
    image_size=32,
    in_channels=4,
    out_channels=4,
    model_channels=32,
    attention_resolutions=[4, 2, 1],
    num_res_blocks=2,
    channel_mult=[1, 2, 4, 4],
    num_head_channels=16,
    use_spatial_transformer=True,
    use_linear_in_transformer=True,
    transformer_depth=1,
    context_dim=64,
    legacy=False,
)


@pytest.fixture(scope="module")
def torch_models():
    load_reference_ldm()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    import importlib

    from tests.oracles import load_reference_cldm
    cldm = load_reference_cldm()
    torch.manual_seed(0)
    unet = TorchUNet(**KW).eval()
    cn_kw = {k: v for k, v in KW.items() if k != "out_channels"}
    cn = cldm.ControlNet(hint_channels=4, **cn_kw).eval()
    # zero convs are zero-init; randomize so the parity test is non-trivial
    with torch.no_grad():
        for m in list(cn.zero_convs) + [cn.middle_block_out]:
            m[0].weight.normal_(0, 0.02)
            m[0].bias.normal_(0, 0.02)
    return unet, cn


def _ours():
    return UNetBackbone(
        model_channels=32,
        num_head_channels=16,
        context_dim=64,
        channel_mult=(1, 2, 4, 4),
        attention_ds=(1, 2, 4),
    )


def test_unet_matches_reference(torch_models):
    unet, _ = torch_models
    params = unet_params_from_torch(unet.state_dict())
    ours = _ours()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 64), dtype=np.float32)
    t = np.array([400.0], dtype=np.float32)

    with torch.no_grad():
        want = unet(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        ).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_controlled_unet_matches_reference(torch_models):
    unet, cn = torch_models
    import importlib

    unet_params = unet_params_from_torch(unet.state_dict())
    cn_params = unet_params_from_torch(cn.state_dict(), is_controlnet=True)
    ours_unet = _ours()
    ours_cn = UNetBackbone(
        in_channels=8,
        model_channels=32,
        num_head_channels=16,
        context_dim=64,
        channel_mult=(1, 2, 4, 4),
        attention_ds=(1, 2, 4),
        is_controlnet=True,
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    hint = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 64), dtype=np.float32)
    t = np.array([123.0], dtype=np.float32)

    with torch.no_grad():
        control = cn(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(hint, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
        # reference ControlledUnetModel.forward consumes the list (cldm.py:33)
        want = unet(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
            control=[c.clone() for c in control],
        ).numpy() if hasattr(unet, "forward") and "control" in unet.forward.__code__.co_varnames else None

    # reference UNetModel has no control arg; emulate ControlledUnetModel math
    if want is None:
        with torch.no_grad():
            hs = []
            from ldm.modules.diffusionmodules.util import timestep_embedding as temb_fn

            t_emb = temb_fn(torch.from_numpy(t), unet.model_channels, repeat_only=False)
            emb = unet.time_embed(t_emb)
            h = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            ctx_t = torch.from_numpy(ctx)
            for module in unet.input_blocks:
                h = module(h, emb, ctx_t)
                hs.append(h)
            h = unet.middle_block(h, emb, ctx_t)
            ctl = [c.clone() for c in control]
            h = h + ctl.pop()
            for module in unet.output_blocks:
                h = torch.cat([h, hs.pop() + ctl.pop()], dim=1)
                h = module(h, emb, ctx_t)
            want = unet.out(h).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    ctl_ours = ours_cn.apply(
        {"params": cn_params},
        jnp.concatenate([jnp.asarray(x), jnp.asarray(hint)], axis=-1),
        jnp.asarray(t),
        jnp.asarray(ctx),
    )
    got = np.asarray(
        ours_unet.apply(
            {"params": unet_params},
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(ctx),
            control=ctl_ours,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)
