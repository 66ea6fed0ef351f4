"""MiDaS DPT depth model: parity vs the reference's own vendored torch code
(/root/reference/ldm/modules/midas) with the timm backbones transcribed in
tests/midas_oracle.py. Closes the last §2.3 component gap (VERDICT r3 item 4
pattern: oracle + importer + forward comparison with shared random weights).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import dpt_params_from_torch
from instarevive_tpu.models.dpt import (
    DPTConfig,
    DPTDepthModel,
    MiDaSInference,
    VARIANTS,
    build_dpt,
    midas_transform_size,
)

TINY_HYBRID = DPTConfig(
    vit_dim=48, vit_depth=4, vit_heads=4, hooks=(0, 1, 2, 3),
    layer_chs=(16, 32, 40, 48), features=16, hybrid=True,
    rn_layers=(1, 1, 1), rn_stem_chs=8, rn_base_chs=16, gn_groups=4,
    pos_grid=4,
)
TINY_VIT = DPTConfig(
    vit_dim=48, vit_depth=4, vit_heads=4, hooks=(0, 1, 2, 3),
    layer_chs=(16, 24, 32, 40), features=16, hybrid=False, pos_grid=4,
)


def _build_pair(cfg, seed=0):
    from tests.midas_oracle import build_reference_tiny_dpt

    ref = build_reference_tiny_dpt(
        dim=cfg.vit_dim, depth=cfg.vit_depth, heads=cfg.vit_heads,
        pos_grid=cfg.pos_grid, chs=cfg.layer_chs, features=cfg.features,
        hybrid=cfg.hybrid, hooks=cfg.hooks, rn_layers=cfg.rn_layers,
        rn_stem=cfg.rn_stem_chs, rn_base=cfg.rn_base_chs,
        groups=cfg.gn_groups, seed=seed,
    )
    params = dpt_params_from_torch(ref.state_dict(), cfg)
    return ref, DPTDepthModel(cfg), params


@pytest.mark.parametrize("cfg,name", [(TINY_HYBRID, "hybrid"), (TINY_VIT, "vit")])
def test_dpt_parity_tiny(cfg, name):
    ref, model, params = _build_pair(cfg)
    rng = np.random.default_rng(7)
    # 96x96: grid 6x6 != stored pos_grid 4 -> exercises the pos-embed
    # bilinear resize path (vit.py:100-114) too
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_fn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 96, 96)
    err = np.abs(got - want).max()
    assert err < 2e-4, f"{name}: max abs err {err}"


def test_dpt_parity_square_grid():
    """Grid == stored pos_grid (no pos-embed resize): exact path."""
    ref, model, params = _build_pair(TINY_HYBRID, seed=3)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_fn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert np.abs(got - want).max() < 2e-4


def test_midas_transform_size_matches_reference():
    from tests.midas_oracle import load_reference_midas  # ensures stubs

    load_reference_midas()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "refmidas.transforms",
        "/root/reference/ldm/modules/midas/midas/transforms.py",
    )
    tmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmod)
    for method in ("minimal", "upper_bound", "lower_bound"):
        ref_resize = tmod.Resize(
            384, 384, resize_target=None, keep_aspect_ratio=True,
            ensure_multiple_of=32, resize_method=method,
        )
        for (h, w) in [(480, 640), (512, 512), (123, 77), (2000, 300), (384, 384)]:
            rw, rh = ref_resize.get_size(w, h)
            gh, gw = midas_transform_size(h, w, 384, 32, method)
            assert (gh, gw) == (rh, rw), (method, h, w, (gh, gw), (rh, rw))


def test_midas_inference_wrapper_and_depth_fn():
    ref, model, params = _build_pair(TINY_HYBRID, seed=5)
    midas = MiDaSInference(model, params, "dpt_hybrid", net_size=96)
    rng = np.random.default_rng(0)
    x01 = rng.uniform(size=(2, 80, 120, 3)).astype(np.float32)
    depth = np.asarray(midas(jnp.asarray(x01)))
    assert depth.shape == (2, 80, 120, 1)
    # non_negative head; the bicubic resize back (api.py:162-167) may
    # overshoot slightly below zero, same as the reference
    assert np.isfinite(depth).all() and (depth >= -1e-2).all()

    # depth_fn plugs into the depth2image conditioning (ddpm.py:1716-1734)
    fn = midas.depth_fn()
    hq = jnp.asarray(x01 * 2.0 - 1.0)
    d = fn(hq)
    assert d.shape == (2, 80, 120, 1)
    g = jax.grad(lambda h: jnp.sum(fn(h) ** 2))(hq)
    assert np.allclose(np.asarray(g), 0.0)  # frozen estimator


def test_build_dpt_variants():
    for mt, backbone in [
        ("dpt_large", "vitl16_384"),
        ("dpt_hybrid", "vitb_rn50_384"),
        ("dpt_vitb16", "vitb16_384"),
    ]:
        m = build_dpt(mt)
        assert m.cfg == VARIANTS[backbone]


def test_depth2image_with_midas_depth_fn():
    """End-to-end: the native DPT estimator drives the depth2image task
    exactly as LatentDepth2ImageDiffusion wires MiDaS (ddpm.py:1703-1734)."""
    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.models.unet import UNetBackbone
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.train.ldm_tasks import LatentDiffusionTask

    _, model, params = _build_pair(TINY_HYBRID, seed=9)
    midas = MiDaSInference(model, params, "dpt_hybrid", net_size=64)

    k = jax.random.PRNGKey(0)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    frozen = {"vae": vae.init(k, jnp.zeros((1, 8, 8, 3)))["params"]}
    unet = UNetBackbone(in_channels=5, model_channels=32, num_head_channels=16,
                        context_dim=32, channel_mult=(1, 2), attention_ds=(1, 2))
    task = LatentDiffusionTask(unet, vae, make_schedule("ldm_linear", 100))
    uparams = {"unet": unet.init(k, jnp.zeros((1, 8, 8, 5)), jnp.zeros((1,)),
                                 jnp.zeros((1, 4, 32)))["params"]}
    batch = {"hq": jnp.asarray(np.random.default_rng(3).uniform(
                 -1, 1, (2, 64, 64, 3)).astype(np.float32)),
             "context": jnp.zeros((2, 4, 32))}
    loss, _ = task.depth2image_loss(uparams, frozen, batch, jax.random.PRNGKey(1),
                                    depth_fn=midas.depth_fn())
    assert np.isfinite(float(loss))


def test_midas_v21_parity():
    """MiDaS v2.1 (ResNeXt101 MidasNet, midas/midas_net.py:12-76) vs the
    reference class with torch.hub stubbed; tiny depth (1,1,1,1) keeps the
    REAL stage widths 256..2048 (hardcoded in blocks.py:38), so the
    BN-folding importer and grouped convs are exercised at true widths."""
    from tests.midas_oracle import build_reference_midas_v21
    from instarevive_tpu.convert.torch_import import midas_v21_params_from_torch
    from instarevive_tpu.models.dpt import MidasNet

    ref = build_reference_midas_v21(layers=(1, 1, 1, 1), features=64)
    params = midas_v21_params_from_torch(ref.state_dict(), layers=(1, 1, 1, 1))
    model = MidasNet(features=64, layers=(1, 1, 1, 1))

    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 64, 64)
    err = np.abs(got - want).max()
    scale = np.abs(want).max() + 1e-8
    assert err / scale < 5e-4, (err, scale)


def test_midas_v21_small_parity():
    """MiDaS v2.1 small (efficientnet-lite3 MidasNet_small,
    midas/midas_net_custom.py:12-105) vs the reference class with torch.hub
    stubbed to the gen-efficientnet lite3 transcription — FULL lite3 depth
    (1/3/3/5/5/6/1 blocks, real widths 24..384), exercising TF-SAME strided
    depthwise convs and the tf_ BN eps 1e-3 folding."""
    from tests.midas_oracle import build_reference_midas_v21_small
    from instarevive_tpu.convert.torch_import import midas_v21_small_params_from_torch
    from instarevive_tpu.models.dpt import MidasNetSmall

    ref = build_reference_midas_v21_small(seed=3)
    params = midas_v21_small_params_from_torch(ref.state_dict())
    model = MidasNetSmall()

    rng = np.random.default_rng(17)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 96, 96)
    err = np.abs(got - want).max()
    scale = np.abs(want).max() + 1e-8
    assert err / scale < 5e-4, (err, scale)


def test_midas_v21_small_inference_wrapper():
    """MiDaSInference with model_type=midas_v21_small: net size 256,
    upper_bound resize, ImageNet normalization (api.py:46-49,105-112)."""
    from instarevive_tpu.models.dpt import MidasNetSmall, build_midas

    model = build_midas("midas_v21_small")
    assert isinstance(model, MidasNetSmall)
    params = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))["params"]
    midas = MiDaSInference(model, params, model_type="midas_v21_small")
    assert midas.net_size == 256 and midas.method == "upper_bound"
    x = jnp.clip(jax.random.uniform(jax.random.key(1), (1, 120, 160, 3)), 0, 1)
    depth = midas(x)
    assert depth.shape == (1, 120, 160, 1)
    assert bool(jnp.isfinite(depth).all())
