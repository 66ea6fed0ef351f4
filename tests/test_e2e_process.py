"""End-to-end ``process()`` glue parity vs the reference pipeline
(VERDICT r2 item 4).

Every model/op is parity-tested individually elsewhere; THIS test binds the
full composition — SwinIR clean -> VAE encode(mode) x scale -> one-step
eps->x0 at t=400 -> tiled latent overlap-average -> per-tile decode +
color fix -> pixel overlap-average -> clamp — against a faithful torch
transcription of ``test_scripts/inference.py:39-166`` driving the actual
reference torch SwinIR + ldm AutoencoderKL (via tests/oracles.py) and the
reference ``wavelet_reconstruction`` / ``adaptive_instance_normalization``
(utils/image/align_color.py), with identical weights on both sides through
the converters. The denoiser is a shared linear stub (the DiT itself has
its own parity suite) so any drift this test catches is GLUE drift:
resize/pad/stitch/scale/color-fix placement.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.convert.torch_import import (
    swinir_params_from_torch,
    vae_params_from_torch,
)
from instarevive_tpu.diffusion.schedules import make_schedule
from instarevive_tpu.models.swinir import SwinIR
from instarevive_tpu.models.vae import AutoencoderKL
from instarevive_tpu.pipelines.restore import VAE_SCALE, RestorationPipeline
from tests.oracles import _REF, _load_as, load_reference_ldm, load_reference_swinir_module

# latent factor 8 like the real sd-vae (the reference glue hardcodes //8)
DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=128, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=1, attn_resolutions=[],
    dropout=0.0,
)
SWINIR_CFG = dict(
    embed_dim=60, depths=(2, 2), num_heads=(6, 6), window=8, mlp_ratio=2.0,
    sf=8, unshuffle=True, unshuffle_scale=8,
)
H = W = 128  # pixel size; latent 16x16
MAXT = 400


def _load_align_color():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.ToTensor = object
        tf.ToPILImage = object
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    return _load_as("refutils", "align_color", f"{_REF}/utils/image/align_color.py")


class _StubDiT:
    """Shared linear 'DiT': eps = z @ Wc + 1e-3 * t, emitting 8 channels
    (learned-sigma layout; the glue must split off the first 4 — reference
    forward_model chunks, generate.py:54-87)."""

    pred_sigma = True
    model_max_length = 8
    caption_channels = 16

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.w = (rng.standard_normal((4, 8)) * 0.05).astype(np.float32)

    # flax-like surface used by RestorationPipeline.one_step
    def apply(self, variables, z, t, y, y_mask=None, **kw):
        w = jnp.asarray(variables["params"]["w"])
        return jnp.einsum("bhwc,cd->bhwd", z, w) + 1e-3 * t[:, None, None, None]

    def torch_eps(self, z_nchw, t):
        w = torch.from_numpy(self.w)
        out = torch.einsum("bchw,cd->bdhw", z_nchw, w) + 1e-3 * float(t)
        return out.chunk(2, dim=1)[0]  # learned-sigma split


@pytest.fixture(scope="module")
def rig():
    swin_mod = load_reference_swinir_module()
    ae_mod = load_reference_ldm()
    align = _load_align_color()
    torch.manual_seed(0)
    ref_swin = swin_mod.SwinIR(
        img_size=64, patch_size=1, in_chans=3, embed_dim=SWINIR_CFG["embed_dim"],
        depths=list(SWINIR_CFG["depths"]), num_heads=list(SWINIR_CFG["num_heads"]),
        window_size=SWINIR_CFG["window"], mlp_ratio=SWINIR_CFG["mlp_ratio"],
        sf=SWINIR_CFG["sf"], img_range=1.0, upsampler="nearest+conv",
        resi_connection="1conv", unshuffle=True, unshuffle_scale=8,
    ).eval()
    ref_vae = ae_mod.AutoencoderKL(
        ddconfig=DDCONFIG, lossconfig={"target": "torch.nn.Identity"}, embed_dim=4
    ).eval()

    stub = _StubDiT()
    pipe = RestorationPipeline(
        swinir=SwinIR(**SWINIR_CFG),
        vae=AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                          z_channels=4, embed_dim=4),
        dit=stub,
        sched=make_schedule("linear", 1000),
        maxt=MAXT,
    )
    params = {
        "swinir": swinir_params_from_torch(
            ref_swin.state_dict(), depths=SWINIR_CFG["depths"],
            upsampler="nearest+conv", sf=SWINIR_CFG["sf"],
        ),
        "vae": vae_params_from_torch(
            ref_vae.state_dict(), ch_mult=DDCONFIG["ch_mult"],
            num_res_blocks=DDCONFIG["num_res_blocks"],
        ),
        "dit": {"w": stub.w},
    }
    abar = np.cumprod(1.0 - np.asarray(make_schedule("linear", 1000).betas))
    return ref_swin, ref_vae, align, stub, pipe, params, abar


def _ref_process(rig_t, lq01, *, tiled, color_fix, tile_size=64, tile_stride=56,
                 use_swinir=True):
    """Faithful transcription of test_scripts/inference.py:56-166."""
    ref_swin, ref_vae, align, stub, _, _, abar = rig_t
    control = torch.from_numpy(lq01.transpose(0, 3, 1, 2)).clamp_(0, 1)
    with torch.no_grad():
        if use_swinir:
            control = ref_swin(control)
        height, width = control.size(-2), control.size(-1)
        h, w = height // 8, width // 8
        posterior = ref_vae.encode(control * 2 - 1)
        init_noise = posterior.mode().to(torch.float32) * VAE_SCALE

        def one_step(z):
            eps = stub.torch_eps(z, MAXT)
            a = float(abar[MAXT])
            return (z - np.sqrt(1 - a) * eps) / np.sqrt(a)  # eps_to_mu

        if not tiled:
            latents = one_step(init_noise) / VAE_SCALE
            img = ref_vae.decode(latents) / 2 + 0.5
            return img.clamp(0, 1).permute(0, 2, 3, 1).numpy()

        lt, ls = tile_size // 8, tile_stride // 8
        # _sliding_windows (inference.py:40-53)
        his = list(range(0, h - lt + 1, ls))
        if (h - lt) % ls != 0:
            his.append(h - lt)
        wis = list(range(0, w - lt + 1, ls))
        if (w - lt) % ls != 0:
            wis.append(w - lt)
        coords = [(hi, hi + lt, wi, wi + lt) for hi in his for wi in wis]

        noise_buffer = torch.zeros_like(init_noise)
        count = torch.zeros_like(init_noise)
        for hi, he, wi, we in coords:
            noise_buffer[:, :, hi:he, wi:we] += one_step(
                init_noise[:, :, hi:he, wi:we]
            )
            count[:, :, hi:he, wi:we] += 1
        noise_buffer.div_(count)

        img_buffer = torch.zeros_like(control)
        count = torch.zeros_like(control)
        for hi, he, wi, we in coords:
            tile_img = ref_vae.decode(noise_buffer[:, :, hi:he, wi:we] / VAE_SCALE)
            tile_img = tile_img / 2 + 0.5
            cond = control[:, :, hi * 8:he * 8, wi * 8:we * 8]
            if color_fix == "adain":
                tile_img = align.adaptive_instance_normalization(tile_img, cond)
            elif color_fix == "wavelet":
                tile_img = align.wavelet_reconstruction(tile_img, cond)
            img_buffer[:, :, hi * 8:he * 8, wi * 8:we * 8] += tile_img
            count[:, :, hi * 8:he * 8, wi * 8:we * 8] += 1
        img_buffer.div_(count)
        return img_buffer.clamp(0, 1).permute(0, 2, 3, 1).numpy()


def _lq(seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, H // 4, W // 4, 3), dtype=np.float32)
    # smooth-ish input so SwinIR stays in a sane range
    return np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)


def test_process_untiled_matches_reference(rig):
    pipe, params = rig[4], rig[5]
    lq = _lq(0)
    want = _ref_process(rig, lq, tiled=False, color_fix="none")
    got = np.asarray(
        jax.jit(lambda p, x, y: pipe.process(p, x, y, color_fix="none"))(
            params, jnp.asarray(lq), jnp.zeros((1, 8, 16))
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("color_fix", ["wavelet", "adain", "none"])
def test_process_tiled_matches_reference(rig, color_fix):
    pipe, params = rig[4], rig[5]
    lq = _lq(1)
    want = _ref_process(rig, lq, tiled=True, color_fix=color_fix)
    got = np.asarray(
        jax.jit(
            lambda p, x, y: pipe.process_tiled(
                p, x, y, tile_size=64, tile_stride=56, color_fix=color_fix
            )
        )(params, jnp.asarray(lq), jnp.zeros((1, 8, 16)))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_process_untiled_no_swinir_matches_reference(rig):
    """--disable_preprocess_model branch: encode the raw LQ."""
    pipe, params = rig[4], rig[5]
    lq = _lq(2)
    want = _ref_process(rig, lq, tiled=False, color_fix="none", use_swinir=False)
    got = np.asarray(
        jax.jit(
            lambda p, x, y: pipe.process(p, x, y, color_fix="none", use_swinir=False)
        )(params, jnp.asarray(lq), jnp.zeros((1, 8, 16)))
    )
    np.testing.assert_allclose(got, want, atol=1e-3)
