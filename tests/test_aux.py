"""Aux components: samplers, metrics, LoRA, cldm tasks, RRDBNet, debug utils."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion.samplers import (
    edm_sample_loop,
    lcm_sample_loop,
    plms_sample_loop,
    sa_solver_sample,
)
from instarevive_tpu.diffusion.schedules import make_schedule
from instarevive_tpu.diffusion.timestep_sampler import (
    loss_second_moment_init,
    loss_second_moment_sample,
    loss_second_moment_update,
    loss_second_moment_weights,
    uniform_sample_t,
)
from instarevive_tpu.models.rrdbnet import RRDBNet, tile_process
from instarevive_tpu.train.lora import count_lora_params, init_lora, merge_lora
from instarevive_tpu.utils.debug import (
    SimpleTimer,
    all_finite,
    first_nonfinite_paths,
    nan_guard,
)
from instarevive_tpu.utils.metrics import psnr, ssim


def _toy_model(learned_range=True):
    def fn(x, t):
        eps = 0.1 * x
        if learned_range:
            return jnp.concatenate([eps, jnp.zeros_like(x)], axis=-1)
        return eps

    return fn


def test_extra_samplers_run_finite():
    s = make_schedule("linear", 100)
    rng = jax.random.key(0)
    shape = (1, 8, 8, 4)
    for out in [
        plms_sample_loop(s, _toy_model(), shape, rng),
        lcm_sample_loop(s, _toy_model(), shape, rng, num_steps=4, lcm_origin_steps=50),
        sa_solver_sample(lambda x, t: 0.1 * x, s, jax.random.normal(rng, shape), steps=8),
        edm_sample_loop(lambda x, sig: x * 0.9, shape, rng, num_steps=6),
    ]:
        assert out.shape == shape
        assert np.isfinite(np.asarray(out)).all()


def test_psnr_ssim_match_basicsr_conventions():
    rng = np.random.default_rng(0)
    a = rng.random((1, 64, 64, 3), dtype=np.float32)
    noise = rng.normal(0, 0.05, a.shape).astype(np.float32)
    b = np.clip(a + noise, 0, 1)

    p = float(psnr(jnp.asarray(a), jnp.asarray(b))[0])
    # direct PSNR formula check
    want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert abs(p - want) < 1e-3

    s_same = float(ssim(jnp.asarray(a), jnp.asarray(a))[0])
    s_diff = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    assert s_same > 0.999
    assert 0 < s_diff < s_same

    # Y-channel + crop runs
    py = psnr(jnp.asarray(a), jnp.asarray(b), crop_border=4, test_y_channel=True)
    assert np.isfinite(np.asarray(py)).all()


def test_timestep_samplers():
    t, w = uniform_sample_t(jax.random.key(0), 16, 100)
    assert t.shape == (16,) and (np.asarray(t) < 100).all()
    np.testing.assert_allclose(np.asarray(w), 1.0)

    st = loss_second_moment_init(10, history_per_term=2)
    # before warmup: uniform
    np.testing.assert_allclose(np.asarray(loss_second_moment_weights(st)), 0.1)
    # feed large losses at t=3 until warmed
    for _ in range(2):
        st = loss_second_moment_update(
            st, jnp.arange(10), jnp.where(jnp.arange(10) == 3, 10.0, 1.0)
        )
    w = np.asarray(loss_second_moment_weights(st))
    assert w[3] == w.max()
    t, iw = loss_second_moment_sample(jax.random.key(1), st, 64)
    assert np.isfinite(np.asarray(iw)).all()


def test_lora_init_merge_and_grad_path():
    params = {
        "blocks_0": {"attn": {"qkv": {"kernel": jnp.ones((8, 24)), "bias": jnp.zeros((24,))}}},
        "other": {"kernel": jnp.ones((8, 8))},
    }
    lora = init_lora(jax.random.key(0), params, rank=4)
    assert "blocks_0" in lora and count_lora_params(lora) > 0
    merged = merge_lora(params, lora)
    # b is zero-init: merge is identity at init
    np.testing.assert_allclose(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]), 1.0
    )

    def loss(lp):
        m = merge_lora(params, lp)
        return jnp.sum(m["blocks_0"]["attn"]["qkv"]["kernel"] ** 2)

    g = jax.grad(loss)(lora)
    assert np.abs(np.asarray(g["blocks_0"]["attn"]["qkv"]["b"])).max() > 0


def test_rrdbnet_and_tiling():
    net = RRDBNet(scale=4, num_feat=16, num_block=2, num_grow=8)
    params = net.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    x = jnp.clip(jax.random.uniform(jax.random.key(1), (1, 24, 20, 3)), 0, 1)
    up = net.apply(params, x)
    assert up.shape == (1, 96, 80, 3)

    tiled = tile_process(lambda t: net.apply(params, t), x, scale=4, tile_size=16, tile_pad=4)
    assert tiled.shape == (1, 96, 80, 3)
    # interior agreement between tiled and full (context pad hides seams)
    d = np.abs(np.asarray(up) - np.asarray(tiled))
    assert d.mean() < 0.06  # random-weight receptive field >> tile_pad


def test_nan_guard_and_finite_checks():
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.asarray([1.0, np.nan])}}
    assert not bool(all_finite(tree))
    assert first_nonfinite_paths(tree) == ["b/c"]

    state = {"w": jnp.ones((2,))}
    good = {"w": jnp.asarray([0.1, 0.1])}
    bad = {"w": jnp.asarray([np.nan, 0.1])}
    apply_fn = lambda g: {"w": state["w"] - g["w"]}
    out_good = nan_guard(apply_fn, state, good)
    out_bad = nan_guard(apply_fn, state, bad)
    np.testing.assert_allclose(np.asarray(out_good["w"]), 0.9)
    np.testing.assert_allclose(np.asarray(out_bad["w"]), 1.0)  # skipped


def test_simple_timer():
    t = SimpleTimer(total=10, log_interval=5)
    assert t.update(4) is None
    msg = t.update(1)
    assert "5/10" in msg and "ETA" in msg


def test_cldm_tasks_smoke():
    from instarevive_tpu.models.swinir import SwinIR
    from instarevive_tpu.models.unet import UNetBackbone
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.train.cldm import ControlLDMTask
    from instarevive_tpu.train.lora import init_lora

    unet = UNetBackbone(model_channels=32, num_head_channels=16, context_dim=32,
                        channel_mult=(1, 2), attention_ds=(1, 2))
    cn = UNetBackbone(in_channels=8, model_channels=32, num_head_channels=16,
                      context_dim=32, channel_mult=(1, 2), attention_ds=(1, 2),
                      is_controlnet=True)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    swinir = SwinIR(embed_dim=60, depths=(1,), num_heads=(6,), sf=8)
    task = ControlLDMTask(unet, cn, vae, swinir, make_schedule("linear", 100))

    k = jax.random.key(0)
    frozen = {
        "vae": vae.init(k, jnp.zeros((1, 16, 16, 3)))["params"],
        "swinir": swinir.init(k, jnp.zeros((1, 64, 64, 3)))["params"],
    }
    params = {
        "unet": unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 4, 32)))["params"],
        "controlnet": cn.init(k, jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 4, 32)))["params"],
    }
    batch = {
        "hq": jnp.zeros((1, 16, 16, 3)),
        "lq": jnp.full((1, 16, 16, 3), 0.5),
        "context": jnp.zeros((1, 4, 32)),
    }
    for fn in (task.eps_loss, task.reflow_loss):
        loss, metrics = fn(params, frozen, batch, jax.random.key(1))
        assert np.isfinite(float(loss))

    lora = init_lora(jax.random.key(2), params["unet"], rank=4)
    loss, _ = task.dist_loss(lora, params, frozen, batch, jax.random.key(3))
    assert np.isfinite(float(loss))

    z = task.reflow_sample_1step(params, frozen, batch)
    assert z.shape == (1, 8, 8, 4)


def test_sa_solver_stochastic_converges_to_ode():
    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m
    from instarevive_tpu.diffusion.samplers import sa_solver_stochastic

    s = make_schedule("linear", 1000)
    model = lambda x, t: 0.1 * x  # noqa: E731
    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    ref = dpm_solver_pp_2m(model, s, x0, steps=50)
    det = sa_solver_stochastic(model, s, x0, jax.random.key(1), steps=50, tau=0.0)
    # tau=0 is the same ODE in the limit; methods differ at O(h^3)/step
    rel = float(jnp.abs(det - ref).max() / jnp.abs(ref).max())
    assert rel < 0.01, rel

    sto = sa_solver_stochastic(model, s, x0, jax.random.key(2), steps=25, tau=1.0)
    assert np.isfinite(np.asarray(sto)).all()
    # stochastic path differs from deterministic
    det25 = sa_solver_stochastic(model, s, x0, jax.random.key(2), steps=25, tau=0.0)
    assert not np.allclose(np.asarray(sto), np.asarray(det25))


def test_ldm_task_variants():
    from instarevive_tpu.models.unet import UNetBackbone
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.train.ldm_tasks import LatentDiffusionTask

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    k = jax.random.key(0)
    frozen = {"vae": vae.init(k, jnp.zeros((1, 8, 8, 3)))["params"]}
    sched = make_schedule("ldm_linear", 100)
    ctx = jnp.zeros((2, 4, 32))

    cases = [
        ("loss", 4, {}, "v"),
        ("inpaint_loss", 9, {"mask": jnp.zeros((2, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)}, "eps"),
        ("upscale_loss", 8, {"lq": jnp.zeros((2, 8, 8, 3))}, "eps"),
        ("depth2image_loss", 5,
         {"depth": jnp.asarray(np.random.default_rng(7).standard_normal(
             (2, 24, 24, 1), dtype=np.float32))}, "eps"),
    ]
    for fn_name, in_ch, extra, param in cases:
        unet = UNetBackbone(in_channels=in_ch, model_channels=32, num_head_channels=16,
                            context_dim=32, channel_mult=(1, 2), attention_ds=(1, 2))
        task = LatentDiffusionTask(unet, vae, sched, parameterization=param)
        params = {"unet": unet.init(k, jnp.zeros((1, 8, 8, in_ch)), jnp.zeros((1,)),
                                    ctx[:1])["params"]}
        batch = {"hq": jnp.zeros((2, 16, 16, 3)), "context": ctx, **extra}
        loss, m = getattr(task, fn_name)(params, frozen, batch, jax.random.key(1))
        assert np.isfinite(float(loss)), fn_name
        # gradient flows to the unet
        g = jax.grad(lambda p: getattr(task, fn_name)(p, frozen, batch, jax.random.key(1))[0])(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in leaves), fn_name


def test_depth_conditioning_matches_reference_math():
    """LatentDepth2ImageDiffusion.get_input's conditioning transform
    (ddpm.py:1724-1733): bicubic resize to latent hw (align_corners=False)
    + per-sample min-max normalize with denominator eps 0.001."""
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.train.ldm_tasks import LatentDiffusionTask

    rng = np.random.default_rng(11)
    depth = rng.standard_normal((2, 32, 32, 1), dtype=np.float32) * 3 + 5
    want_t = torch.nn.functional.interpolate(
        torch.from_numpy(depth.transpose(0, 3, 1, 2)), size=(8, 8),
        mode="bicubic", align_corners=False)
    dmin = torch.amin(want_t, dim=[1, 2, 3], keepdim=True)
    dmax = torch.amax(want_t, dim=[1, 2, 3], keepdim=True)
    want = (2.0 * (want_t - dmin) / (dmax - dmin + 0.001) - 1.0).numpy()

    task = LatentDiffusionTask(None, AutoencoderKL(ch=32, ch_mult=(1, 2)),
                               make_schedule("ldm_linear", 100))
    got = task.depth_conditioning(jnp.asarray(depth), (8, 8))
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=2e-5, rtol=2e-5)


def test_plms_matches_reference_ladder():
    """Full-step PLMS vs the reference PLMSSampler (plms.py:118-), including
    the staged order-1/2/3 warmup before 4th-order Adams-Bashforth."""
    import sys

    sys.path.insert(0, "/root/reference")
    from ldm.models.diffusion.plms import PLMSSampler

    n = 16
    sched = make_schedule("linear", n)
    acp = torch.tensor(np.asarray(sched.alphas_cumprod), dtype=torch.float64)

    class StubModel:
        num_timesteps = n
        device = torch.device("cpu")
        parameterization = "eps"
        betas = torch.tensor(np.asarray(sched.betas), dtype=torch.float32)
        alphas_cumprod = acp
        alphas_cumprod_prev = torch.tensor(
            np.asarray(sched.alphas_cumprod_prev), dtype=torch.float64
        )
        sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - acp).float()
        ddim_sigmas_for_original_num_steps = torch.zeros(n)  # eta=0

        def apply_model(self, x, t, c):
            return 0.3 * x + 0.01 * t.float().view(-1, 1, 1, 1)

    class CPUSampler(PLMSSampler):
        def register_buffer(self, name, attr):  # reference forces CUDA
            setattr(self, name, attr)

    ref = CPUSampler(StubModel())
    ref.make_schedule(ddim_num_steps=4, verbose=False)
    x0 = np.random.default_rng(0).standard_normal((1, 4, 8, 8)).astype(np.float32)
    got_ref, _ = ref.plms_sampling(
        cond=None, shape=x0.shape, x_T=torch.tensor(x0),
        ddim_use_original_steps=True, timesteps=n, log_every_t=10**9,
    )

    def model_fn(x, t):
        return 0.3 * x + 0.01 * t.astype(jnp.float32)[:, None, None, None]

    got = plms_sample_loop(
        sched, model_fn, x0.shape, jax.random.key(0),
        noise=jnp.asarray(x0), learned_range=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), got_ref.numpy(), rtol=2e-4, atol=2e-4
    )


def _load_reference_edm():
    import sys
    import types

    # edm_sample.py does `from diffusion.model.utils import *` (which pulls
    # torch etc.); satisfy it with a stub module exposing torch. The stubs
    # are REMOVED afterwards — leaving an empty 'diffusion' package in
    # sys.modules breaks later oracle imports of the real reference tree.
    added = []
    mod = types.ModuleType("diffusion.model.utils")
    mod.torch = torch
    for pkg in ("diffusion", "diffusion.model"):
        if pkg not in sys.modules:
            sys.modules[pkg] = types.ModuleType(pkg)
            added.append(pkg)
    had_utils = "diffusion.model.utils" in sys.modules
    old_utils = sys.modules.get("diffusion.model.utils")
    sys.modules["diffusion.model.utils"] = mod
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "ref_edm", "/root/reference/diffusion/model/edm_sample.py")
        m = importlib.util.module_from_spec(spec)
        m.__dict__["torch"] = torch
        spec.loader.exec_module(m)
    finally:
        for pkg in added:
            sys.modules.pop(pkg, None)
        if had_utils:
            sys.modules["diffusion.model.utils"] = old_utils
        else:
            sys.modules.pop("diffusion.model.utils", None)
    return m


@pytest.mark.parametrize("churn", [0.0, 10.0])
def test_edm_sampler_matches_reference(churn):
    """EDM Heun incl. stochastic churn (edm_sample.py:12-48) under matched
    noise draws."""
    from instarevive_tpu.diffusion.samplers import edm_sample_loop

    edm = _load_reference_edm()
    torch.manual_seed(0)
    w = torch.randn(3, 3) * 0.1

    class Net:
        sigma_min = 0.002
        sigma_max = 80.0

        @staticmethod
        def round_sigma(s):
            return torch.as_tensor(s)

        def __call__(self, x, sigma, *a, **k):
            return {"x": torch.einsum("bchw,cd->bdhw", x, w) * 0.5 + 0.1 * x}

    lat = torch.randn(1, 3, 8, 8)
    noises = [torch.randn_like(lat) for _ in range(64)]
    idx = {"i": 0}

    def fake_randn_like(t):
        n = noises[idx["i"]]
        idx["i"] += 1
        return n

    steps = 8
    want = edm.edm_sampler(
        Net(), lat.double(), num_steps=steps, randn_like=fake_randn_like,
        S_churn=churn, S_noise=1.0,
    ).float().numpy()

    wj = jnp.asarray(w.numpy())

    def denoise(x, sigma):
        return jnp.einsum("bhwc,cd->bhwd", x, wj) * 0.5 + 0.1 * x

    # drive the jax loop with the same init latent + churn noises
    calls = {"i": 0}
    orig = jax.random.normal

    def fake_normal(key, shape, dtype=None):
        if calls["i"] == 0:
            out = jnp.asarray(lat.numpy().transpose(0, 2, 3, 1))
        else:
            out = jnp.asarray(noises[calls["i"] - 1].numpy().transpose(0, 2, 3, 1))
        calls["i"] += 1
        return out

    jax.random.normal = fake_normal
    try:
        got = edm_sample_loop(
            denoise, (1, 8, 8, 3), jax.random.key(0), num_steps=steps,
            S_churn=churn, S_noise=1.0,
        )
    finally:
        jax.random.normal = orig
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize(
    "cfg",
    [
        dict(discretization="vp", schedule="vp", scaling="vp", solver="euler"),
        dict(discretization="ve", schedule="ve", scaling="none", solver="heun"),
        dict(discretization="iddpm", schedule="linear", scaling="none", solver="heun"),
        dict(discretization="edm", schedule="linear", scaling="none", solver="heun",
             S_churn=5.0),
    ],
)
def test_edm_ablation_matches_reference(cfg):
    """Generalized ablation sampler (edm_sample.py:55-171): vp/ve/iddpm/edm
    discretizations, schedules, scalings, euler/heun, churn."""
    from instarevive_tpu.diffusion.samplers import edm_ablation_sample

    edm = _load_reference_edm()
    torch.manual_seed(1)
    w = torch.randn(3, 3) * 0.1

    class Net:
        sigma_min = 0.002
        sigma_max = 80.0

        @staticmethod
        def round_sigma(s):
            return torch.as_tensor(s)

        def __call__(self, x, sigma, *a, **k):
            return {"x": torch.einsum("bchw,cd->bdhw", x, w) * 0.5 + 0.1 * x}

    lat = torch.randn(1, 3, 8, 8)
    noises = [torch.randn_like(lat) for _ in range(64)]
    idx = {"i": 0}

    def fake_randn_like(t):
        n = noises[idx["i"]]
        idx["i"] += 1
        return n

    steps = 6
    want = edm.ablation_sampler(
        Net(), lat.double(), num_steps=steps, randn_like=fake_randn_like, **cfg,
    ).float().numpy()

    wj = jnp.asarray(w.numpy())

    def denoise(x, sigma):
        return jnp.einsum("bhwc,cd->bhwd", x, wj) * 0.5 + 0.1 * x

    calls = {"i": 0}
    orig = jax.random.normal

    def fake_normal(key, shape, dtype=None):
        if calls["i"] == 0:
            out = jnp.asarray(lat.numpy().transpose(0, 2, 3, 1))
        else:
            out = jnp.asarray(noises[calls["i"] - 1].numpy().transpose(0, 2, 3, 1))
        calls["i"] += 1
        return out

    jax.random.normal = fake_normal
    try:
        got = edm_ablation_sample(
            denoise, (1, 8, 8, 3), jax.random.key(0), num_steps=steps,
            net_sigma_min=0.002, net_sigma_max=80.0, **cfg,
        )
    finally:
        jax.random.normal = orig
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=5e-4, rtol=2e-3
    )
