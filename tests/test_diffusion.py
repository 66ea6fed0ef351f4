"""Diffusion processes vs the reference ADM port + DPM-Solver."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion import gaussian as G
from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m
from instarevive_tpu.diffusion.one_step import eps_to_x0, generate_sample_1step
from instarevive_tpu.diffusion.respace import respaced_schedule, space_timesteps
from instarevive_tpu.diffusion.schedules import make_schedule, named_betas

from tests.oracles import load_reference_diffusion


def test_named_betas_match_reference():
    gd, _, _ = load_reference_diffusion()
    for name in ("linear", "squaredcos_cap_v2"):
        ref = gd.get_named_beta_schedule(name, 1000)
        ours = named_betas(name, 1000)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_schedule_quantities_match_reference():
    gd, _, _ = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)
    ref = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
    )
    s = make_schedule("linear", 1000)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ref.alphas_cumprod, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1), ref.posterior_mean_coef1, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_log_variance_clipped),
        ref.posterior_log_variance_clipped,
        rtol=1e-5,
    )


def test_q_sample_and_posterior_match():
    gd, _, _ = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)
    ref = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )
    s = make_schedule("linear", 1000)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    noise = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    t = np.array([10, 700])

    want = ref.q_sample(
        torch.from_numpy(np.transpose(x0, (0, 3, 1, 2))),
        torch.from_numpy(t),
        torch.from_numpy(np.transpose(noise, (0, 3, 1, 2))),
    ).numpy()
    got = np.asarray(G.q_sample(s, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-5)


def test_respacing_matches_reference():
    gd, rs, _ = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)
    use = space_timesteps(1000, "ddim25")
    ref_use = rs.space_timesteps(1000, "ddim25")
    assert use == ref_use

    spaced = rs.SpacedDiffusion(
        use_timesteps=use,
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
    )
    ours = respaced_schedule("linear", 1000, "ddim25")
    np.testing.assert_allclose(np.asarray(ours.betas), spaced.betas, rtol=1e-6)
    assert list(np.asarray(ours.timestep_map)) == list(spaced.timestep_map)


def test_eps_to_x0_matches_ddpm_scheduler_math():
    # eps_to_mu (generate.py:44-51) against a direct numpy transcription
    s = make_schedule("linear", 1000)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    eps = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    t = np.array([400, 400])

    abar = np.asarray(s.alphas_cumprod)[t][:, None, None, None]
    want = (z - np.sqrt(1 - abar) * eps) / np.sqrt(abar)
    got = np.asarray(eps_to_x0(s, jnp.asarray(eps), jnp.asarray(z), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_generate_sample_1step_splits_sigma():
    s = make_schedule("linear", 1000)

    def model_fn(x, t):
        eps = x * 0.1
        sigma = jnp.zeros_like(x)
        return jnp.concatenate([eps, sigma], axis=-1)

    z = jnp.ones((1, 4, 4, 4))
    out = generate_sample_1step(model_fn, s, z, 400)
    assert out.shape == z.shape
    want = eps_to_x0(s, z * 0.1, z, jnp.asarray([400]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_ddim_loop_runs_and_is_deterministic():
    s = respaced_schedule("linear", 1000, "ddim10")

    def model_fn(x, t):
        eps = 0.05 * x
        var = jnp.zeros_like(x)
        return jnp.concatenate([eps, var], axis=-1)

    rng = jax.random.key(0)
    out1 = G.ddim_sample_loop(s, model_fn, (1, 8, 8, 4), rng)
    out2 = G.ddim_sample_loop(s, model_fn, (1, 8, 8, 4), rng)
    assert np.allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_dpm_solver_matches_reference():
    gd, _, dpm = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)

    torch.manual_seed(0)
    w = torch.randn(4, 4) * 0.05

    def torch_model(x, t_in, *args, **kw):
        # simple linear eps model over channels
        return torch.einsum("bchw,cd->bdhw", x, w)

    ns = dpm.NoiseScheduleVP("discrete", betas=torch.from_numpy(betas))
    wrapped = dpm.model_wrapper(
        torch_model, ns, model_type="noise", guidance_type="uncond"
    )
    solver = dpm.DPM_Solver(wrapped, ns, algorithm_type="dpmsolver++")
    x_init = torch.randn(1, 4, 8, 8)
    want = solver.sample(
        x_init.clone(),
        steps=10,
        order=2,
        skip_type="time_uniform",
        method="multistep",
        lower_order_final=False,
    ).numpy()

    s = make_schedule("linear", 1000)
    wj = jnp.asarray(w.numpy())

    def jax_model(x, t_in):  # NHWC
        return jnp.einsum("bhwc,cd->bhwd", x, wj)

    got = dpm_solver_pp_2m(
        jax_model, s, jnp.asarray(x_init.numpy().transpose(0, 2, 3, 1)), steps=10
    )
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(order=2, method="multistep"),
        dict(order=3, method="multistep"),
        dict(order=1, method="multistep"),
        dict(order=2, method="multistep", algorithm="dpmsolver"),
        dict(order=2, method="multistep", solver_type="taylor"),
        dict(order=2, method="singlestep_fixed"),
        dict(order=2, method="singlestep", steps=11),
        dict(order=3, method="singlestep", steps=10),
        dict(order=3, method="singlestep_fixed", steps=9),
        dict(order=2, method="multistep", skip_type="logSNR"),
        dict(order=2, method="multistep", skip_type="time_quadratic"),
        dict(order=2, method="multistep", dynamic_thresholding=True),
        dict(order=2, method="multistep", denoise_to_zero=True),
        # denoise_to_zero must route through the thresholded x0 corrector
        # (reference data_prediction_fn; ADVICE r2)
        dict(order=2, method="multistep", denoise_to_zero=True,
             dynamic_thresholding=True),
    ],
)
def test_dpm_solver_family_matches_reference(kwargs):
    """Full solver family (VERDICT r1 item 6): orders 1-3, multistep /
    singlestep, dpmsolver & dpmsolver++, taylor variant, all three grids,
    dynamic thresholding — step-equivalent to reference DPM_Solver.sample
    (diffusion/model/dpm_solver.py:1069-1283)."""
    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_sample

    gd, _, dpm = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)

    torch.manual_seed(0)
    w = torch.randn(4, 4) * 0.05

    def torch_model(x, t_in, *args, **kw):
        return torch.einsum("bchw,cd->bdhw", x, w) + 1e-4 * t_in.view(-1, 1, 1, 1)

    kwargs = dict(kwargs)
    steps = kwargs.pop("steps", 10)
    dyn = kwargs.pop("dynamic_thresholding", False)
    ns = dpm.NoiseScheduleVP("discrete", betas=torch.from_numpy(betas))
    wrapped = dpm.model_wrapper(
        torch_model, ns, model_type="noise", guidance_type="uncond"
    )
    solver = dpm.DPM_Solver(
        wrapped, ns,
        algorithm_type=kwargs.get("algorithm", "dpmsolver++"),
        correcting_x0_fn="dynamic_thresholding" if dyn else None,
    )
    x_init = torch.randn(1, 4, 8, 8)
    want = solver.sample(
        x_init.clone(),
        steps=steps,
        order=kwargs.get("order", 2),
        skip_type=kwargs.get("skip_type", "time_uniform"),
        method=kwargs.get("method", "multistep"),
        solver_type=kwargs.get("solver_type", "dpmsolver"),
        lower_order_final=True,
        denoise_to_zero=kwargs.get("denoise_to_zero", False),
    ).numpy()

    s = make_schedule("linear", 1000)
    wj = jnp.asarray(w.numpy())

    def jax_model(x, t_in):  # NHWC
        return jnp.einsum("bhwc,cd->bhwd", x, wj) + 1e-4 * t_in.reshape(-1, 1, 1, 1)

    got = dpm_solver_sample(
        jax_model, s, jnp.asarray(x_init.numpy().transpose(0, 2, 3, 1)),
        steps=steps, dynamic_thresholding=dyn, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=5e-4, rtol=2e-3
    )


def _load_reference_sa_solver():
    from tests.oracles import _load_as

    return _load_as("refdiff", "sa_solver", "/root/reference/diffusion/model/sa_solver.py")


@pytest.mark.parametrize(
    "cfg",
    [
        dict(mode="few_steps", tau=0.0, pc_mode="PEC"),
        dict(mode="few_steps", tau=0.0, pc_mode="PECE"),
        dict(mode="more_steps", tau=0.0, pc_mode="PEC"),
        dict(mode="few_steps", tau=1.0, pc_mode="PEC"),
        dict(mode="more_steps", tau=0.7, pc_mode="PECE"),
        dict(mode="few_steps", tau=0.0, pc_mode="PEC", predictor_order=2,
             corrector_order=2, skip_type="logSNR"),
        dict(mode="few_steps", tau=0.5, pc_mode="PEC", algorithm="noise_prediction"),
    ],
)
def test_sa_solver_matches_reference(cfg):
    """Real SA-Solver PECE (VERDICT r1 item 6): Adams-Bashforth predictor +
    Adams-Moulton corrector with Lagrange exponential integrals, few/more
    steps, matched noise streams vs reference SASolver.sample
    (diffusion/model/sa_solver.py:1066-1096)."""
    from instarevive_tpu.diffusion.sa_solver import sa_solver_pc_sample

    sa = _load_reference_sa_solver()
    gd, _, _ = load_reference_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)

    torch.manual_seed(0)
    w = torch.randn(4, 4) * 0.05

    def torch_model(x, t_in, *args, **kw):
        return torch.einsum("bchw,cd->bdhw", x, w) + 1e-4 * t_in.view(-1, 1, 1, 1)

    cfg = dict(cfg)
    steps = cfg.pop("steps", 8)
    tau_val = cfg.pop("tau")
    algo = cfg.pop("algorithm", "data_prediction")
    ns = sa.NoiseScheduleVP("discrete", betas=torch.from_numpy(betas))
    wrapped = sa.model_wrapper(torch_model, ns, model_type="noise", guidance_type="uncond")
    solver = sa.SASolver(wrapped, ns, algorithm_type=algo)
    x_init = torch.randn(1, 4, 8, 8)

    # matched noise stream: the reference draws one normal per outer step
    noises = [torch.randn_like(x_init) for _ in range(steps + 1)]
    idx = {"i": 0}
    orig_randn_like = torch.randn_like

    def fake_randn_like(t, **kw):
        n = noises[idx["i"]]
        idx["i"] += 1
        return n

    torch.randn_like = fake_randn_like
    try:
        want = solver.sample(
            mode=cfg["mode"], x=x_init.clone(), tau=lambda t: tau_val, steps=steps,
            predictor_order=cfg.get("predictor_order", 3),
            corrector_order=cfg.get("corrector_order", 4),
            pc_mode=cfg.get("pc_mode", "PEC"),
            skip_type=cfg.get("skip_type", "time"),
        ).numpy()
    finally:
        torch.randn_like = orig_randn_like

    s = make_schedule("linear", 1000)
    wj = jnp.asarray(w.numpy())

    def jax_model(x, t_in):  # NHWC
        return jnp.einsum("bhwc,cd->bhwd", x, wj) + 1e-4 * t_in.reshape(-1, 1, 1, 1)

    noise_seq = jnp.stack(
        [jnp.asarray(n.numpy().transpose(0, 2, 3, 1)) for n in noises]
    )
    got = sa_solver_pc_sample(
        jax_model, s, jnp.asarray(x_init.numpy().transpose(0, 2, 3, 1)),
        mode=cfg["mode"], tau=tau_val, steps=steps,
        predictor_order=cfg.get("predictor_order", 3),
        corrector_order=cfg.get("corrector_order", 4),
        pc_mode=cfg.get("pc_mode", "PEC"),
        skip_type=cfg.get("skip_type", "time"),
        algorithm=algo,
        noise_seq=noise_seq,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=1e-3, rtol=3e-3
    )


def _load_reference_lcm():
    """Import reference lcm_scheduler.py with diffusers mixins stubbed.
    The stubs are removed afterwards — an incomplete 'diffusers' left in
    sys.modules breaks later oracle imports (test_unet ImportError)."""
    import sys
    import types

    added_diffusers = "diffusers" not in sys.modules
    if "diffusers" not in sys.modules:
        d = types.ModuleType("diffusers")

        class ConfigMixin:
            pass

        class SchedulerMixin:
            pass

        d.ConfigMixin = ConfigMixin
        d.SchedulerMixin = SchedulerMixin
        cu = types.ModuleType("diffusers.configuration_utils")

        def register_to_config(fn):
            import functools
            import inspect

            @functools.wraps(fn)
            def wrapper(self, *args, **kwargs):
                sig = inspect.signature(fn)
                bound = sig.bind(self, *args, **kwargs)
                bound.apply_defaults()
                cfg = dict(bound.arguments)
                cfg.pop("self")
                self.config = types.SimpleNamespace(**cfg)
                return fn(self, *args, **kwargs)

            return wrapper

        cu.register_to_config = register_to_config
        du = types.ModuleType("diffusers.utils")

        class BaseOutput:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        du.BaseOutput = BaseOutput
        d.configuration_utils = cu
        d.utils = du
        sys.modules["diffusers"] = d
        sys.modules["diffusers.configuration_utils"] = cu
        sys.modules["diffusers.utils"] = du
    from tests.oracles import _load_as

    try:
        return _load_as(
            "refdiff", "lcm_scheduler", "/root/reference/diffusion/lcm_scheduler.py"
        )
    finally:
        if added_diffusers:
            for name in ("diffusers", "diffusers.configuration_utils",
                         "diffusers.utils"):
                sys.modules.pop(name, None)


@pytest.mark.parametrize("num_steps,prediction_type", [(4, "epsilon"), (1, "epsilon"), (8, "v_prediction")])
def test_lcm_matches_reference_scheduler(num_steps, prediction_type):
    """Full LCM scheduler semantics (VERDICT r1 item 6): the ladder
    (set_timesteps), boundary scalings, per-parameterization x0, and the
    re-noise step match reference LCMScheduler (lcm_scheduler.py:288-412)
    under matched noise."""
    from instarevive_tpu.diffusion.samplers import lcm_sample_loop, lcm_timesteps

    lcm = _load_reference_lcm()
    sched_ref = lcm.LCMScheduler(beta_schedule="linear", prediction_type=prediction_type)
    sched_ref.set_timesteps(num_steps, lcm_origin_steps=50)

    torch.manual_seed(0)
    w = torch.randn(4, 4) * 0.05

    def torch_model(x, t):
        return torch.einsum("bchw,cd->bdhw", x, w) + 1e-4 * float(t)

    x0_init = torch.randn(1, 4, 8, 8)
    noises = [torch.randn_like(x0_init) for _ in range(num_steps)]
    x = x0_init.clone()
    denoised = None
    for i, t in enumerate(sched_ref.timesteps):
        out = torch_model(x, int(t))
        orig = torch.randn
        torch.randn = lambda *a, **k: noises[i]
        try:
            x, denoised = sched_ref.step(out, i, int(t), x, return_dict=False)
        finally:
            torch.randn = orig
    want = denoised.numpy()

    # ladder parity
    np.testing.assert_array_equal(
        lcm_timesteps(1000, num_steps, 50), sched_ref.timesteps.numpy()
    )

    # make_schedule("linear") is the ADM convention == DDPM linspace at T=1000
    s = make_schedule("linear", 1000)
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod), sched_ref.alphas_cumprod.numpy(), rtol=1e-5
    )
    wj = jnp.asarray(w.numpy())

    def jax_model(x, t):  # NHWC; t arrives as the discrete map value
        return jnp.einsum("bhwc,cd->bhwd", x, wj) + 1e-4 * t.astype(jnp.float32).reshape(-1, 1, 1, 1)

    # match the initial draw: lcm_sample_loop draws x from rng; instead we
    # inject via noise_seq + a model closure over the same x_init by using
    # the identity that the loop's init normal is keyed — so drive the loop
    # manually through its public API with the torch x_init via noise_seq
    # trick: num_steps normals + fixed init handled by rng? Simpler: call
    # the loop body via the same public function but overriding the init.
    import instarevive_tpu.diffusion.samplers as S

    rng = jax.random.key(0)

    orig_normal = jax.random.normal
    calls = {"n": 0}

    def fake_normal(key, shape, dtype=None):
        calls["n"] += 1
        return jnp.asarray(x0_init.numpy().transpose(0, 2, 3, 1))

    jax.random.normal = fake_normal
    try:
        got = lcm_sample_loop(
            s, jax_model, (1, 8, 8, 4), rng, num_steps=num_steps,
            lcm_origin_steps=50, learned_range=False,
            prediction_type=prediction_type,
            noise_seq=jnp.stack([jnp.asarray(n.numpy().transpose(0, 2, 3, 1)) for n in noises]) if num_steps > 1 else None,
        )
    finally:
        jax.random.normal = orig_normal
    assert calls["n"] == 1  # only the init draw was intercepted
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
