"""Diffusion processes vs the reference ADM port + DPM-Solver."""

import numpy as np
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
