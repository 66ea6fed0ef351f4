"""DPM-Solver++ (2M, data-prediction multistep) on a discrete VP schedule.

Parity target: reference ``diffusion/model/dpm_solver.py`` (NoiseScheduleVP
'discrete' + DPM_Solver order-2 multistep, the `DPMS` wrapper used by
``scripts/inference.py:109-120`` and the ControlNet validation loop,
``test_scripts/test_controlnet.py:142-153``) — rebuilt as a lax.scan over a
precomputed time grid (one compiled program for any step count).

The model function predicts epsilon at *discrete* timesteps; classifier-free
guidance is expressed by wrapping ``model_fn`` (see one_step.cfg_wrap or an
eps-only CFG closure).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.diffusion.schedules import DiffusionSchedule


class VPGrid(NamedTuple):
    t_grid: jnp.ndarray  # (T,) continuous times 1/T..1
    log_alpha_grid: jnp.ndarray  # 0.5*log(alphas_cumprod)
    total_n: int


def vp_grid(sched: DiffusionSchedule) -> VPGrid:
    n = sched.num_timesteps
    t = np.arange(1, n + 1, dtype=np.float64) / n
    log_alpha = 0.5 * np.log(np.asarray(sched.alphas_cumprod, dtype=np.float64))
    return VPGrid(jnp.asarray(t, jnp.float32), jnp.asarray(log_alpha, jnp.float32), n)


def _log_alpha(grid: VPGrid, t):
    return jnp.interp(t, grid.t_grid, grid.log_alpha_grid)


def _alpha_sigma_lambda(grid: VPGrid, t):
    log_a = _log_alpha(grid, t)
    alpha = jnp.exp(log_a)
    sigma = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_a), 1e-12))
    lam = log_a - jnp.log(sigma)
    return alpha, sigma, lam


def dpm_solver_pp_2m(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    steps: int = 20,
    t_start: float = 1.0,
    t_end: float = None,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Sample with DPM-Solver++(2M), time_uniform grid.

    ``model_fn(x, t_discrete)`` -> eps, where t_discrete follows the
    reference model_wrapper convention t_in = (t_cont - 1/N) * 1000.
    """
    grid = vp_grid(sched)
    t_end = t_end if t_end is not None else 1.0 / grid.total_n
    ts = jnp.linspace(t_start, t_end, steps + 1)

    def to_discrete(t_cont):
        return (t_cont - 1.0 / grid.total_n) * 1000.0

    def x0_pred(x, t_cont):
        alpha, sigma, _ = _alpha_sigma_lambda(grid, t_cont)
        b = x.shape[0]
        t_in = jnp.full((b,), to_discrete(t_cont))
        eps = model_fn(x, t_in)
        x0 = (x - sigma * eps) / alpha
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    # first step: first-order (DPM-Solver++ 1) to bootstrap the multistep
    t0, t1 = ts[0], ts[1]
    x0_0 = x0_pred(x, t0)
    a1, s1, lam1 = _alpha_sigma_lambda(grid, t1)
    _, s0, lam0 = _alpha_sigma_lambda(grid, t0)
    h0 = lam1 - lam0
    x = (s1 / s0) * x - a1 * jnp.expm1(-h0) * x0_0

    def step(carry, idx):
        x, x0_prev, lam_prev, h_prev = carry
        t_prev, t_cur = ts[idx], ts[idx + 1]
        x0_cur = x0_pred(x, t_prev)
        a_c, s_c, lam_c = _alpha_sigma_lambda(grid, t_cur)
        _, s_p, lam_p = _alpha_sigma_lambda(grid, t_prev)
        h = lam_c - lam_p
        r = h_prev / h
        d = (1.0 + 1.0 / (2.0 * r)) * x0_cur - (1.0 / (2.0 * r)) * x0_prev
        x_new = (s_c / s_p) * x - a_c * jnp.expm1(-h) * d
        return (x_new, x0_cur, lam_c, h), None

    if steps > 1:
        (x, _, _, _), _ = jax.lax.scan(
            step, (x, x0_0, lam1, h0), jnp.arange(1, steps)
        )
    return x
