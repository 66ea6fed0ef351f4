"""Additional samplers: PLMS, LCM, EDM, SA-Solver(-lite).

Parity targets:
  * PLMS (``ldm/models/diffusion/plms.py``): pseudo linear multistep over
    DDIM coefficients (Adams-Bashforth on eps),
  * LCM scheduler (``diffusion/lcm_scheduler.py:32-459``): boundary-condition
    scalings c_skip/c_out over a subsampled timestep ladder,
  * EDM (``diffusion/model/edm_sample.py``): Karras sigma schedule + Heun,
  * SA-Solver (``diffusion/model/sa_solver.py``): stochastic Adams; here the
    deterministic (tau=0) data-prediction multistep variant, which matches
    its predictor in the ODE limit.

All loops are lax.scan / unrolled Python over static step counts.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.diffusion.schedules import DiffusionSchedule, extract
from instarevive_tpu.diffusion import gaussian as G


# ---------------------------------------------------------------------------
# PLMS
# ---------------------------------------------------------------------------


def plms_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    learned_range: bool = True,
):
    """PLMS: DDIM transfer using Adams-Bashforth-extrapolated eps."""
    x = jax.random.normal(rng, shape) if noise is None else noise
    n = sched.num_timesteps
    b = shape[0]

    def get_eps(x, idx):
        t = jnp.full((b,), idx, dtype=jnp.int32)
        out = model_fn(x, sched.timestep_map[t])
        if learned_range:
            out = out[..., : x.shape[-1]]
        return out

    def transfer(x, eps, idx):
        t = jnp.full((b,), idx, dtype=jnp.int32)
        abar = extract(sched.alphas_cumprod, t, x.ndim)
        abar_prev = extract(sched.alphas_cumprod_prev, t, x.ndim)
        x0 = (x - jnp.sqrt(1 - abar) * eps) / jnp.sqrt(abar)
        return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1 - abar_prev) * eps

    # Staged multistep warmup, matching the reference ladder exactly
    # (plms.py p_sample_plms): RK2 first step, then order-2 (3e-e1)/2 and
    # order-3 (23e-16e1+5e2)/12 steps before switching to 4th-order AB.
    idx0 = n - 1
    e0 = get_eps(x, idx0)
    x1 = transfer(x, e0, idx0)
    e1 = get_eps(x1, max(idx0 - 1, 0))
    x = transfer(x, (e0 + e1) / 2.0, idx0)
    old = [e0]  # real eps history, newest last (reference old_eps list)

    idx = n - 2
    for formula in (
        lambda e, o: (3 * e - o[-1]) / 2.0,
        lambda e, o: (23 * e - 16 * o[-1] + 5 * o[-2]) / 12.0,
    ):
        if idx < 0:
            return x
        eps = get_eps(x, idx)
        x = transfer(x, formula(eps, old), idx)
        old.append(eps)
        idx -= 1

    hist = jnp.stack([old[-1], old[-2], old[-3]])  # newest at index 0

    def step(carry, idx):
        x, hist = carry
        eps = get_eps(x, idx)
        h0, h1, h2 = hist[0], hist[1], hist[2]
        # 4th-order Adams-Bashforth (plms.py get_x_prev_and_pred_x0 ladder)
        eps_prime = (55 * eps - 59 * h0 + 37 * h1 - 9 * h2) / 24.0
        x_new = transfer(x, eps_prime, idx)
        hist = jnp.stack([eps, h0, h1])
        return (x_new, hist), None

    if idx >= 0:
        (x, _), _ = jax.lax.scan(step, (x, hist), jnp.arange(idx, -1, -1))
    return x


# ---------------------------------------------------------------------------
# LCM
# ---------------------------------------------------------------------------


def lcm_boundary_scalings(t, sigma_data: float = 0.5, timestep_scaling: float = 10.0):
    """c_skip/c_out boundary conditions (lcm_scheduler.py get_scalings...)."""
    ts = t.astype(jnp.float32) * timestep_scaling
    c_skip = sigma_data**2 / (ts**2 + sigma_data**2)
    c_out = ts / jnp.sqrt(ts**2 + sigma_data**2)
    return c_skip, c_out


def lcm_timesteps(
    num_train_timesteps: int, num_steps: int, lcm_origin_steps: int
) -> np.ndarray:
    """LCMScheduler.set_timesteps (lcm_scheduler.py:288-312): subsample the
    LCM *training* ladder (every c-th original step, c = T // origin) by the
    skipping stride, descending."""
    c = num_train_timesteps // lcm_origin_steps
    origin = np.arange(1, lcm_origin_steps + 1) * c - 1
    skip = len(origin) // num_steps
    return origin[::-skip][:num_steps]


def lcm_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng: jax.Array,
    num_steps: int = 4,
    lcm_origin_steps: int = 50,
    learned_range: bool = True,
    prediction_type: str = "epsilon",
    noise_seq: Optional[jnp.ndarray] = None,
):
    """LCM multi-step (lcm_scheduler.py:288-412): consistency x0 prediction
    under the boundary-condition scalings, then re-noising to the next
    ladder step. Supports the reference's epsilon / sample / v_prediction
    parameterizations; ``noise_seq`` (num_steps, *shape) overrides the
    per-step normal draws (parity tests)."""
    n = sched.num_timesteps
    ladder = lcm_timesteps(n, num_steps, lcm_origin_steps)
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)
    b = shape[0]

    for i, idx in enumerate(ladder):
        t = jnp.full((b,), int(idx), dtype=jnp.int32)
        out = model_fn(x, sched.timestep_map[t])
        if learned_range:
            out = out[..., : x.shape[-1]]
        if prediction_type == "epsilon":
            x0 = G.predict_xstart_from_eps(sched, x, t, out)
        elif prediction_type == "sample":
            x0 = out
        elif prediction_type == "v_prediction":
            abar = extract(sched.alphas_cumprod, t, x.ndim)
            x0 = jnp.sqrt(abar) * x - jnp.sqrt(1.0 - abar) * out
        else:
            raise ValueError(prediction_type)
        c_skip, c_out = lcm_boundary_scalings(t.reshape((b,) + (1,) * (x.ndim - 1)))
        denoised = c_out * x0 + c_skip * x
        if num_steps > 1:
            if noise_seq is not None:
                noise = noise_seq[i]
            else:
                rng, n_rng = jax.random.split(rng)
                noise = jax.random.normal(n_rng, shape)
            # prev_timestep = next ladder entry (or t itself at the end)
            idx_prev = int(ladder[i + 1]) if i + 1 < len(ladder) else int(idx)
            t_prev = jnp.full((b,), idx_prev, dtype=jnp.int32)
            x = G.q_sample(sched, denoised, t_prev, noise)
            if i == len(ladder) - 1:
                return denoised
        else:
            x = denoised
    return x


# ---------------------------------------------------------------------------
# EDM (Karras)
# ---------------------------------------------------------------------------


def edm_sample_loop(
    denoise_fn: Callable,  # (x, sigma) -> x0 prediction
    shape,
    rng: jax.Array,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
):
    """Karras EDM Heun sampler with optional stochastic churn
    (edm_sample.py:12-48, Algorithm 2): when S_churn > 0 and the current
    sigma lies in [S_min, S_max], noise is temporarily increased by
    gamma = min(S_churn/num_steps, sqrt(2)-1) before the Heun step."""
    ts = np.asarray(
        (sigma_max ** (1 / rho)
         + np.arange(num_steps) / (num_steps - 1)
         * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    )
    ts = np.append(ts, 0.0)

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape) * ts[0]

    for i in range(num_steps):
        t_cur, t_next = float(ts[i]), float(ts[i + 1])
        gamma = (
            min(S_churn / num_steps, np.sqrt(2.0) - 1.0)
            if (S_churn > 0 and S_min <= t_cur <= S_max)
            else 0.0
        )
        t_hat = t_cur + gamma * t_cur
        if gamma > 0:
            rng, nk = jax.random.split(rng)
            x = x + np.sqrt(t_hat**2 - t_cur**2) * S_noise * jax.random.normal(nk, shape)
        d = (x - denoise_fn(x, jnp.float32(t_hat))) / t_hat
        x_next = x + (t_next - t_hat) * d
        if i < num_steps - 1:  # 2nd-order correction except at the last step
            d2 = (x_next - denoise_fn(x_next, jnp.float32(t_next))) / t_next
            x_next = x + (t_next - t_hat) * 0.5 * (d + d2)
        x = x_next
    return x


def edm_ablation_sample(
    denoise_fn: Callable,  # (x_scaled, sigma) -> x0 prediction
    shape,
    rng: jax.Array,
    num_steps: int = 18,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    rho: float = 7.0,
    solver: str = "heun",
    discretization: str = "edm",
    schedule: str = "linear",
    scaling: str = "none",
    epsilon_s: float = 1e-3,
    C_1: float = 0.001,
    C_2: float = 0.008,
    M: int = 1000,
    alpha: float = 1.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
    net_sigma_min: float = 0.0,
    net_sigma_max: float = float("inf"),
):
    """Generalized EDM ablation sampler (edm_sample.py:55-171): the superset
    of VP/VE/iDDPM/EDM discretizations, vp/ve/linear sigma(t) schedules,
    vp/none scalings, euler/heun solvers, and stochastic churn. All schedule
    quantities evaluate host-side in float64 at trace time."""
    assert solver in ("euler", "heun")
    assert discretization in ("vp", "ve", "iddpm", "edm")
    assert schedule in ("vp", "ve", "linear")
    assert scaling in ("vp", "none")

    vp_sigma = lambda bd, bm: lambda t: np.sqrt(np.exp(0.5 * bd * t**2 + bm * t) - 1.0)  # noqa: E731
    vp_sigma_inv = lambda bd, bm: lambda sg: (  # noqa: E731
        np.sqrt(bm**2 + 2 * bd * np.log(sg**2 + 1)) - bm
    ) / bd

    if sigma_min is None:
        sigma_min = {"vp": float(vp_sigma(19.1, 0.1)(epsilon_s)), "ve": 0.02,
                     "iddpm": 0.002, "edm": 0.002}[discretization]
    if sigma_max is None:
        sigma_max = {"vp": float(vp_sigma(19.1, 0.1)(1.0)), "ve": 100.0,
                     "iddpm": 81.0, "edm": 80.0}[discretization]
    # clamp to the network's supported range (edm_sample.py:84-85)
    sigma_min = max(sigma_min, net_sigma_min)
    sigma_max = min(sigma_max, net_sigma_max)

    vp_beta_d = 2 * (np.log(sigma_min**2 + 1) / epsilon_s - np.log(sigma_max**2 + 1)) / (epsilon_s - 1)
    vp_beta_min = np.log(sigma_max**2 + 1) - 0.5 * vp_beta_d

    idx = np.arange(num_steps, dtype=np.float64)
    if discretization == "vp":
        orig = 1 + idx / (num_steps - 1) * (epsilon_s - 1)
        sigma_steps = vp_sigma(vp_beta_d, vp_beta_min)(orig)
    elif discretization == "ve":
        orig = (sigma_max**2) * ((sigma_min**2 / sigma_max**2) ** (idx / (num_steps - 1)))
        sigma_steps = np.sqrt(orig)
    elif discretization == "iddpm":
        u = np.zeros(M + 1)
        abar = lambda j: np.sin(0.5 * np.pi * j / M / (C_2 + 1)) ** 2  # noqa: E731
        for j in range(M, 0, -1):
            u[j - 1] = np.sqrt((u[j] ** 2 + 1) / max(abar(j - 1) / abar(j), C_1) - 1)
        uf = u[(u >= sigma_min) & (u <= sigma_max)]
        sigma_steps = uf[np.round((len(uf) - 1) / (num_steps - 1) * idx).astype(int)]
    else:
        sigma_steps = (sigma_max ** (1 / rho) + idx / (num_steps - 1)
                       * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho

    if schedule == "vp":
        sigma_f = vp_sigma(vp_beta_d, vp_beta_min)
        sigma_deriv = lambda t: 0.5 * (vp_beta_min + vp_beta_d * t) * (sigma_f(t) + 1.0 / sigma_f(t))  # noqa: E731
        sigma_inv = vp_sigma_inv(vp_beta_d, vp_beta_min)
    elif schedule == "ve":
        sigma_f = lambda t: np.sqrt(t)  # noqa: E731
        sigma_deriv = lambda t: 0.5 / np.sqrt(t)  # noqa: E731
        sigma_inv = lambda sg: sg**2  # noqa: E731
    else:
        sigma_f = lambda t: t  # noqa: E731
        sigma_deriv = lambda t: 1.0  # noqa: E731
        sigma_inv = lambda sg: sg  # noqa: E731

    if scaling == "vp":
        s_f = lambda t: 1.0 / np.sqrt(1.0 + sigma_f(t) ** 2)  # noqa: E731
        s_deriv = lambda t: -sigma_f(t) * sigma_deriv(t) * (s_f(t) ** 3)  # noqa: E731
    else:
        s_f = lambda t: 1.0  # noqa: E731
        s_deriv = lambda t: 0.0  # noqa: E731

    t_steps = np.append(sigma_inv(sigma_steps), 0.0)

    rng, init_rng = jax.random.split(rng)
    t0 = float(t_steps[0])
    x = jax.random.normal(init_rng, shape) * (sigma_f(t0) * s_f(t0))
    for i in range(num_steps):
        t_cur, t_next = float(t_steps[i]), float(t_steps[i + 1])
        sc = sigma_f(t_cur)
        gamma = (
            min(S_churn / num_steps, np.sqrt(2.0) - 1.0)
            if (S_churn > 0 and S_min <= sc <= S_max)
            else 0.0
        )
        t_hat = float(sigma_inv(sc + gamma * sc))
        sh, ssh = float(sigma_f(t_hat)), float(s_f(t_hat))
        x_hat = (ssh / s_f(t_cur)) * x
        if gamma > 0:
            rng, nk = jax.random.split(rng)
            x_hat = x_hat + np.sqrt(max(sh**2 - sc**2, 0.0)) * ssh * S_noise \
                * jax.random.normal(nk, shape)
        h = t_next - t_hat
        den = denoise_fn(x_hat / ssh, jnp.float32(sh))
        d_cur = (sigma_deriv(t_hat) / sh + s_deriv(t_hat) / ssh) * x_hat \
            - sigma_deriv(t_hat) * ssh / sh * den
        if solver == "euler" or i == num_steps - 1:
            x = x_hat + h * d_cur
        else:
            t_p = t_hat + alpha * h
            x_p = x_hat + alpha * h * d_cur
            sp, ssp = float(sigma_f(t_p)), float(s_f(t_p))
            den2 = denoise_fn(x_p / ssp, jnp.float32(sp))
            d_p = (sigma_deriv(t_p) / sp + s_deriv(t_p) / ssp) * x_p \
                - sigma_deriv(t_p) * ssp / sp * den2
            x = x_hat + h * ((1 - 1 / (2 * alpha)) * d_cur + (1 / (2 * alpha)) * d_p)
    return x


# ---------------------------------------------------------------------------
# SA-Solver (deterministic data-prediction multistep, order 2)
# ---------------------------------------------------------------------------


def sa_solver_sample(
    model_fn: Callable,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    steps: int = 25,
):
    """Deterministic SA-Solver predictor (tau=0), equivalent to the
    data-prediction multistep ODE solver over the VP schedule — shares the
    DPM-Solver++ machinery (dpm_solver.py)."""
    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m

    return dpm_solver_pp_2m(model_fn, sched, x, steps=steps)


# ---------------------------------------------------------------------------
# SA-Solver, stochastic (tau > 0) data-prediction multistep
# ---------------------------------------------------------------------------


def sa_solver_stochastic(
    model_fn: Callable,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    rng: jax.Array,
    steps: int = 25,
    tau: float = 1.0,
    t_start: float = 1.0,
    t_end: Optional[float] = None,
):
    """Stochastic Adams solver (SA-Solver, Xue et al. 2023), order-2
    data-prediction predictor with tau-scaled noise injection
    (reference diffusion/model/sa_solver.py). tau=0 reduces to the
    deterministic exponential-integrator multistep (DPM-Solver++-like).

    Update (data prediction, per step with h = lambda_{i+1} - lambda_i):
      x_{i+1} = (sigma_{i+1}/sigma_i) e^{-tau^2 h} x_i
                + b1 x0_i + b2 (x0_i - x0_{i-1}) / r
                + sigma_{i+1} sqrt(1 - e^{-2 tau^2 h}) xi
    with b-coefficients from the exponential integrals of e^{(1+tau^2)s}.
    """
    from instarevive_tpu.diffusion.dpm_solver import (
        VPGrid,
        _alpha_sigma_lambda,
        vp_grid,
    )

    grid = vp_grid(sched)
    t_end = t_end if t_end is not None else 1.0 / grid.total_n
    ts = jnp.linspace(t_start, t_end, steps + 1)
    s2 = 1.0 + tau * tau

    def to_discrete(t_cont):
        return (t_cont - 1.0 / grid.total_n) * 1000.0

    def x0_pred(x, t_cont):
        alpha, sigma, _ = _alpha_sigma_lambda(grid, t_cont)
        b = x.shape[0]
        eps = model_fn(x, jnp.full((b,), to_discrete(t_cont)))
        return (x - sigma * eps) / alpha

    def transfer(x, x0_cur, x0_prev, t_prev, t_cur, h_prev, key, first):
        """Exact exponential-integrator step for the SA data-prediction SDE:

        x_{i+1} = (s_c/s_p) e^{-tau^2 h} x
                  + a_c A int_{lam_p}^{lam_c} e^{A(lam - lam_c)} x0(lam) dlam
                  + s_c sqrt(1 - e^{-2 tau^2 h}) xi,      A = 1 + tau^2,

        with x0(lam) linear-extrapolated through (x0_{i-1}, x0_i):
          int e^{A u} du                 -> (1 - e^{-Ah}) / A
          int e^{A u} (u + h) du         -> h/A - (1 - e^{-Ah}) / A^2
        """
        a_c, s_c, lam_c = _alpha_sigma_lambda(grid, t_cur)
        _, s_p, lam_p = _alpha_sigma_lambda(grid, t_prev)
        h = lam_c - lam_p
        e = jnp.exp(-s2 * h)
        decay = jnp.exp(-tau * tau * h)
        x_new = (s_c / s_p) * decay * x + a_c * (1.0 - e) * x0_cur
        if not first:
            slope = (x0_cur - x0_prev) / h_prev  # d x0 / d lambda (backward)
            x_new = x_new + a_c * (h - (1.0 - e) / s2) * slope
        if tau > 0:
            noise = jax.random.normal(key, x.shape)
            x_new = x_new + s_c * jnp.sqrt(jnp.maximum(1.0 - decay * decay, 0.0)) * noise
        return x_new, h

    # first step: order-1
    rng, k = jax.random.split(rng)
    x0_0 = x0_pred(x, ts[0])
    x, h0 = transfer(x, x0_0, None, ts[0], ts[1], None, k, first=True)

    x0_prev, h_prev = x0_0, h0
    for i in range(1, steps):
        rng, k = jax.random.split(rng)
        x0_cur = x0_pred(x, ts[i])
        x, h_prev = transfer(x, x0_cur, x0_prev, ts[i], ts[i + 1], h_prev, k, first=False)
        x0_prev = x0_cur
    return x
