"""DPM-Solver / DPM-Solver++ on a discrete VP schedule.

Parity target: reference ``diffusion/model/dpm_solver.py:5-1336``
(NoiseScheduleVP 'discrete' + DPM_Solver), used by ``scripts/inference.py:
109-120`` and the ControlNet validation loop (``test_scripts/
test_controlnet.py:142-153``). Two surfaces:

  * ``dpm_solver_pp_2m`` — the guided-sampling hot path (order-2 multistep
    DPM-Solver++), as a lax.scan over a precomputed grid;
  * ``dpm_solver_sample`` — the full solver family: orders 1-3, multistep /
    singlestep / singlestep_fixed methods, dpmsolver & dpmsolver++
    algorithms, dpmsolver/taylor expansion variants, time_uniform / logSNR /
    time_quadratic grids, dynamic thresholding (Imagen), lower_order_final,
    denoise_to_zero.

TPU-first structure: the time grid, per-step orders and every (alpha, sigma,
lambda) coefficient are resolved host-side in float64 numpy at trace time
(they depend only on static step counts), so the compiled program is a pure
chain of model calls and fused elementwise updates — no on-device schedule
interpolation. The model function predicts epsilon at *discrete* timesteps;
classifier-free guidance is expressed by wrapping ``model_fn``.
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


# ---------------------------------------------------------------------------
# Full solver family (orders 1-3, multistep/singlestep, dpmsolver/dpmsolver++)
# ---------------------------------------------------------------------------


class _HostNS:
    """Host-side float64 NoiseScheduleVP('discrete') (dpm_solver.py:6-170):
    piecewise-linear log-alpha(t) with the -5.1 log-SNR numerical clip, plus
    the inverse lambda map. All evaluations happen at trace time on static
    python floats, so every coefficient bakes into the compiled program."""

    def __init__(self, sched: DiffusionSchedule):
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        log_alphas = 0.5 * np.log(acp)
        # numerical_clip_alpha (dpm_solver.py:114-126)
        log_sigmas = 0.5 * np.log1p(-np.exp(2.0 * log_alphas))
        lambs = log_alphas - log_sigmas
        idx = int(np.searchsorted(lambs[::-1], -5.1))
        if idx > 0:
            log_alphas = log_alphas[:-idx]
        self.total_n = len(log_alphas)
        self.t_array = np.arange(1, self.total_n + 1, dtype=np.float64) / self.total_n
        self.log_alpha_array = log_alphas
        self.T = 1.0

    def log_mean_coeff(self, t):
        return np.interp(t, self.t_array, self.log_alpha_array)

    def alpha(self, t):
        return float(np.exp(self.log_mean_coeff(t)))

    def std(self, t):
        return float(np.sqrt(1.0 - np.exp(2.0 * self.log_mean_coeff(t))))

    def lam(self, t):
        la = self.log_mean_coeff(t)
        return float(la - 0.5 * np.log1p(-np.exp(2.0 * la)))

    def inverse_lambda(self, lamb):
        log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * np.asarray(lamb, np.float64))
        # log_alpha is decreasing in t -> interp on the flipped arrays
        return float(
            np.interp(log_alpha, self.log_alpha_array[::-1], self.t_array[::-1])
        )


def _time_grid(ns: _HostNS, skip_type: str, t_T: float, t_0: float, n: int):
    """get_time_steps (dpm_solver.py:455-483)."""
    if skip_type == "logSNR":
        lams = np.linspace(ns.lam(t_T), ns.lam(t_0), n + 1)
        return np.array([ns.inverse_lambda(l) for l in lams])
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, n + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T**0.5, t_0**0.5, n + 1) ** 2
    raise ValueError(f"unknown skip_type {skip_type}")


def _dynamic_threshold(x0, ratio: float, max_val: float):
    """Imagen dynamic thresholding (dpm_solver.py:418-427)."""
    b = x0.shape[0]
    s = jnp.quantile(jnp.abs(x0.reshape(b, -1)), ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((b,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def dpm_solver_sample(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    steps: int = 20,
    order: int = 2,
    method: str = "multistep",
    algorithm: str = "dpmsolver++",
    skip_type: str = "time_uniform",
    solver_type: str = "dpmsolver",
    t_start: float = None,
    t_end: float = None,
    lower_order_final: bool = True,
    denoise_to_zero: bool = False,
    dynamic_thresholding: bool = False,
    thresholding_ratio: float = 0.995,
    thresholding_max_val: float = 1.0,
) -> jnp.ndarray:
    """Full DPM-Solver(++) sampler (reference DPM_Solver.sample,
    dpm_solver.py:1069-1283). ``model_fn(x, t_discrete) -> eps``."""
    assert order in (1, 2, 3) and algorithm in ("dpmsolver", "dpmsolver++")
    assert solver_type in ("dpmsolver", "taylor")
    ns = _HostNS(sched)
    t_0 = 1.0 / ns.total_n if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    b = x.shape[0]
    pp = algorithm == "dpmsolver++"

    def raw_eps(x, t):
        # model_wrapper discrete-time convention (dpm_solver.py:273-282)
        t_in = jnp.full((b,), (t - 1.0 / ns.total_n) * 1000.0)
        return model_fn(x, t_in)

    def mf(x, t):
        """data prediction (pp) or noise prediction, with x0 corrector."""
        eps = raw_eps(x, t)
        if not pp:
            return eps
        x0 = (x - ns.std(t) * eps) / ns.alpha(t)
        if dynamic_thresholding:
            x0 = _dynamic_threshold(x0, thresholding_ratio, thresholding_max_val)
        return x0

    def first_update(x, s, t, model_s):
        """dpm_solver_first_update (dpm_solver.py:551-596)."""
        h = ns.lam(t) - ns.lam(s)
        if pp:
            return (ns.std(t) / ns.std(s)) * x - ns.alpha(t) * np.expm1(-h) * model_s
        return (ns.alpha(t) / ns.alpha(s)) * x - ns.std(t) * np.expm1(h) * model_s

    def singlestep_second(x, s, t, r1=0.5):
        """singlestep_dpm_solver_second_update (dpm_solver.py:598-680)."""
        lam_s, lam_t = ns.lam(s), ns.lam(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        model_s = mf(x, s)
        if pp:
            x_s1 = (ns.std(s1) / ns.std(s)) * x - ns.alpha(s1) * np.expm1(-r1 * h) * model_s
            model_s1 = mf(x_s1, s1)
            phi_1 = np.expm1(-h)
            if solver_type == "dpmsolver":
                return ((ns.std(t) / ns.std(s)) * x
                        - ns.alpha(t) * phi_1 * model_s
                        - (0.5 / r1) * ns.alpha(t) * phi_1 * (model_s1 - model_s))
            return ((ns.std(t) / ns.std(s)) * x
                    - ns.alpha(t) * phi_1 * model_s
                    + (1.0 / r1) * ns.alpha(t) * (phi_1 / h + 1.0) * (model_s1 - model_s))
        x_s1 = (ns.alpha(s1) / ns.alpha(s)) * x - ns.std(s1) * np.expm1(r1 * h) * model_s
        model_s1 = mf(x_s1, s1)
        phi_1 = np.expm1(h)
        if solver_type == "dpmsolver":
            return ((ns.alpha(t) / ns.alpha(s)) * x
                    - ns.std(t) * phi_1 * model_s
                    - (0.5 / r1) * ns.std(t) * phi_1 * (model_s1 - model_s))
        return ((ns.alpha(t) / ns.alpha(s)) * x
                - ns.std(t) * phi_1 * model_s
                - (1.0 / r1) * ns.std(t) * (phi_1 / h - 1.0) * (model_s1 - model_s))

    def singlestep_third(x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0):
        """singlestep_dpm_solver_third_update (dpm_solver.py:681-803)."""
        lam_s, lam_t = ns.lam(s), ns.lam(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        model_s = mf(x, s)
        if pp:
            phi_11, phi_12, phi_1 = np.expm1(-r1 * h), np.expm1(-r2 * h), np.expm1(-h)
            phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            x_s1 = (ns.std(s1) / ns.std(s)) * x - ns.alpha(s1) * phi_11 * model_s
            model_s1 = mf(x_s1, s1)
            x_s2 = ((ns.std(s2) / ns.std(s)) * x
                    - ns.alpha(s2) * phi_12 * model_s
                    + (r2 / r1) * ns.alpha(s2) * phi_22 * (model_s1 - model_s))
            model_s2 = mf(x_s2, s2)
            if solver_type == "dpmsolver":
                return ((ns.std(t) / ns.std(s)) * x
                        - ns.alpha(t) * phi_1 * model_s
                        + (1.0 / r2) * ns.alpha(t) * phi_2 * (model_s2 - model_s))
            D1_0 = (1.0 / r1) * (model_s1 - model_s)
            D1_1 = (1.0 / r2) * (model_s2 - model_s)
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            return ((ns.std(t) / ns.std(s)) * x
                    - ns.alpha(t) * phi_1 * model_s
                    + ns.alpha(t) * phi_2 * D1
                    - ns.alpha(t) * phi_3 * D2)
        phi_11, phi_12, phi_1 = np.expm1(r1 * h), np.expm1(r2 * h), np.expm1(h)
        phi_22 = np.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        x_s1 = (ns.alpha(s1) / ns.alpha(s)) * x - ns.std(s1) * phi_11 * model_s
        model_s1 = mf(x_s1, s1)
        x_s2 = ((ns.alpha(s2) / ns.alpha(s)) * x
                - ns.std(s2) * phi_12 * model_s
                - (r2 / r1) * ns.std(s2) * phi_22 * (model_s1 - model_s))
        model_s2 = mf(x_s2, s2)
        if solver_type == "dpmsolver":
            return ((ns.alpha(t) / ns.alpha(s)) * x
                    - ns.std(t) * phi_1 * model_s
                    - (1.0 / r2) * ns.std(t) * phi_2 * (model_s2 - model_s))
        D1_0 = (1.0 / r1) * (model_s1 - model_s)
        D1_1 = (1.0 / r2) * (model_s2 - model_s)
        D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
        D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
        return ((ns.alpha(t) / ns.alpha(s)) * x
                - ns.std(t) * phi_1 * model_s
                - ns.std(t) * phi_2 * D1
                - ns.std(t) * phi_3 * D2)

    def multistep_second(x, models, ts_prev, t):
        """multistep_dpm_solver_second_update (dpm_solver.py:805-863)."""
        m1, m0 = models[-2], models[-1]
        t1, t0 = ts_prev[-2], ts_prev[-1]
        h0 = ns.lam(t0) - ns.lam(t1)
        h = ns.lam(t) - ns.lam(t0)
        r0 = h0 / h
        D1_0 = (1.0 / r0) * (m0 - m1)
        if pp:
            phi_1 = np.expm1(-h)
            if solver_type == "dpmsolver":
                return ((ns.std(t) / ns.std(t0)) * x
                        - ns.alpha(t) * phi_1 * m0
                        - 0.5 * ns.alpha(t) * phi_1 * D1_0)
            return ((ns.std(t) / ns.std(t0)) * x
                    - ns.alpha(t) * phi_1 * m0
                    + ns.alpha(t) * (phi_1 / h + 1.0) * D1_0)
        phi_1 = np.expm1(h)
        if solver_type == "dpmsolver":
            return ((ns.alpha(t) / ns.alpha(t0)) * x
                    - ns.std(t) * phi_1 * m0
                    - 0.5 * ns.std(t) * phi_1 * D1_0)
        return ((ns.alpha(t) / ns.alpha(t0)) * x
                - ns.std(t) * phi_1 * m0
                - ns.std(t) * (phi_1 / h - 1.0) * D1_0)

    def multistep_third(x, models, ts_prev, t):
        """multistep_dpm_solver_third_update (dpm_solver.py:864-917)."""
        m2, m1, m0 = models[-3], models[-2], models[-1]
        t2, t1, t0 = ts_prev[-3], ts_prev[-2], ts_prev[-1]
        h1 = ns.lam(t1) - ns.lam(t2)
        h0 = ns.lam(t0) - ns.lam(t1)
        h = ns.lam(t) - ns.lam(t0)
        r0, r1 = h0 / h, h1 / h
        D1_0 = (1.0 / r0) * (m0 - m1)
        D1_1 = (1.0 / r1) * (m1 - m2)
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
        if pp:
            phi_1 = np.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            return ((ns.std(t) / ns.std(t0)) * x
                    - ns.alpha(t) * phi_1 * m0
                    + ns.alpha(t) * phi_2 * D1
                    - ns.alpha(t) * phi_3 * D2)
        phi_1 = np.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        return ((ns.alpha(t) / ns.alpha(t0)) * x
                - ns.std(t) * phi_1 * m0
                - ns.std(t) * phi_2 * D1
                - ns.std(t) * phi_3 * D2)

    def multistep_update(x, models, ts_prev, t, step_order):
        if step_order == 1:
            return first_update(x, ts_prev[-1], t, models[-1])
        if step_order == 2:
            return multistep_second(x, models, ts_prev, t)
        return multistep_third(x, models, ts_prev, t)

    if method == "multistep":
        assert steps >= order
        tg = _time_grid(ns, skip_type, t_T, t_0, steps)
        ts_prev = [tg[0]]
        models = [mf(x, tg[0])]
        for step in range(1, order):  # lower-order warmup
            t = tg[step]
            x = multistep_update(x, models, ts_prev, t, step)
            ts_prev.append(t)
            models.append(mf(x, t))
        for step in range(order, steps + 1):
            t = tg[step]
            step_order = min(order, steps + 1 - step) if lower_order_final else order
            x = multistep_update(x, models, ts_prev, t, step_order)
            ts_prev = ts_prev[1:] + [t]
            if step < steps:
                models = models[1:] + [mf(x, t)]
    elif method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep":
            # DPM-Solver-fast order schedule (dpm_solver.py:485-548)
            if order == 3:
                K = steps // 3 + 1
                orders = {0: [3] * (K - 2) + [2, 1], 1: [3] * (K - 1) + [1],
                          2: [3] * (K - 1) + [2]}[steps % 3]
            elif order == 2:
                K = steps // 2 if steps % 2 == 0 else steps // 2 + 1
                orders = [2] * (steps // 2) + ([1] if steps % 2 else [])
            else:
                K, orders = steps, [1] * steps
            if skip_type == "logSNR":  # grid over K macro-steps
                tg_outer = _time_grid(ns, skip_type, t_T, t_0, K)
            else:
                tg_full = _time_grid(ns, skip_type, t_T, t_0, steps)
                tg_outer = tg_full[np.cumsum([0] + orders)]
        else:
            K = steps // order
            orders = [order] * K
            tg_outer = _time_grid(ns, skip_type, t_T, t_0, K)
        for i, o in enumerate(orders):
            s, t = tg_outer[i], tg_outer[i + 1]
            if o == 1:
                x = first_update(x, s, t, mf(x, s))
            else:
                # intermediate ratios from an inner grid of the SAME skip
                # type (sample(), dpm_solver.py:1255-1261)
                tg_inner = _time_grid(ns, skip_type, s, t, o)
                lam_in = [ns.lam(u) for u in tg_inner]
                h = lam_in[-1] - lam_in[0]
                if o == 2:
                    x = singlestep_second(x, s, t, r1=(lam_in[1] - lam_in[0]) / h)
                else:
                    x = singlestep_third(
                        x, s, t,
                        r1=(lam_in[1] - lam_in[0]) / h,
                        r2=(lam_in[2] - lam_in[0]) / h,
                    )
    else:
        raise ValueError(f"unknown method {method}")

    if denoise_to_zero:
        # reference denoise_to_zero_fn routes through data_prediction_fn,
        # which applies the dynamic-thresholding x0 corrector
        # (dpm_solver.py:418-438,1275-1281) — ADVICE r2.
        t = t_0
        x = (x - ns.std(t) * raw_eps(x, t)) / ns.alpha(t)
        if dynamic_thresholding:
            x = _dynamic_threshold(x, thresholding_ratio, thresholding_max_val)
    return x
