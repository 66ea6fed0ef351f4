"""Gaussian diffusion processes: q/p math, DDPM/DDIM sampling, training losses.

Parity target: reference ``diffusion/model/gaussian_diffusion.py:17-1041``
(the OpenAI ADM port used by the PixArt stack) — epsilon/x0/v prediction,
learned-range variance, VB terms, the SNR-switched DMD target at :831-834,
masked-token loss at :836-843 — and the DDPM/DDIM loops.

TPU design: all loops are ``lax.scan`` over a precomputed timestep array —
one compiled program regardless of step count; model_fn is a closure the
caller jits. No classes-with-state: a ``DiffusionSchedule`` pytree plus pure
functions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion.schedules import DiffusionSchedule, extract

ModelFn = Callable[..., jnp.ndarray]  # (x, t, **cond) -> prediction


class PSample(NamedTuple):
    mean: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def q_sample(sched: DiffusionSchedule, x0, t, noise):
    """Diffuse x0 to x_t."""
    return (
        extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise
    )


def predict_xstart_from_eps(sched, x_t, t, eps):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, x0):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_xstart_from_v(sched, x_t, t, v):
    """LDM v-parameterization (ddpm.py predict_start_from_z_and_v)."""
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def q_posterior_mean(sched, x0, x_t, t):
    return (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x0
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )


def p_mean_variance(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    parameterization: str = "eps",
    learned_range: bool = True,
    clip_denoised: bool = False,
) -> PSample:
    """Model output -> posterior mean/variance + x0 estimate.

    With ``learned_range`` the model emits 2C channels; the second half
    interpolates log-variance between beta and posterior (ADM convention).
    """
    if learned_range:
        c = x_t.shape[-1]
        model_out, var_raw = model_out[..., :c], model_out[..., c:]
        min_log = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
        max_log = extract(sched.log_betas, t, x_t.ndim)
        frac = (var_raw + 1.0) / 2.0
        log_variance = frac * max_log + (1.0 - frac) * min_log
    else:
        log_variance = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
        log_variance = jnp.broadcast_to(log_variance, x_t.shape)

    if parameterization == "eps":
        x0 = predict_xstart_from_eps(sched, x_t, t, model_out)
    elif parameterization == "x0":
        x0 = model_out
    elif parameterization == "v":
        x0 = predict_xstart_from_v(sched, x_t, t, model_out)
    else:
        raise ValueError(parameterization)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    mean = q_posterior_mean(sched, x0, x_t, t)
    return PSample(mean, log_variance, x0)


def ddpm_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape,
    rng: jax.Array,
    *,
    noise: Optional[jnp.ndarray] = None,
    parameterization: str = "eps",
    learned_range: bool = True,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Ancestral DDPM sampling as one lax.scan (p_sample_loop equivalent).

    ``model_fn(x, t_mapped)`` receives timesteps already mapped through the
    respacing table.
    """
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape) if noise is None else noise
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def step(carry, t_idx):
        x, rng = carry
        rng, nrng = jax.random.split(rng)
        b = x.shape[0]
        t = jnp.full((b,), t_idx, dtype=jnp.int32)
        out = model_fn(x, sched.timestep_map[t])
        ps = p_mean_variance(
            sched, out, x, t,
            parameterization=parameterization,
            learned_range=learned_range,
            clip_denoised=clip_denoised,
        )
        z = jax.random.normal(nrng, x.shape)
        nonzero = (t_idx > 0).astype(x.dtype)
        x_next = ps.mean + nonzero * jnp.exp(0.5 * ps.log_variance) * z
        return (x_next, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), ts)
    return x


def ddim_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape,
    rng: jax.Array,
    *,
    noise: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    parameterization: str = "eps",
    learned_range: bool = True,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """DDIM sampling over the (possibly respaced) schedule, one lax.scan."""
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape) if noise is None else noise
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def step(carry, t_idx):
        x, rng = carry
        rng, nrng = jax.random.split(rng)
        b = x.shape[0]
        t = jnp.full((b,), t_idx, dtype=jnp.int32)
        out = model_fn(x, sched.timestep_map[t])
        ps = p_mean_variance(
            sched, out, x, t,
            parameterization=parameterization,
            learned_range=learned_range,
            clip_denoised=clip_denoised,
        )
        eps = predict_eps_from_xstart(sched, x, t, ps.pred_xstart)
        abar = extract(sched.alphas_cumprod, t, x.ndim)
        abar_prev = extract(sched.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - abar_prev) / (1 - abar))
            * jnp.sqrt(1 - abar / abar_prev)
        )
        z = jax.random.normal(nrng, x.shape)
        mean = (
            jnp.sqrt(abar_prev) * ps.pred_xstart
            + jnp.sqrt(jnp.maximum(1 - abar_prev - sigma**2, 0.0)) * eps
        )
        nonzero = (t_idx > 0).astype(x.dtype)
        return (mean + nonzero * sigma * z, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), ts)
    return x


def _normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _mean_flat(x, mask=None):
    axes = tuple(range(1, x.ndim))
    if mask is None:
        return x.mean(axes)
    # masked token loss (gaussian_diffusion.py:836-843): mask is (B, H', W')
    # over patch tokens upsampled to pixel resolution by the caller.
    w = jnp.broadcast_to(mask[..., None], x.shape)
    return (x * w).sum(axes) / jnp.maximum(w.sum(axes), 1.0)


def training_losses(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    learned_range: bool = True,
    snr_switch_t: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """MSE(+VB) diffusion loss (training_losses, gaussian_diffusion.py:790-866).

    ``snr_switch_t``: the DMD trick at :831-834 — target is the noise for
    t > snr_switch_t and x_start below (the reference uses 249).
    Returns dict(loss, mse, vb).
    """
    noise = jax.random.normal(rng, x0.shape)
    x_t = q_sample(sched, x0, t, noise)
    out = model_fn(x_t, sched.timestep_map[t])

    vb = 0.0
    if learned_range:
        c = x0.shape[-1]
        eps_pred, var_raw = out[..., :c], out[..., c:]
        # VB term with frozen mean (ADM _vb_terms_bpd with stop_gradient)
        frozen = jnp.concatenate([jax.lax.stop_gradient(eps_pred), var_raw], axis=-1)
        ps = p_mean_variance(sched, frozen, x_t, t, learned_range=True)
        true_mean = q_posterior_mean(sched, x0, x_t, t)
        true_logvar = extract(sched.posterior_log_variance_clipped, t, x0.ndim)
        kl = _mean_flat(_normal_kl(true_mean, true_logvar, ps.mean, ps.log_variance), mask)
        kl = kl / jnp.log(2.0)
        # t == 0: discretized NLL ~ use KL as ADM does for simplicity of the
        # continuous proxy; reference uses decoder NLL — negligible for SR.
        vb = kl * (sched.num_timesteps / 1000.0)
    else:
        eps_pred = out

    if snr_switch_t is not None:
        target = jnp.where(
            t.reshape((-1,) + (1,) * (x0.ndim - 1)) > snr_switch_t, noise, x0
        )
    else:
        target = noise
    mse = _mean_flat((target - eps_pred) ** 2, mask)
    return {"loss": mse + vb, "mse": mse, "vb": vb}
