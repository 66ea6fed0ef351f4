"""Noise schedules as pytrees of arrays.

Parity targets: reference ``diffusion/model/gaussian_diffusion.py``
(``get_named_beta_schedule``: ADM-scaled 'linear' and 'squaredcos_cap_v2'),
``ldm/modules/diffusionmodules/util.py:make_beta_schedule`` ('linear' on the
sqrt scale with linear_start/linear_end — the LDM/cldm convention,
configs/cldm.yaml:4-5), and the diffusers DDPMScheduler ``alphas_cumprod``
consumed by ``eps_to_mu`` (scripts/DMD/transformer_train/generate.py:44-51).

Everything is precomputed numpy at construction; the arrays live in a
``DiffusionSchedule`` NamedTuple that jit functions close over (static
shapes, constant-folded by XLA).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def named_betas(name: str, num_timesteps: int = 1000, **kw) -> np.ndarray:
    """Beta schedule by name.

    'linear'            — ADM convention, scaled by 1000/T (gaussian_diffusion.py)
    'squaredcos_cap_v2' — cosine (alpha_bar = cos^2), capped at 0.999
    'ldm_linear'        — LDM: linspace on sqrt(beta) (cldm.yaml linear_start/end)
    """
    if name == "linear":
        scale = 1000.0 / num_timesteps
        start = kw.get("beta_start", 0.0001) * scale
        end = kw.get("beta_end", 0.02) * scale
        return np.linspace(start, end, num_timesteps, dtype=np.float64)
    if name == "squaredcos_cap_v2":
        def abar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - abar((i + 1) / num_timesteps) / abar(i / num_timesteps), 0.999)
            for i in range(num_timesteps)
        ]
        return np.asarray(betas, dtype=np.float64)
    if name == "ldm_linear":
        start = kw.get("linear_start", 0.00085)
        end = kw.get("linear_end", 0.012)
        return (
            np.linspace(start**0.5, end**0.5, num_timesteps, dtype=np.float64) ** 2
        )
    raise ValueError(f"unknown schedule {name!r}")


class DiffusionSchedule(NamedTuple):
    """All derived quantities of a discrete-time Gaussian diffusion."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # original-schedule timestep each index maps to (respacing); identity here
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    name: str = "linear", num_timesteps: int = 1000, betas: np.ndarray = None, **kw
) -> DiffusionSchedule:
    if betas is None:
        betas = named_betas(name, num_timesteps, **kw)
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_log_var = np.log(np.append(post_var[1], post_var[1:]))
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(post_log_var),
        posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        log_betas=f32(np.log(betas)),
        timestep_map=jnp.arange(num_timesteps, dtype=jnp.int32),
    )


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim tensor
    (the reference's ``_extract_into_tensor`` / ``extract_into_tensor``)."""
    out = arr[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
