"""One-step generator math (the shipped InstaRevive product path).

Parity target: ``scripts/DMD/transformer_train/generate.py:22-87``
(``generate_sample_1step`` / ``eps_to_mu`` / ``forward_model``): one forward
of the distilled DiT at a fixed t (400 at inference), learned-sigma channel
split, then the closed-form epsilon -> x0 conversion via alpha_bar_t.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from instarevive_tpu.diffusion.schedules import DiffusionSchedule, extract


def eps_to_x0(sched: DiffusionSchedule, eps, x_t, t):
    """x0 = (x_t - sqrt(1-abar_t) eps) / sqrt(abar_t) (generate.py:44-51)."""
    abar = extract(sched.alphas_cumprod, t, x_t.ndim)
    return (x_t - jnp.sqrt(1.0 - abar) * eps) / jnp.sqrt(abar)


def generate_sample_1step(
    model_fn: Callable[..., jnp.ndarray],
    sched: DiffusionSchedule,
    latents: jnp.ndarray,
    maxt: int,
    *,
    split_sigma: bool = True,
    **cond,
) -> jnp.ndarray:
    """Single-step denoise: model eps at t=maxt -> x0 (generate.py:22-42).

    ``latents`` is the *init noise* (the VAE-encoded LQ latent at inference,
    test_scripts/inference.py:106-114). ``model_fn(latents, t, **cond)``
    returns eps (with learned-sigma channels if split_sigma).
    """
    b = latents.shape[0]
    t = jnp.full((b,), maxt, dtype=jnp.int32)
    out = model_fn(latents, t, **cond)
    if split_sigma:
        out = out[..., : latents.shape[-1]]
    return eps_to_x0(sched, out, latents, t)


def cfg_wrap(model_fn, cfg_scale: float, uncond: dict, split_channels: Optional[int] = 3):
    """Classifier-free guidance wrapper (PixArt forward_with_cfg math):
    batches cond/uncond, mixes eps, passes sigma channels through."""

    def wrapped(x, t, **cond):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        merged = {
            k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond
        }
        out = model_fn(x2, t2, **merged)
        eps, rest = out[..., :split_channels], out[..., split_channels:]
        c_eps, u_eps = jnp.split(eps, 2, axis=0)
        half = u_eps + cfg_scale * (c_eps - u_eps)
        eps = jnp.concatenate([half, half], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)[: x.shape[0]]

    return wrapped
