"""ControlLDM-family training tasks (the LDM/ControlNet stack's task logic).

Parity targets (diffusion/cldm.py):
  * ControlLDM (:295-441): frozen SwinIR preprocess + frozen cond-encoder
    VAE producing c_latent; apply_model = ControlNet residuals -> UNet;
    eps-prediction diffusion loss; trains ControlNet (+ UNet decoder when
    sd_locked=False).
  * Reflow_ControlLDM (:443-1160): velocity matching on the straight path
    (see train/distill.reflow_loss); one-step Euler sampler; 5-step
    test-time Euler (:835-856).
  * Dist_ControlLDM (:1162-1625): LoRA distillation — frozen UNet + LoRA
    adapters, fixed t = T-1, v ~ z0 - z_T MSE (:1399-1448).

Everything is a pure function over explicit param trees; freezing is
expressed by which tree the optimizer sees, not by runtime mutation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion import gaussian as G
from instarevive_tpu.diffusion.schedules import DiffusionSchedule
from instarevive_tpu.models.unet import UNetBackbone
from instarevive_tpu.train.lora import merge_lora

SCALE_FACTOR = 0.18215  # configs/cldm.yaml:17


class ControlLDMTask:
    """Bundles the frozen stages + trainable control/unet for the cldm stack."""

    def __init__(
        self,
        unet: UNetBackbone,
        controlnet: UNetBackbone,
        vae,
        swinir,
        sched: DiffusionSchedule,
        sd_locked: bool = False,  # cldm.yaml:20 (decoder trains too)
    ):
        self.unet = unet
        self.controlnet = controlnet
        self.vae = vae
        self.swinir = swinir
        self.sched = sched
        self.sd_locked = sd_locked

    # ---- frozen input path (cldm.py get_input :499-514) -------------------

    def get_input(self, frozen_params, batch):
        """batch: hq in [-1,1] NHWC, lq in [0,1] NHWC, context (B,L,D).

        Returns z0 (scaled latent of HQ), c_latent (scaled latent of the
        SwinIR-cleaned LQ — the control signal)."""
        z0 = self.vae.apply(
            {"params": frozen_params["vae"]}, batch["hq"], method=self.vae.encode_mode
        ) * SCALE_FACTOR
        control_img = self.swinir.apply({"params": frozen_params["swinir"]}, batch["lq"])
        control_img = jnp.clip(control_img, 0.0, 1.0) * 2.0 - 1.0
        c_latent = self.vae.apply(
            {"params": frozen_params["vae"]}, control_img, method=self.vae.encode_mode
        ) * SCALE_FACTOR
        return jax.lax.stop_gradient(z0), jax.lax.stop_gradient(c_latent)

    # ---- model application (cldm.py apply_model :354-370) -----------------

    def apply_model(self, params, z_t, t, context, c_latent):
        control = self.controlnet.apply(
            {"params": params["controlnet"]},
            jnp.concatenate([z_t, c_latent], axis=-1),
            t.astype(jnp.float32),
            context,
        )
        return self.unet.apply(
            {"params": params["unet"]},
            z_t,
            t.astype(jnp.float32),
            context,
            control=control,
        )

    # ---- objectives --------------------------------------------------------

    def eps_loss(self, params, frozen_params, batch, rng,
                 t=None, loss_weights=None):
        """ControlLDM training_step: standard eps-prediction MSE.

        ``t``/``loss_weights`` may come from an importance sampler
        (diffusion/timestep_sampler.py LossSecondMomentResampler analog,
        reference diffusion/model/timestep_sampler.py:27-120); default is
        the uniform sampler. Per-sample losses are returned in the aux
        dict so callers can update the sampler's loss history."""
        z0, c_latent = self.get_input(frozen_params, batch)
        t_rng, n_rng = jax.random.split(rng)
        b = z0.shape[0]
        if t is None:
            t = jax.random.randint(t_rng, (b,), 0, self.sched.num_timesteps)
        noise = jax.random.normal(n_rng, z0.shape)
        z_t = G.q_sample(self.sched, z0, t, noise)
        eps = self.apply_model(params, z_t, t, batch["context"], c_latent)
        per_sample = jnp.mean((eps - noise) ** 2, axis=(1, 2, 3))
        w = jnp.ones((b,)) if loss_weights is None else loss_weights
        loss = jnp.mean(per_sample * w)
        return loss, {"loss_simple": loss, "t": t, "per_sample_loss": per_sample}

    def reflow_loss(self, params, frozen_params, batch, rng):
        """Reflow_ControlLDM training_step (:685-750): v on straight path."""
        z0, c_latent = self.get_input(frozen_params, batch)
        t_rng, n_rng = jax.random.split(rng)
        b = z0.shape[0]
        T = self.sched.num_timesteps
        t = jax.random.randint(t_rng, (b,), 1, T)
        t_hat = (t.astype(jnp.float32) / T).reshape(b, 1, 1, 1)
        z_T = jax.random.normal(n_rng, z0.shape)
        z_t = t_hat * z_T + (1.0 - t_hat) * z0
        v = self.apply_model(params, z_t, t, batch["context"], c_latent)
        loss = jnp.mean((v - (z0 - z_T)) ** 2)
        return loss, {"reflow_mse": loss}

    def dist_loss(self, lora_params, base_params, frozen_params, batch, rng):
        """Dist_ControlLDM (:1399-1448): LoRA-adapted UNet, fixed t=T-1,
        v ~ z0 - z_T."""
        z0, c_latent = self.get_input(frozen_params, batch)
        z_T = jax.random.normal(rng, z0.shape)
        b = z0.shape[0]
        t = jnp.full((b,), self.sched.num_timesteps - 1, dtype=jnp.int32)
        params = {
            "unet": merge_lora(base_params["unet"], lora_params),
            "controlnet": base_params["controlnet"],
        }
        v = self.apply_model(params, z_T, t, batch["context"], c_latent)
        loss = jnp.mean((v - (z0 - z_T)) ** 2)
        return loss, {"dist_mse": loss}

    # ---- samplers (cldm.py :568-588, :835-856) ----------------------------

    def reflow_sample_1step(self, params, frozen_params, batch):
        _, c_latent = self.get_input(frozen_params, batch)
        z_T = jax.random.normal(jax.random.key(0), c_latent.shape)
        b = z_T.shape[0]
        t = jnp.full((b,), self.sched.num_timesteps - 1, dtype=jnp.int32)
        v = self.apply_model(params, z_T, t, batch["context"], c_latent)
        return z_T + v

    def reflow_sample_euler(self, params, frozen_params, batch, rng,
                           steps=(999, 799, 599, 349, 199)):
        """test_step 5-step Euler: z_{k+1} = z_k + v/len(steps) (:835-856)."""
        _, c_latent = self.get_input(frozen_params, batch)
        z = jax.random.normal(rng, c_latent.shape)
        b = z.shape[0]
        n = len(steps)
        for s in steps:
            t = jnp.full((b,), s, dtype=jnp.int32)
            v = self.apply_model(params, z, t, batch["context"], c_latent)
            z = z + v / n
        return z
