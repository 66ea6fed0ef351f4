"""LatentDiffusion task variants: base, inpaint, upscale, depth2image.

Parity target: reference ``ldm/models/diffusion/ddpm.py`` LatentDiffusion
(:823-1368) and its task subclasses (:1368-1811 — LatentInpaintDiffusion
concat-mode masked conditioning, LatentUpscaleDiffusion low-res concat,
LatentDepth2ImageDiffusion depth concat). The MiDaS depth estimator the
reference vendors is implemented natively in ``models.dpt`` (DPT large /
hybrid / vitb16); ``MiDaSInference(...).depth_fn()`` plugs straight into
``depth2image_loss``.

Expressed as pure loss functions over a UNetBackbone whose in_channels is
widened for the concat conditioning (inpaint: 4+4+1=9; upscale: 4+4=8, the
low-res conditioning already encoded to latent space).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion import gaussian as G
from instarevive_tpu.diffusion.schedules import DiffusionSchedule
from instarevive_tpu.ops.resize import interpolate

SCALE_FACTOR = 0.18215


class LatentDiffusionTask:
    """Plain latent-space diffusion training (eps | v | x0 prediction)."""

    def __init__(self, unet, vae, sched: DiffusionSchedule, parameterization: str = "eps"):
        self.unet = unet
        self.vae = vae
        self.sched = sched
        self.parameterization = parameterization

    def encode(self, frozen, img):
        z = self.vae.apply({"params": frozen["vae"]}, img, method=self.vae.encode_mode)
        return jax.lax.stop_gradient(z * SCALE_FACTOR)

    def _target(self, z0, noise, t):
        if self.parameterization == "eps":
            return noise
        if self.parameterization == "x0":
            return z0
        # v (ddpm.py get_v): sqrt(abar) eps - sqrt(1-abar) x0
        from instarevive_tpu.diffusion.schedules import extract

        return (
            extract(self.sched.sqrt_alphas_cumprod, t, z0.ndim) * noise
            - extract(self.sched.sqrt_one_minus_alphas_cumprod, t, z0.ndim) * z0
        )

    def loss(self, params, frozen, batch, rng, extra_cond: Optional[jnp.ndarray] = None):
        """batch: hq [-1,1] NHWC, context (B,L,D)."""
        z0 = self.encode(frozen, batch["hq"])
        t_rng, n_rng = jax.random.split(rng)
        b = z0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, self.sched.num_timesteps)
        noise = jax.random.normal(n_rng, z0.shape)
        z_t = G.q_sample(self.sched, z0, t, noise)
        unet_in = z_t if extra_cond is None else jnp.concatenate([z_t, extra_cond], axis=-1)
        pred = self.unet.apply(
            {"params": params["unet"]}, unet_in, t.astype(jnp.float32), batch["context"]
        )
        loss = jnp.mean((pred - self._target(z0, noise, t)) ** 2)
        return loss, {"loss_simple": loss}

    # ---- task variants -----------------------------------------------------

    def inpaint_loss(self, params, frozen, batch, rng):
        """Concat-mode inpainting (LatentInpaintDiffusion): UNet input =
        [z_t, masked-image latent, downsampled mask] (9 channels).

        batch: hq [-1,1], mask (B,H,W,1) 1=hole, context."""
        mask = batch["mask"]
        masked = batch["hq"] * (1.0 - mask)
        masked_z = self.encode(frozen, masked)
        f = batch["hq"].shape[1] // masked_z.shape[1]
        mask_lat = interpolate(mask, masked_z.shape[1:3], mode="nearest")
        extra = jnp.concatenate([masked_z, mask_lat], axis=-1)  # (B,h,w,5)
        return self.loss(params, frozen, batch, rng, extra_cond=extra)

    def upscale_loss(self, params, frozen, batch, rng):
        """Low-res-conditioned upscaling (LatentUpscaleDiffusion): UNet
        input = [z_t, lowres latent] (8 channels).

        batch: hq [-1,1], lq [-1,1] (any size; resized to hq), context."""
        lq = interpolate(batch["lq"], batch["hq"].shape[1:3], mode="bicubic")
        lq_z = self.encode(frozen, lq)
        return self.loss(params, frozen, batch, rng, extra_cond=lq_z)

    def depth_conditioning(self, depth, latent_hw):
        """Exact LatentDepth2ImageDiffusion conditioning math
        (ddpm.py:1716-1734): bicubic resize to the latent grid, then
        per-sample min-max normalize to [-1, 1] (denominator eps 0.001)."""
        cc = interpolate(depth, latent_hw, mode="bicubic")
        dmin = jnp.min(cc, axis=(1, 2, 3), keepdims=True)
        dmax = jnp.max(cc, axis=(1, 2, 3), keepdims=True)
        return 2.0 * (cc - dmin) / (dmax - dmin + 0.001) - 1.0

    def depth2image_loss(self, params, frozen, batch, rng, depth_fn=None):
        """Depth-conditioned generation (LatentDepth2ImageDiffusion,
        ddpm.py:1698-1750): UNet input = [z_t, normalized depth] (5
        channels, concat mode like inpaint/upscale).

        The depth SOURCE is pluggable: pass precomputed maps as
        ``batch['depth']`` ((B, H', W', 1), any resolution) or a
        ``depth_fn(hq) -> (B,H,W,1)`` estimator — e.g.
        ``models.dpt.MiDaSInference(model, params).depth_fn()``, the native
        DPT equivalent of the reference's vendored MiDaS
        (ldm/modules/midas/, parity-tested in tests/test_dpt.py).
        """
        depth = depth_fn(batch["hq"]) if depth_fn is not None else batch["depth"]
        f = 2 ** (len(self.vae.ch_mult) - 1)  # VAE spatial factor
        latent_hw = (batch["hq"].shape[1] // f, batch["hq"].shape[2] // f)
        cc = self.depth_conditioning(depth, latent_hw)
        return self.loss(params, frozen, batch, rng, extra_cond=cc)
