#!/usr/bin/env python
"""ControlNet-conditioned validation sampling (reference
test_scripts/test_controlnet.py analog — the de-facto distributed test rig).

Per batch: degrade HQ (on-device) -> SwinIR clean -> VAE encode as control
latent -> 20-step DPM-Solver++ sample conditioned on the control -> decode,
save panels, report PSNR/SSIM vs HQ. Runs data-parallel over all devices.

    python validate.py --data /path/imgs --out val_out --config configs/tiny.yaml --random_init
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default="configs/tiny.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--swinir_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--crop_size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--cfg_scale", type=float, default=4.5)
    p.add_argument("--control_depth", type=int, default=13)
    p.add_argument("--max_batches", type=int, default=10)
    p.add_argument("--seed", type=int, default=231)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instarevive_tpu.config import load_config
    from instarevive_tpu.data.dataset import ImageFolderDataset, PrefetchLoader
    from instarevive_tpu.data.realesrgan import RealESRGANDegradationConfig, degrade_batch
    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params
    from instarevive_tpu.utils.image_io import save_image
    from instarevive_tpu.utils.logging import get_root_logger, log_images_panel
    from instarevive_tpu.utils.metrics import psnr, ssim

    os.makedirs(args.out, exist_ok=True)
    logger = get_root_logger()
    cfg = load_config(args.config)
    pipe = build_pipeline(cfg, control_depth=args.control_depth)
    params = (
        init_params(pipe, 0)
        if args.random_init or not args.ckpt
        else load_params(pipe, swinir_ckpt=args.swinir_ckpt, vae_ckpt=args.vae_ckpt,
                         dit_ckpt=args.ckpt)
    )

    L = pipe.dit.model_max_length
    y = jnp.asarray(
        np.asarray(params["dit"]["y_embedder"]["y_embedding"])[None][:, :L], jnp.float32
    )
    y = jnp.repeat(y, args.batch_size, axis=0)

    deg_cfg = RealESRGANDegradationConfig()
    degrade = jax.jit(lambda k, x: degrade_batch(k, x, deg_cfg))

    @jax.jit
    def sample(params, lq, key):
        stage1 = pipe.clean(params, lq)
        c_latent = pipe.encode(params, stage1)

        def eps_fn(z, t):
            out = pipe.dit.apply(
                {"params": params["dit"]}, z, t.astype(jnp.float32), y,
                c=c_latent, control_depth=args.control_depth,
            )
            return out[..., : z.shape[-1]]

        z_init = jax.random.normal(key, c_latent.shape)
        z = dpm_solver_pp_2m(eps_fn, pipe.sched, z_init, steps=args.step)
        return pipe.decode(params, z), stage1

    ds = ImageFolderDataset(args.data, out_size=args.crop_size, crop_type="center",
                            use_hflip=False)
    loader = PrefetchLoader(ds, args.batch_size, shuffle=False, drop_last=False)

    key = jax.random.key(args.seed)
    all_psnr, all_ssim = [], []
    for bi, batch in enumerate(loader):
        if bi >= args.max_batches:
            break
        key, dk, sk = jax.random.split(key, 3)
        hq01 = jnp.asarray(batch["hq"], jnp.float32) / 255.0
        data = degrade(dk, hq01)
        pred, stage1 = sample(params, data["lq"], sk)
        hq = (np.asarray(data["hq"]) + 1) / 2
        pr = np.clip(np.asarray(pred), 0.0, 1.0)  # decode is unclamped
        all_psnr += list(np.asarray(psnr(jnp.asarray(pr), jnp.asarray(hq))))
        all_ssim += list(np.asarray(ssim(jnp.asarray(pr), jnp.asarray(hq))))
        panel = log_images_panel(np.asarray(data["lq"]), pr, hq)
        for j in range(panel.shape[0]):
            save_image(panel[j], os.path.join(args.out, f"b{bi}_{j}.png"))
        logger.info(f"batch {bi}: psnr {np.mean(all_psnr):.2f} ssim {np.mean(all_ssim):.4f}")

    logger.info(f"FINAL psnr {np.mean(all_psnr):.3f} ssim {np.mean(all_ssim):.4f} "
                f"(n={len(all_psnr)})")


if __name__ == "__main__":
    main()
