#!/usr/bin/env python
"""PixArt text-to-image sampling CLI (reference scripts/inference.py analog).

    python sample.py --prompt "a red panda" --t5_dir /path/t5 \
        --ckpt epoch_20.pth --sampling_algo dpm-solver --step 20 --cfg 4.5

Samplers: iddpm (ancestral DDPM, 100 respaced steps), ddim, dpm-solver
(20-step DPM-Solver++ 2M), sa-solver. Without --t5_dir, uses the
checkpoint's learned null embedding (unconditional samples).
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", nargs="+", default=["a photo"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--t5_dir", default=None)
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--output", default="samples")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--sampling_algo", default="dpm-solver",
                   choices=["iddpm", "ddim", "dpm-solver", "sa-solver"])
    p.add_argument("--solver_order", type=int, default=2,
                   help="DPM-Solver order (1-3) / SA-Solver predictor order")
    p.add_argument("--solver_method", default="multistep",
                   choices=["multistep", "singlestep", "singlestep_fixed"])
    p.add_argument("--sa_tau", type=float, default=1.0,
                   help="SA-Solver stochasticity (0 = ODE limit)")
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--cfg_scale", type=float, default=4.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--seq_parallel", type=int, default=0,
                   help="Shard the latent token axis over N devices "
                        "(parallel/sp.py): exact global attention via "
                        "per-block K/V all-gathers — the lever for giant "
                        "un-tiled latents (2K/4K) past one chip")
    p.add_argument("--pipeline_parallel", type=int, default=0,
                   help="Run the DiT block stack GPipe-style over S "
                        "devices (parallel/pp.py): stage-resident weights "
                        "— the lever for models past one chip's HBM. "
                        "Mutually exclusive with --seq_parallel")
    args = p.parse_args()
    if args.seq_parallel > 1 and args.pipeline_parallel > 1:
        p.error("--seq_parallel and --pipeline_parallel are mutually exclusive")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instarevive_tpu.config import load_config
    from instarevive_tpu.diffusion import gaussian as G
    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m, dpm_solver_sample
    from instarevive_tpu.diffusion.respace import respaced_schedule
    from instarevive_tpu.diffusion.sa_solver import sa_solver_pc_sample
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params
    from instarevive_tpu.utils.image_io import save_image

    cfg = load_config(args.config)
    pipe = build_pipeline(cfg)
    params = (
        init_params(pipe, 0)
        if args.random_init or not args.ckpt
        else load_params(pipe, dit_ckpt=args.ckpt, vae_ckpt=args.vae_ckpt)
    )

    b = len(args.prompt)
    L = pipe.dit.model_max_length
    null_y = np.asarray(params["dit"]["y_embedder"]["y_embedding"])[None][:, :L]
    if args.t5_dir:
        from instarevive_tpu.models.t5 import T5Embedder

        emb = T5Embedder(args.t5_dir, model_max_length=L)
        y, y_mask = emb.get_text_embeddings(args.prompt)
        y_mask = jnp.asarray(y_mask.astype(bool))
    else:
        print("[warn] no --t5_dir: sampling with the null embedding")
        y = np.repeat(null_y, b, axis=0)
        y_mask = None
    y = jnp.asarray(y, jnp.float32)
    null = jnp.asarray(np.repeat(null_y, b, axis=0), jnp.float32)

    # aspect-ratio-aware latent shape from prompt suffix ("... --ar 3:4"),
    # reference prepare_prompt_ar (diffusion/model/utils.py:442)
    from instarevive_tpu.data.dataset import closest_bucket, parse_prompt_aspect

    ratios = [parse_prompt_aspect(pr)[1] for pr in args.prompt]
    if any(r is not None for r in ratios):
        hh, ww = closest_bucket(next(r for r in ratios if r is not None))
        lat_h, lat_w = hh // 8, ww // 8
    else:
        lat_h = lat_w = args.image_size // 8
    shape = (b, lat_h, lat_w, 4)

    # DiT forward dispatch: monolithic (default), sequence-parallel, or
    # pipeline-parallel — both model-parallel paths are exact (tests +
    # dryrun stages 3c/3d assert equality with the monolithic forward)
    if args.pipeline_parallel > 1:
        from instarevive_tpu.parallel.pp import (
            make_pipe_mesh, pixart_pp_forward, shard_stacked, stack_block_params,
        )

        pp_mesh = make_pipe_mesh(args.pipeline_parallel)
        pp_stacked = shard_stacked(
            stack_block_params(params["dit"], pipe.dit.depth), pp_mesh
        )

        def dit_forward(x2, t2, y2):
            return pixart_pp_forward(
                pipe.dit, params["dit"], pp_mesh, x2, t2, y2,
                microbatches=2, stacked=pp_stacked,
            )
    elif args.seq_parallel > 1:
        from instarevive_tpu.parallel.sp import make_seq_mesh, pixart_sp_forward

        sp_mesh = make_seq_mesh(args.seq_parallel)

        def dit_forward(x2, t2, y2):
            return pixart_sp_forward(pipe.dit, params["dit"], sp_mesh, x2, t2, y2)
    else:
        def dit_forward(x2, t2, y2):
            return pipe.dit.apply({"params": params["dit"]}, x2, t2, y2, y_mask=None)

    def cfg_eps(x, t):
        """CFG on the eps half (forward_with_cfg math, PixArt.py:184-197)."""
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate([y, null], axis=0)
        out = dit_forward(x2, t2.astype(jnp.float32), y2)
        eps, rest = out[..., :4], out[..., 4:]
        ce, ue = jnp.split(eps, 2, axis=0)
        half = ue + args.cfg_scale * (ce - ue)
        return jnp.concatenate([jnp.concatenate([half, half], axis=0), rest], axis=-1)[:b]

    rng = jax.random.key(args.seed)
    if args.sampling_algo == "iddpm":
        sched = respaced_schedule("linear", 1000, str(args.step or 100))
        z = G.ddpm_sample_loop(sched, cfg_eps, shape, rng, clip_denoised=True)
    elif args.sampling_algo == "ddim":
        sched = respaced_schedule("linear", 1000, f"ddim{args.step}")
        z = G.ddim_sample_loop(sched, cfg_eps, shape, rng)
    else:
        sched = pipe.sched
        eps_only = lambda x, t: cfg_eps(x, t)[..., :4]  # noqa: E731
        x_init = jax.random.normal(rng, shape)
        if args.sampling_algo == "dpm-solver":
            if args.solver_order == 2 and args.solver_method == "multistep":
                z = dpm_solver_pp_2m(eps_only, sched, x_init, steps=args.step)
            else:
                z = dpm_solver_sample(
                    eps_only, sched, x_init, steps=args.step,
                    order=args.solver_order, method=args.solver_method,
                )
        else:
            rng, sk = jax.random.split(rng)
            z = sa_solver_pc_sample(
                eps_only, sched, x_init, rng=sk, tau=args.sa_tau,
                steps=args.step, predictor_order=min(args.solver_order + 1, 3),
            )

    imgs = np.asarray(pipe.decode(params, z))
    os.makedirs(args.output, exist_ok=True)
    for i, img in enumerate(imgs):
        path = os.path.join(args.output, f"sample_{i}_{args.sampling_algo}.png")
        save_image(img, path)
        print(path)


if __name__ == "__main__":
    main()
