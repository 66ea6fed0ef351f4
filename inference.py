#!/usr/bin/env python
"""InstaRevive-TPU one-step blind restoration CLI.

Flag-compatible with the reference product CLI
(``test_scripts/inference.py:169-350``):

    python inference.py --ckpt InstaRevive_v1.ckpt --input in/ --output out/ \
        --sr_scale 4 [--tiled --tile_size 512 --tile_stride 448] \
        [--color_fix_type wavelet|adain|none] [--disable_preprocess_model] \
        [--repeat_times N] [--show_lq] [--seed 231] [--use_center_crop]

Extra flags for this environment: --config (model hyperparams YAML),
--swinir_ckpt/--vae_ckpt (foreign checkpoints), --null_embed (cached T5
null-prompt embedding), --random_init (seeded random weights for smoke
runs when no checkpoints exist).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, default=None, help="DiT generator checkpoint (.ckpt/.pth)")
    p.add_argument("--swinir_ckpt", type=str, default=None)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--null_embed", type=str, default=None, help="cached T5 null-prompt embed")
    p.add_argument("--config", type=str, default="configs/instarevive_v1.yaml")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--sr_scale", type=float, default=1.0)
    p.add_argument("--repeat_times", type=int, default=1)
    p.add_argument("--disable_preprocess_model", action="store_true")
    p.add_argument("--tiled", action="store_true")
    p.add_argument("--tile_size", type=int, default=512)
    p.add_argument("--tile_stride", type=int, default=448)
    p.add_argument("--tile_auto", action="store_true",
                   help="pick tile_size/tile_stride per image size to "
                        "minimize overlap work (e.g. 1024^2: 576/512 = 4 "
                        "tiles vs the default 512/448 = 9; measured +27% "
                        "throughput, BENCH.md round 4)")
    p.add_argument("--color_fix_type", type=str, default="wavelet",
                   choices=["wavelet", "adain", "none"])
    p.add_argument("--show_lq", action="store_true")
    p.add_argument("--skip_if_exist", action="store_true")
    p.add_argument("--seed", type=int, default=231)
    p.add_argument("--device", type=str, default="tpu",
                   choices=["cpu", "cuda", "mps", "tpu"],
                   help="accepted for reference-compat; tpu/cpu pick the JAX backend")
    p.add_argument("--use_center_crop", action="store_true")
    p.add_argument("--random_init", action="store_true",
                   help="seeded random weights (smoke runs without checkpoints)")
    p.add_argument("--bf16", action="store_true", help="bf16 compute (TPU serving)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params
    from instarevive_tpu.utils.image_io import (
        auto_resize,
        center_crop_arr,
        list_image_files,
        load_image,
        pad_to_multiple,
        save_image,
    )

    cfg = load_config(args.config)
    jnp_dtype = None
    if args.bf16 or (args.device == "tpu" and jax.default_backend() == "tpu"):
        jnp_dtype = jnp.bfloat16  # bf16 compute, f32 params (serving default)
    pipe = build_pipeline(cfg, dtype=jnp_dtype)

    if args.random_init or not (args.ckpt or args.swinir_ckpt or args.vae_ckpt):
        if not args.random_init:
            print("[warn] no checkpoints given; using seeded random init", file=sys.stderr)
        params = init_params(pipe, seed=0)
    else:
        params = load_params(
            pipe, swinir_ckpt=args.swinir_ckpt, vae_ckpt=args.vae_ckpt, dit_ckpt=args.ckpt
        )
    if jnp_dtype is jnp.bfloat16:
        # pre-cast conv-stage weights to bf16 (skips f32->bf16 convert
        # traffic; excludes f32-consumed params like the SwinIR rel-pos
        # bias table — see precast_serving_params)
        from instarevive_tpu.pipelines.build import precast_serving_params

        params = precast_serving_params(params)

    # null T5 prompt embedding (reference: 300-token quality prompt embed)
    L = pipe.dit.model_max_length
    if args.null_embed:
        from instarevive_tpu.train.checkpoint import load_null_embed

        y = load_null_embed(args.null_embed)[None]  # (1, L, 4096)
        if y.shape[1] != L:
            y = y[:, :L] if y.shape[1] > L else np.pad(y, ((0, 0), (0, L - y.shape[1]), (0, 0)))
    else:
        # fall back to the checkpoint's learned uncond embedding
        y = np.asarray(params["dit"]["y_embedder"]["y_embedding"])[None][:, :L]
    y = jnp.asarray(y, dtype=jnp.float32)

    os.makedirs(args.output, exist_ok=True)
    files = list_image_files(args.input) if os.path.isdir(args.input) else [args.input]
    print(f"[inference] {len(files)} images -> {args.output}")

    fns = {}  # (h, w) -> jitted process

    def get_fn(h, w):
        tile, stride = args.tile_size, args.tile_stride
        if args.tiled and args.tile_auto:
            from instarevive_tpu.pipelines.restore import auto_tile_geometry

            tile, stride = auto_tile_geometry(h, w)
        use_tiled = args.tiled and min(h, w) > tile
        key = (h, w, use_tiled, tile, stride)
        if key not in fns:
            fns[key] = pipe.jitted(
                tiled=use_tiled,
                use_swinir=not args.disable_preprocess_model,
                color_fix=args.color_fix_type,
                **(
                    dict(tile_size=tile, tile_stride=stride)
                    if use_tiled
                    else {}
                ),
            )
        return fns[key]

    # async dispatch pipelining: enqueue image i+1 on the device before
    # fetching image i's result (hides per-call dispatch latency)
    pending = None  # (device_array, th, tw, lq_resized, out_path, t0)

    def flush(p):
        pred_dev, th, tw, lq_resized, out_path, t0 = p
        pred = np.asarray(pred_dev)[0, :th, :tw]
        dt = time.time() - t0
        if args.show_lq and lq_resized is not None:
            lq_arr = np.array(lq_resized).astype(np.float32)[..., :3] / 255.0
            pred = np.concatenate([lq_arr[:th, :tw], pred], axis=1)
        save_image(pred, out_path)
        print(f"  {out_path}  ({th}x{tw}, {dt:.2f}s)")

    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        for i in range(args.repeat_times):
            out_path = os.path.join(
                args.output, f"{name}.png" if args.repeat_times == 1 else f"{name}_{i}.png"
            )
            if args.skip_if_exist and os.path.exists(out_path):
                continue
            lq = load_image(path)
            if args.sr_scale != 1:
                lq = lq.resize(
                    tuple(int(x * args.sr_scale) for x in lq.size), Image.BICUBIC
                )
            if args.use_center_crop:
                x = center_crop_arr(lq, 512)
                lq_resized = None
                th, tw = 512, 512
            else:
                lq_resized = auto_resize(lq, args.tile_size if args.tiled else 512)
                x = pad_to_multiple(np.array(lq_resized), 64)
                th, tw = lq_resized.height, lq_resized.width

            x01 = jnp.asarray(x[None].astype(np.float32) / 255.0)
            t0 = time.time()
            pred_dev = get_fn(*x01.shape[1:3])(params, x01, y)
            if pending is not None:
                flush(pending)
            pending = (pred_dev, th, tw, lq_resized, out_path, t0)
    if pending is not None:
        flush(pending)


if __name__ == "__main__":
    main()
