#!/usr/bin/env python
"""Convert foreign PyTorch checkpoints to native orbax params.

Parity target: the reference's converter pattern
(``tools/convert_pixart_to_diffusers.py``) — here covering all three
foreign formats into our flax trees:

    python tools/convert_checkpoint.py --kind swinir --src general_swinir_v1.ckpt --dst out/swinir
    python tools/convert_checkpoint.py --kind vae    --src sd-vae.ckpt          --dst out/vae
    python tools/convert_checkpoint.py --kind pixart --src epoch_20.pth         --dst out/dit
    python tools/convert_checkpoint.py --kind dit-diffusers --src InstaRevive_v1.ckpt --dst out/dit
    python tools/convert_checkpoint.py --kind unet   --src cldm.ckpt --prefix model.diffusion_model. --dst out/unet
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["swinir", "vae", "pixart", "dit-diffusers", "unet", "controlnet"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--prefix", default=None, help="strip this key prefix first")
    p.add_argument("--depth", type=int, default=28)
    args = p.parse_args()

    from instarevive_tpu.convert.torch_import import (
        pixart_params_from_diffusers,
        pixart_params_from_torch,
        swinir_params_from_torch,
        unet_params_from_torch,
        vae_params_from_torch,
    )
    from instarevive_tpu.train.checkpoint import load_torch_state_dict, save_checkpoint

    sd = load_torch_state_dict(args.src)
    if args.prefix:
        sd = {k[len(args.prefix):]: v for k, v in sd.items() if k.startswith(args.prefix)}

    params = {
        "swinir": lambda: swinir_params_from_torch(sd),
        "vae": lambda: vae_params_from_torch(sd),
        "pixart": lambda: pixart_params_from_torch(sd, depth=args.depth),
        "dit-diffusers": lambda: pixart_params_from_diffusers(sd, depth=args.depth),
        "unet": lambda: unet_params_from_torch(sd),
        "controlnet": lambda: unet_params_from_torch(sd, is_controlnet=True),
    }[args.kind]()
    save_checkpoint(args.dst, params)
    print(f"converted {args.kind}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
