#!/usr/bin/env python
"""Metric evaluation CLI (reference evaluate_img.py:11-65 equivalent).

Paired metrics (PSNR(Y)/SSIM(Y)/LPIPS with --ref_folder) run on-device.
No-reference NIQE is implemented natively (instarevive_tpu/utils/niqe.py):
pass --niqe_params niqe_pris_params.npz (basicsr/pyiqa format) or
--niqe_fit <pristine folder> to fit a model in place. The reference's
remaining pyiqa no-ref metrics are implemented natively with weight
importers: --musiq_params (npz, utils/musiq.py) and --maniqa_ckpt (official
torch checkpoint, utils/maniqa.py) enable MUSIQ/MANIQA; --clipiqa_model a
local HF CLIP dir or an OpenAI CLIP RN50 state dict (pyiqa's default
backbone, native ModifiedResNet in models/clip_rn50.py);
--lpips_ckpt/--alexnet_ckpt enable LPIPS.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-folder", "--folder", required=True, help="output images")
    p.add_argument("-ref_folder", "--ref_folder", default=None, help="ground-truth images")
    p.add_argument("--crop_border", type=int, default=4)
    p.add_argument("--y_channel", action="store_true", default=True)
    p.add_argument("--lpips_ckpt", default=None)
    p.add_argument("--alexnet_ckpt", default=None)
    p.add_argument("--niqe_params", default=None,
                   help="niqe_pris_params.npz (basicsr/pyiqa format)")
    p.add_argument("--niqe_fit", default=None,
                   help="folder of pristine images to fit a NIQE model from")
    p.add_argument("--musiq_params", default=None,
                   help="MUSIQ weights npz (utils/musiq.py native format)")
    p.add_argument("--maniqa_ckpt", default=None,
                   help="official MANIQA torch checkpoint (incl. ViT-B/8 trunk)")
    p.add_argument("--clipiqa_model", default=None,
                   help="CLIP weights for the CLIP-IQA no-reference metric: "
                        "a local HF CLIP dir (model+tokenizer), or an OpenAI "
                        "CLIP RN50 state dict .pt/.pth (pyiqa's default "
                        "backbone — scores comparable with published evals)")
    p.add_argument("--clipiqa_tokenizer", default=None,
                   help="local HF CLIP tokenizer dir (required with an RN50 "
                        "state dict; optional override for HF dirs)")
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from instarevive_tpu.utils.image_io import list_image_files
    from instarevive_tpu.utils.metrics import LPIPS, psnr, ssim

    files = list_image_files(args.folder)
    print(f"evaluating {len(files)} images in {args.folder}")

    lpips_fn = None
    if args.lpips_ckpt and args.alexnet_ckpt:
        import torch

        lp = LPIPS(
            LPIPS.alexnet_feature_params_from_torch(
                torch.load(args.alexnet_ckpt, map_location="cpu"),
                torch.load(args.lpips_ckpt, map_location="cpu"),
            )
        )
        lpips_fn = lp

    niqe_model = None
    if args.niqe_params or args.niqe_fit:
        from instarevive_tpu.utils.niqe import (fit_pristine_model,
                                                load_pris_params, niqe)

        if args.niqe_params:
            niqe_model = load_pris_params(args.niqe_params)
        else:
            pris = [
                np.asarray(Image.open(f2).convert("L"), np.float64)
                for f2 in list_image_files(args.niqe_fit)
            ]
            niqe_model = fit_pristine_model(pris)

    musiq_fn = None
    if args.musiq_params:
        from instarevive_tpu.utils.musiq import MUSIQ, params_from_npz

        musiq_fn = MUSIQ(params_from_npz(args.musiq_params))

    maniqa_fn = None
    if args.maniqa_ckpt:
        from instarevive_tpu.train.checkpoint import load_torch_state_dict
        from instarevive_tpu.utils.maniqa import MANIQA, params_from_torch

        maniqa_fn = MANIQA(params_from_torch(load_torch_state_dict(args.maniqa_ckpt)))

    clipiqa_fn = None
    if args.clipiqa_model:
        from instarevive_tpu.utils.clipiqa import CLIPIQA

        clipiqa_fn = CLIPIQA(model_dir=args.clipiqa_model,
                             tokenizer_dir=args.clipiqa_tokenizer)

    results = {"psnr": [], "ssim": [], "lpips": [], "niqe": [], "clipiqa": [],
               "musiq": [], "maniqa": []}
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32)[None] / 255.0
        if niqe_model is not None:
            results["niqe"].append(niqe(img[0], niqe_model))
        if clipiqa_fn is not None:
            results["clipiqa"].append(float(clipiqa_fn(img)[0]))
        if musiq_fn is not None:
            results["musiq"].append(float(musiq_fn(img)[0]))
        if maniqa_fn is not None:
            results["maniqa"].append(float(maniqa_fn(img)[0]))
        if args.ref_folder:
            ref_path = os.path.join(args.ref_folder, os.path.basename(f))
            if not os.path.exists(ref_path):
                base = os.path.splitext(os.path.basename(f))[0]
                cands = [c for c in list_image_files(args.ref_folder)
                         if os.path.splitext(os.path.basename(c))[0] == base]
                if not cands:
                    continue
                ref_path = cands[0]
            ref = np.asarray(Image.open(ref_path).convert("RGB"), np.float32)[None] / 255.0
            hh = min(img.shape[1], ref.shape[1])
            ww = min(img.shape[2], ref.shape[2])
            a, b = jnp.asarray(img[:, :hh, :ww]), jnp.asarray(ref[:, :hh, :ww])
            results["psnr"].append(float(psnr(a, b, args.crop_border, args.y_channel)[0]))
            results["ssim"].append(float(ssim(a, b, args.crop_border, args.y_channel)[0]))
            if lpips_fn is not None:
                results["lpips"].append(float(lpips_fn(a * 2 - 1, b * 2 - 1)[0]))

    for k, v in results.items():
        if v:
            print(f"{k}: {np.mean(v):.4f}  (n={len(v)})")


if __name__ == "__main__":
    main()
