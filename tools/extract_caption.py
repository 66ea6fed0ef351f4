#!/usr/bin/env python
"""Auto-caption images with the native LLaVA-MPT captioner.

Parity target: the reference vendors LLaVA(MPT) at
``diffusion/model/llava/`` for training-image captioning; the rebuilt stack
is ``instarevive_tpu/models/llava_mpt.py`` (flax MPT decoder + CLIP-feature
splice + jitted KV-cache greedy decode). This CLI mirrors the caption
workflow: images -> prompt with <im_patch> run -> generate -> JSON
{filename: caption}, consumable by tools/generate_data_info.py --captions.

Zero-egress gating: requires LOCAL checkpoints —
  --mpt_ckpt     LLaVA-MPT torch state_dict (.pt/.pth/.bin), converted via
                 convert.torch_import.mpt_params_from_torch
  --clip_dir     local HF CLIP vision dir (FlaxCLIPVisionModel, from_pt ok)
  --tokenizer    local HF tokenizer dir
Without them this exits with instructions (no proxy weights are invented).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

PROMPT = "Describe this image and its style in a very detailed manner."


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="image folder")
    p.add_argument("--output", required=True, help="output captions json")
    p.add_argument("--mpt_ckpt", default=None)
    p.add_argument("--clip_dir", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--prompt", default=PROMPT)
    p.add_argument("--max_new_tokens", type=int, default=96)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--mm_vision_select_layer", type=int, default=-2)
    p.add_argument("--d_model", type=int, default=4096)
    p.add_argument("--n_heads", type=int, default=32)
    p.add_argument("--n_layers", type=int, default=32)
    p.add_argument("--vocab_size", type=int, default=50432)
    args = p.parse_args()

    if not (args.mpt_ckpt and args.clip_dir and args.tokenizer):
        sys.exit(
            "extract_caption: needs local weights (zero-egress environment).\n"
            "Provide --mpt_ckpt (LLaVA-MPT state_dict), --clip_dir (HF CLIP\n"
            "vision dir) and --tokenizer (HF tokenizer dir). The architecture\n"
            "is parity-tested in tests/test_llava_mpt.py; no weights ship here."
        )

    import numpy as np
    import torch
    import jax.numpy as jnp
    from PIL import Image
    from transformers import AutoTokenizer, CLIPImageProcessor, FlaxCLIPVisionModel

    from instarevive_tpu.convert.torch_import import mpt_params_from_torch
    from instarevive_tpu.models.llava_mpt import (
        LlavaMPT, MPTConfig, MPTModel, clip_select_features,
    )
    from instarevive_tpu.utils.image_io import list_image_files

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    flax_tower = FlaxCLIPVisionModel.from_pretrained(args.clip_dir, from_pt=True)
    proc = CLIPImageProcessor.from_pretrained(args.clip_dir)
    vcfg = flax_tower.config
    n_patches = (vcfg.image_size // vcfg.patch_size) ** 2

    sd = torch.load(args.mpt_ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    cfg = MPTConfig(
        d_model=args.d_model, n_heads=args.n_heads, n_layers=args.n_layers,
        vocab_size=args.vocab_size, mm_hidden_size=vcfg.hidden_size,
    )
    params = mpt_params_from_torch(sd, cfg)
    model = MPTModel(cfg)

    im_patch = tok.convert_tokens_to_ids("<im_patch>")

    def vision_fn(images):
        out = flax_tower(pixel_values=images, output_hidden_states=True)
        return clip_select_features(out.hidden_states, args.mm_vision_select_layer)

    llava = LlavaMPT(model, params, vision_fn, im_patch)

    prompt_ids = tok(args.prompt).input_ids
    patch_run = [im_patch] * n_patches
    ids = np.asarray(prompt_ids + patch_run, np.int32)[None]

    results = {}
    files = list_image_files(args.input)
    for i in range(0, len(files), args.batch_size):
        chunk = files[i:i + args.batch_size]
        imgs = [Image.open(f).convert("RGB") for f in chunk]
        px = proc(images=imgs, return_tensors="np")["pixel_values"]
        b = px.shape[0]
        bid = np.repeat(ids, b, axis=0)
        toks = llava.generate(
            jnp.asarray(bid), jnp.asarray(px), jnp.ones(bid.shape, bool),
            args.max_new_tokens, eos_id=tok.eos_token_id,
        )
        for f, row in zip(chunk, np.asarray(toks)):
            text = tok.decode(row, skip_special_tokens=True).strip()
            results[os.path.basename(f)] = text
            print(f"{os.path.basename(f)}: {text}")

    with open(args.output, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {len(results)} captions -> {args.output}")


if __name__ == "__main__":
    main()
