#!/usr/bin/env python
"""Build a PixArt-style ``data_info.json`` manifest for image folders.

Parity target: reference ``tools/generate_data_info.py`` — per image:
{"height", "width", "ratio" (w/h), "path", "prompt"} collected into one
JSON list consumed by the InternalData datasets.

The reference captions with BLIP on GPU; captioning weights cannot be
fetched here (zero egress), so the prompt source is pluggable:
``--captions`` (a {filename: caption} json, e.g. from
tools/extract_caption equivalents), ``--prompt`` (a fixed string, the
quality-prompt convention of test_scripts/inference.py:256), or
``--blip_dir`` (a LOCAL HuggingFace BLIP checkout, matching the
reference's captioner when weights are available).
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folders", nargs="+", required=True, help="image folders")
    p.add_argument("--output", required=True, help="output data_info.json")
    p.add_argument("--prompt", default="", help="fixed prompt for every image")
    p.add_argument("--captions", default=None, help="json {filename: caption}")
    p.add_argument("--blip_dir", default=None,
                   help="local BLIP dir (processor+model) for auto-captioning")
    p.add_argument("--relative_to", default=None,
                   help="store paths relative to this root (default: absolute)")
    p.add_argument("--sort", action="store_true", help="sort entries by path")
    args = p.parse_args()

    from PIL import Image

    from instarevive_tpu.utils.image_io import list_image_files

    captions = {}
    if args.captions:
        with open(args.captions) as f:
            captions = json.load(f)

    blip = None
    if args.blip_dir:
        from transformers import BlipForConditionalGeneration, BlipProcessor

        processor = BlipProcessor.from_pretrained(args.blip_dir)
        model = BlipForConditionalGeneration.from_pretrained(args.blip_dir)
        model.eval()

        def blip(img):
            import torch

            with torch.no_grad():
                inputs = processor(img, return_tensors="pt")
                out = model.generate(**inputs)
            return processor.decode(out[0], skip_special_tokens=True)

    results = []
    for folder in args.folders:
        for path in list_image_files(folder):
            with Image.open(path) as img:
                img = img.convert("RGB")
                width, height = img.size
                name = os.path.basename(path)
                if blip is not None:
                    prompt = blip(img)
                else:
                    prompt = captions.get(name, captions.get(path, args.prompt))
            rec_path = (
                os.path.relpath(path, args.relative_to)
                if args.relative_to
                else os.path.abspath(path)
            )
            results.append({
                "height": height,
                "width": width,
                "ratio": width / height,
                "path": rec_path,
                "prompt": prompt,
            })
            print(f"{rec_path}: {width}x{height} '{prompt[:40]}'")

    if args.sort:
        results.sort(key=lambda r: r["path"])
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f)
    print(f"wrote {len(results)} entries -> {args.output}")


if __name__ == "__main__":
    main()
