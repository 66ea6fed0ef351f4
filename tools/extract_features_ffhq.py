#!/usr/bin/env python
"""Pre-extract VAE latents (+T5 features) for a data_info.json manifest
with aspect-ratio bucketing — the multiscale variant of extract_features.

Parity target: reference ``tools/extract_features_ffhq.py:35-273``
(DatasetExtract over a data_info.json: per image pick the closest
aspect-ratio bucket, bicubic-resize + center-crop to the bucket size,
encode, save with img_hw/aspect_ratio side info; threaded save queue).

TPU notes: images are grouped BY BUCKET so the jitted encoder compiles once
per bucket shape (the reference pays a python loop per image on GPU).
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading
from collections import defaultdict

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="dataset root (images)")
    p.add_argument("--data_info", required=True, help="data_info.json manifest")
    p.add_argument("--output", required=True)
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--t5_dir", default=None, help="local T5 checkpoint dir")
    p.add_argument("--resolution", type=int, default=512, choices=(256, 512, 1024))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_length", type=int, default=120)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=100_000_000)
    p.add_argument("--max_ratio", type=float, default=4.5,
                   help="drop images with aspect ratio above this (reference :73)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from instarevive_tpu.config import load_config
    from instarevive_tpu.data.dataset import ASPECT_RATIO_512
    from instarevive_tpu.ops.resize import pil_resize_bicubic
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params

    # bucket tables keyed by h/w ratio (diffusion/data/datasets/utils.py);
    # scale the 512 table for other base resolutions (same ratio set)
    scale = args.resolution / 512
    table = {
        r: (int(h * scale) // 64 * 64 or 64, int(w * scale) // 64 * 64 or 64)
        for r, (h, w) in ASPECT_RATIO_512.items()
    }

    with open(args.data_info) as f:
        meta = [m for m in json.load(f) if m.get("ratio", 1.0) <= args.max_ratio]
    meta = meta[args.start_index : args.end_index]
    print(f"{len(meta)} entries from {args.data_info}")

    cfg = load_config(args.config)
    pipe = build_pipeline(cfg)
    params = (
        load_params(pipe, vae_ckpt=args.vae_ckpt) if args.vae_ckpt else init_params(pipe)
    )
    enc = jax.jit(lambda img01: pipe.encode(params, img01))

    os.makedirs(os.path.join(args.output, "vae_feat"), exist_ok=True)
    save_q: "queue.Queue" = queue.Queue(maxsize=64)

    def saver():
        while True:
            item = save_q.get()
            if item is None:
                return
            path, payload = item
            np.savez_compressed(path, **payload)

    t = threading.Thread(target=saver, daemon=True)
    t.start()

    # group by bucket so each bucket shape compiles once
    keys = np.asarray(sorted(table.keys()))
    buckets = defaultdict(list)
    for m in meta:
        r = m["height"] / m["width"]  # reference get_closest_ratio (h/w)
        bh, bw = table[float(keys[np.argmin(np.abs(keys - r))])]
        buckets[(int(bh), int(bw))].append(m)

    n_saved = 0
    for (bh, bw), items in sorted(buckets.items()):
        for k in range(0, len(items), args.batch_size):
            chunk = items[k : k + args.batch_size]
            imgs, infos = [], []
            for m in chunk:
                path = os.path.join(args.root, m["path"])
                img = Image.open(path).convert("RGB")
                h, w = img.size[1], img.size[0]
                # bicubic resize to cover the bucket, then center crop
                s = max(bh / h, bw / w)
                rh, rw = max(int(round(h * s)), bh), max(int(round(w * s)), bw)
                arr = np.asarray(img, np.float32) / 255.0
                arr = np.asarray(pil_resize_bicubic(jnp.asarray(arr)[None], (rh, rw))[0])
                top, left = (rh - bh) // 2, (rw - bw) // 2
                imgs.append(arr[top : top + bh, left : left + bw])
                infos.append((m, h, w))
            z = np.asarray(enc(jnp.asarray(np.stack(imgs))))
            for (m, h, w), zi in zip(infos, z):
                base = os.path.splitext(os.path.basename(m["path"]))[0]
                save_q.put((
                    os.path.join(args.output, "vae_feat", f"{base}.npz"),
                    dict(latent=zi, img_hw=np.asarray([h, w], np.float32),
                         aspect_ratio=np.float32(bh / bw)),
                ))
                n_saved += 1
        print(f"bucket {bh}x{bw}: {len(items)} images")
    save_q.put(None)
    t.join()
    print(f"saved {n_saved} VAE latents")

    if args.t5_dir:
        from instarevive_tpu.models.t5 import T5Embedder

        os.makedirs(os.path.join(args.output, "t5_feat"), exist_ok=True)
        emb = T5Embedder(args.t5_dir, model_max_length=args.max_length)
        for k in range(0, len(meta), args.batch_size):
            chunk = meta[k : k + args.batch_size]
            feats, masks = emb.get_text_embeddings([m.get("prompt", "") for m in chunk])
            for m, f_, m_ in zip(chunk, feats, masks):
                base = os.path.splitext(os.path.basename(m["path"]))[0]
                np.savez_compressed(
                    os.path.join(args.output, "t5_feat", f"{base}.npz"),
                    caption_feature=f_, attention_mask=m_,
                )
        print(f"saved {len(meta)} T5 features")


if __name__ == "__main__":
    main()
