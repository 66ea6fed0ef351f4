#!/usr/bin/env python
"""Pre-extract VAE latents + T5 caption features for training.

Parity target: reference ``tools/extract_features.py:35-353`` (VAE-latent &
T5-caption pre-extraction with aspect buckets and a threaded save queue).
Latent extraction runs batched+jitted on TPU; features are saved as .npz
per image (the reference's .npy layout, one dir per kind).
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="image folder / file list")
    p.add_argument("--output", required=True)
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--t5_dir", default=None, help="local T5 checkpoint dir")
    p.add_argument("--captions", default=None, help="json {filename: caption}")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_length", type=int, default=120)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from instarevive_tpu.config import load_config
    from instarevive_tpu.data.dataset import ImageFolderDataset, PrefetchLoader
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params

    os.makedirs(os.path.join(args.output, "vae_feat"), exist_ok=True)
    cfg = load_config(args.config)
    pipe = build_pipeline(cfg)
    params = (
        load_params(pipe, vae_ckpt=args.vae_ckpt) if args.vae_ckpt else init_params(pipe)
    )

    enc = jax.jit(lambda img01: pipe.encode(params, img01))

    ds = ImageFolderDataset(args.input, out_size=args.size, crop_type="center", use_hflip=False)
    loader = PrefetchLoader(ds, args.batch_size, shuffle=False, drop_last=False)

    save_q: "queue.Queue" = queue.Queue(maxsize=64)

    def saver():
        while True:
            item = save_q.get()
            if item is None:
                return
            path, arr = item
            np.savez_compressed(path, latent=arr)

    t = threading.Thread(target=saver, daemon=True)
    t.start()

    i = 0
    for batch in loader:
        z = np.asarray(enc(jnp.asarray(batch["hq"], jnp.float32) / 255.0))
        for j in range(z.shape[0]):
            name = os.path.splitext(os.path.basename(ds.files[i]))[0]
            save_q.put((os.path.join(args.output, "vae_feat", f"{name}.npz"), z[j]))
            i += 1
    save_q.put(None)
    t.join()
    print(f"saved {i} VAE latents")

    if args.t5_dir and args.captions:
        from instarevive_tpu.models.t5 import T5Embedder

        os.makedirs(os.path.join(args.output, "t5_feat"), exist_ok=True)
        with open(args.captions) as f:
            caps = json.load(f)
        emb = T5Embedder(args.t5_dir, model_max_length=args.max_length)
        names = list(caps.keys())
        for k in range(0, len(names), args.batch_size):
            chunk = names[k : k + args.batch_size]
            feats, masks = emb.get_text_embeddings([caps[n] for n in chunk])
            for n, f_, m_ in zip(chunk, feats, masks):
                base = os.path.splitext(n)[0]
                np.savez_compressed(
                    os.path.join(args.output, "t5_feat", f"{base}.npz"),
                    caption_feature=f_, attention_mask=m_,
                )
        print(f"saved {len(names)} T5 features")


if __name__ == "__main__":
    main()
