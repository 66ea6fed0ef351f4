#!/usr/bin/env python
"""Pre-trained checkpoint locator (reference ``tools/download.py:21-57``).

``find_model(name)`` resolves a known pretrained-model name to a local
checkpoint under ``--model_dir`` (default ``output/pretrained_models``) or
loads an arbitrary local path. This environment has zero egress, so the
reference's HuggingFace download branch becomes an explicit instruction
pointing at the canonical URL instead of a silent fetch.
"""

from __future__ import annotations

import argparse
import os

# reference pretrained_models set (download.py:17-19) + the InstaRevive
# release checkpoints named in README.md
PRETRAINED_MODELS = {
    "PixArt-Sigma-XL-2-512-MS.pth",
    "PixArt-Sigma-XL-2-256x256.pth",
    "PixArt-Sigma-XL-2-1024-MS.pth",
    "InstaRevive_v1.ckpt",
    "general_swinir_v1.ckpt",
}

_HF_BASE = "https://huggingface.co/PixArt-alpha/PixArt-Sigma/resolve/main"


def find_model(model_name: str, model_dir: str = "output/pretrained_models"):
    """Load a pretrained checkpoint by registry name or local path.

    Returns the host state dict (via the safe torch loader). Reference
    ``find_model`` downloads registry names on miss; here a miss raises
    with the canonical URL so the caller can place the file locally.
    """
    from instarevive_tpu.train.checkpoint import _torch_load_safe

    if model_name in PRETRAINED_MODELS:
        local = os.path.join(model_dir, model_name)
        if not os.path.isfile(local):
            raise FileNotFoundError(
                f"{model_name} not found at {local}; this environment cannot "
                f"download — place the file there manually "
                f"(upstream: {_HF_BASE}/{model_name})"
            )
        return _torch_load_safe(local)
    if not os.path.isfile(model_name):
        raise FileNotFoundError(f"Could not find PixArt checkpoint at {model_name}")
    return _torch_load_safe(model_name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_names", nargs="+", default=sorted(PRETRAINED_MODELS))
    p.add_argument("--model_dir", default="output/pretrained_models")
    args = p.parse_args()
    missing = []
    for name in set(args.model_names):
        local = os.path.join(args.model_dir, name)
        status = "present" if os.path.isfile(local) else "MISSING"
        if status == "MISSING":
            missing.append(name)
        print(f"{name}: {status} ({local})")
    if missing:
        print(
            "zero-egress environment: fetch missing checkpoints elsewhere "
            f"and place them under {args.model_dir} (see {_HF_BASE}/<name>)"
        )
    print("Done.")


if __name__ == "__main__":
    main()
