#!/usr/bin/env python
"""Export native orbax params back to a PyTorch state_dict (.pth).

The inverse of tools/convert_checkpoint.py — completes two-way checkpoint
interchange with the reference ecosystem (a model trained or fine-tuned
here loads straight into the reference torch stack / diffusers):

    python tools/export_checkpoint.py --kind swinir --src out/swinir --dst swinir.pth
    python tools/export_checkpoint.py --kind vae    --src out/vae    --dst vae.pth
    python tools/export_checkpoint.py --kind pixart --src out/dit    --dst dit.pth
    python tools/export_checkpoint.py --kind dit-diffusers --src out/dit --dst dit_diffusers.pth
    python tools/export_checkpoint.py --kind unet   --src out/unet   --dst unet.pth

Exporters are exact inverses of the importers (tests/test_export.py
round-trips bit-for-bit). ``--src`` is an orbax checkpoint directory:
either a raw param tree (convert_checkpoint.py output), a legacy
``{"params", "ema"}`` checkpoint, or a FULL train-state checkpoint
written by train.py (``{"states": [...], "rng", "step_i"}``) — for the
latter, ``--state_index`` picks the model (0 = generator; DMD saves the
fake score at 1) and ``--weights ema`` exports the EMA shadow instead of
the online params. ``--dst`` is written with ``torch.save`` as a flat
state_dict of CPU tensors.
"""

from __future__ import annotations

import argparse


def _select_params(tree, state_index: int, weights: str):
    """Normalize any of the three checkpoint layouts to a model param tree."""
    if isinstance(tree, dict) and "states" in tree:  # full train state
        state = tree["states"][state_index]
        sel = state.get("ema") if weights == "ema" else state.get("params")
        if sel is None:
            raise SystemExit(
                f"checkpoint state {state_index} has no {weights!r} tree"
            )
        return sel
    if isinstance(tree, dict) and set(tree) <= {"params", "ema"}:  # legacy
        sel = tree.get("ema") if weights == "ema" else tree.get("params")
        if sel is None:
            raise SystemExit(f"legacy checkpoint has no {weights!r} tree")
        return sel
    return tree  # raw param tree


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["swinir", "vae", "pixart", "dit-diffusers", "unet",
                            "controlnet"])
    p.add_argument("--src", required=True, help="orbax checkpoint dir")
    p.add_argument("--dst", required=True, help="output .pth path")
    p.add_argument("--depth", type=int, default=28)
    p.add_argument("--swinir_depths", type=int, nargs="*", default=[6] * 8)
    p.add_argument("--sf", type=int, default=8)
    p.add_argument("--state_index", type=int, default=0,
                   help="which TrainState to export from a full train "
                        "checkpoint (0 = generator)")
    p.add_argument("--weights", choices=["params", "ema"], default="params")
    args = p.parse_args()

    import numpy as np
    import torch

    from instarevive_tpu.convert.torch_export import (
        pixart_params_to_diffusers,
        pixart_params_to_torch,
        swinir_params_to_torch,
        unet_params_to_torch,
        vae_params_to_torch,
    )
    from instarevive_tpu.train.checkpoint import load_checkpoint

    params = _select_params(load_checkpoint(args.src), args.state_index,
                            args.weights)
    sd = {
        "swinir": lambda: swinir_params_to_torch(
            params, depths=tuple(args.swinir_depths), sf=args.sf),
        "vae": lambda: vae_params_to_torch(params),
        "pixart": lambda: pixart_params_to_torch(params, depth=args.depth),
        "dit-diffusers": lambda: pixart_params_to_diffusers(params, depth=args.depth),
        "unet": lambda: unet_params_to_torch(params),
        "controlnet": lambda: unet_params_to_torch(params, is_controlnet=True),
    }[args.kind]()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save(sd, args.dst)
    print(f"exported {args.kind}: {args.src} -> {args.dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
