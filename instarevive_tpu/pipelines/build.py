"""Build a RestorationPipeline + params from config + checkpoints.

Checkpoint formats auto-detected per component (SURVEY.md §7 "checkpoint
fidelity"): SwinIR Lightning .ckpt, CompVis/diffusers VAE, PixArt .pth or
diffusers Transformer2DModel (the InstaRevive_v1.ckpt format). Missing
checkpoints fall back to seeded random init (for smoke tests / benches in
this zero-egress environment).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.convert.torch_import import (
    pixart_params_from_diffusers,
    pixart_params_from_torch,
    swinir_params_from_torch,
    vae_params_from_torch,
)
from instarevive_tpu.diffusion.schedules import make_schedule
from instarevive_tpu.models.pixart import PixArt
from instarevive_tpu.models.swinir import SwinIR
from instarevive_tpu.models.vae import AutoencoderKL
from instarevive_tpu.pipelines.restore import RestorationPipeline


def build_pipeline(
    cfg: Mapping[str, Any], control_depth: int = 0, dtype=None
) -> RestorationPipeline:
    """``dtype`` (e.g. jnp.bfloat16) sets the compute dtype of every matmul/
    conv — the TPU serving configuration (params can stay f32 or be cast)."""
    import jax.numpy as jnp

    sw = dict(cfg.get("swinir", {}))
    sw["depths"] = tuple(sw.get("depths", (6,) * 8))
    sw["num_heads"] = tuple(sw.get("num_heads", (6,) * 8))
    vae = dict(cfg.get("vae", {}))
    vae["ch_mult"] = tuple(vae.get("ch_mult", (1, 2, 4, 4)))
    dit = dict(cfg.get("dit", {}))
    sched_cfg = dict(cfg.get("schedule", {"name": "linear", "num_timesteps": 1000}))
    if dtype is None and cfg.get("dtype"):
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg["dtype"]]
    if dtype is not None:
        sw["dtype"] = vae["dtype"] = dit["dtype"] = dtype
    return RestorationPipeline(
        swinir=SwinIR(**sw),
        vae=AutoencoderKL(**vae),
        dit=PixArt(**dit),
        sched=make_schedule(sched_cfg.pop("name", "linear"), **sched_cfg),
        maxt=int(cfg.get("maxt", 400)),
        control_depth=control_depth,
    )


def init_params(
    pipe: RestorationPipeline,
    seed: int = 0,
    components: Optional[Tuple[str, ...]] = None,
) -> Dict[str, Any]:
    """Seeded random init (smoke-test path).

    ``components`` restricts which models get initialized (e.g.
    ("swinir", "vae") for the cldm/LDM tasks, which bring their own
    denoiser) — initializing the default 0.6B DiT costs minutes on CPU
    and must not be paid by tasks that never use it.
    """
    components = components or ("swinir", "vae", "dit")
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    ex_img = jnp.zeros((1, 64, 64, 3))
    ex_lat = jnp.zeros((1, 8, 8, 4))
    # jit the inits: one compiled program each instead of thousands of
    # op-by-op RNG dispatches (critical over the remote-TPU tunnel)
    out: Dict[str, Any] = {}
    if "swinir" in components:
        out["swinir"] = jax.jit(pipe.swinir.init)(k1, ex_img)["params"]
    if "vae" in components:
        out["vae"] = jax.jit(pipe.vae.init)(k2, ex_img)["params"]
    if "dit" in components:
        y = jnp.zeros((1, pipe.dit.model_max_length, pipe.dit.caption_channels))
        kwargs = {}
        if pipe.control_depth:
            kwargs = dict(c=ex_lat, control_depth=pipe.control_depth)
        out["dit"] = jax.jit(
            lambda k, z, t, yy: pipe.dit.init(k, z, t, yy, **kwargs)
        )(k3, ex_lat, jnp.zeros((1,)), y)["params"]
    return out


def load_params(
    pipe: RestorationPipeline,
    swinir_ckpt: Optional[str] = None,
    vae_ckpt: Optional[str] = None,
    dit_ckpt: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, Any]:
    """Load/convert whatever checkpoints are given; random-init the rest."""
    from instarevive_tpu.train.checkpoint import load_torch_state_dict

    params = init_params(pipe, seed)
    if swinir_ckpt:
        sd = load_torch_state_dict(swinir_ckpt)
        params["swinir"] = swinir_params_from_torch(
            sd, depths=pipe.swinir.depths, upsampler=pipe.swinir.upsampler, sf=pipe.swinir.sf
        )
    if vae_ckpt:
        sd = load_torch_state_dict(vae_ckpt)
        params["vae"] = vae_params_from_torch(
            sd, ch_mult=pipe.vae.ch_mult, num_res_blocks=pipe.vae.num_res_blocks
        )
    if dit_ckpt:
        sd = load_torch_state_dict(dit_ckpt)
        if any(k.startswith("transformer_blocks.") or ".base_block." in k for k in sd):
            converted = pixart_params_from_diffusers(sd, depth=pipe.dit.depth)
        else:
            converted = pixart_params_from_torch(sd, depth=pipe.dit.depth)
        # keep randomly-initialized y_embedding if absent in the checkpoint
        if "y_embedding" not in converted.get("y_embedder", {}):
            converted.setdefault("y_embedder", {})["y_embedding"] = np.asarray(
                params["dit"]["y_embedder"]["y_embedding"]
            )
        params["dit"] = converted
    return params


def precast_serving_params(
    params: Dict[str, Any],
    dtype=jnp.bfloat16,
    subtrees: Tuple[str, ...] = ("swinir", "vae"),
) -> Dict[str, Any]:
    """Pre-cast conv-stage weights to the serving compute dtype.

    Numerically identical to serving f32 masters for every param flax
    promotes to the module dtype (conv/dense/norm weights); the cast only
    removes the per-call f32->bf16 convert traffic (+1.4% e2e, BENCH.md
    round 3). Params deliberately consumed at f32 precision are EXCLUDED:
    SwinIR's ``relative_position_bias_table`` is added to f32 attention
    scores (models/swinir.py) and pre-casting it would quantize the bias.
    """
    keep_f32 = ("relative_position_bias_table",)

    def _cast_tree(tree):
        def _cast(path, x):
            if any(getattr(p, "key", None) in keep_f32 for p in path):
                return x
            return x.astype(dtype) if hasattr(x, "astype") else x

        return jax.tree_util.tree_map_with_path(_cast, tree)

    return {k: (_cast_tree(v) if k in subtrees else v) for k, v in params.items()}
