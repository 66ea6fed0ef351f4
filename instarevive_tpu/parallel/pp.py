"""Pipeline parallelism over a 'pipe' mesh axis — beyond-reference scaling.

The reference has no intra-model parallelism of any kind (SURVEY §2.5
"Other parallelism: none" — grep-verified no tensor/pipeline/sequence
parallel in the tree); it serves one process per GPU. ``parallel/tp.py``
added the Megatron-style tensor axis; this module adds the other classic
leg: **GPipe-style pipeline parallelism** for the PixArt DiT block stack
(reference ``diffusion/model/nets/PixArt.py:25-315`` — 28 identical
blocks, 95%+ of the one-step FLOPs), the TPU-native way:

- The 28 blocks' parameters are **stacked on a leading depth axis** and
  sharded over the 'pipe' mesh axis — each device *holds* only
  ``depth/S`` blocks (the memory lever: an XL-2 that does not fit one
  chip's HBM runs with S-way sharded weights and NO per-step weight
  all-gathers, unlike FSDP).
- The forward runs under ``jax.shard_map``: the batch is split into M
  microbatches; at tick t, stage s runs its local blocks (a ``lax.scan``
  over the stacked params) on microbatch ``t - s`` and hands its
  activation to stage ``s+1`` with a single ``lax.ppermute`` hop — the
  schedule is the classic GPipe fill/drain (``M + S - 1`` ticks, bubble
  fraction ``(S-1)/(M+S-1)``), and every hop rides one ICI neighbor link.
- Pre-block embedders and the final layer (<1% of FLOPs) stay replicated
  outside the shard_map; their math mirrors ``PixArt.__call__`` and the
  equivalence is pinned end-to-end by ``tests/test_parallel_pp.py``
  (pipelined forward == monolithic forward).

Scope: inference/serving forward (the latency/memory lever for big
single requests). Training stays on the FSDP path (``parallel/mesh.py``)
— the GPipe backward would additionally need per-microbatch activation
stashing, and FSDP already covers the training memory story. Homogeneous
block stacks only (the XL-2 default: no per-block kv-compression or
window attention) and no ControlNet branch; both assert loudly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_pipe_mesh",
    "stack_block_params",
    "shard_stacked",
    "pixart_pp_forward",
]


def make_pipe_mesh(stages: int, devices=None) -> Mesh:
    """A dedicated ('pipe',) mesh. Kept single-axis on purpose: the block
    internals' sharding hints (constrain_batch/constrain_heads,
    parallel/mesh.py) key on 'data'/'fsdp'/'tensor' axis names and must
    stay no-ops inside the shard_map body."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < stages:
        raise ValueError(f"need {stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:stages]), ("pipe",))


def stack_block_params(params: Any, depth: int) -> Any:
    """Stack the per-block param trees ``blocks_0..depth-1`` on a new
    leading axis (the scan/pipe axis). Requires homogeneous blocks."""
    trees = [params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    """Place a stacked block tree with its depth axis split over 'pipe' —
    after this, each device physically holds depth/S blocks."""
    sh = NamedSharding(mesh, P("pipe"))
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), stacked)


def _pre_blocks(model, params, x, timestep, y):
    """Everything before the block loop — mirrors ``PixArt.__call__``
    (models/pixart.py; reference PixArt.py:25-315). Equivalence with the
    monolithic forward is pinned by tests/test_parallel_pp.py."""
    from instarevive_tpu.models.pixart import (
        CaptionEmbedder,
        TimestepEmbedder,
        sincos_pos_embed_2d,
    )

    b, hh, ww, _ = x.shape
    p = model.patch_size
    gh, gw = hh // p, ww // p
    base_size = model.input_size // p

    tokens = nn.Conv(
        model.hidden_size, (p, p), strides=(p, p), dtype=model.dtype
    ).apply({"params": params["x_embedder"]}, x)
    tokens = tokens.reshape(b, gh * gw, model.hidden_size)
    pe = jnp.asarray(
        sincos_pos_embed_2d(model.hidden_size, gh, gw, model.pe_interpolation, base_size)
    )
    tokens = tokens + pe[None].astype(tokens.dtype)

    t_emb = TimestepEmbedder(model.hidden_size, dtype=model.dtype).apply(
        {"params": params["t_embedder"]}, timestep
    )
    t6 = nn.Dense(6 * model.hidden_size, dtype=model.dtype).apply(
        {"params": params["t_block"]}, nn.silu(t_emb)
    ).reshape(b, 6, model.hidden_size)

    y_tokens = CaptionEmbedder(
        model.hidden_size,
        model.caption_channels,
        model.model_max_length,
        model.class_dropout_prob,
        model.dtype,
    ).apply({"params": params["y_embedder"]}, y)
    return tokens, y_tokens, t6, t_emb, (gh, gw)


def _post_blocks(model, params, tokens, t_emb, grid):
    """T2IFinalLayer + unpatchify — mirrors the tail of
    ``PixArt.__call__`` (reference PixArt_blocks.py:259-275)."""
    gh, gw = grid
    p = model.patch_size
    b = tokens.shape[0]
    mods = params["final_scale_shift_table"][None] + t_emb[:, None]
    shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
    out = nn.LayerNorm(
        epsilon=1e-6, use_bias=False, use_scale=False, dtype=model.dtype
    ).apply({"params": {}}, tokens)
    out = out * (1 + scale) + shift
    out = nn.Dense(p * p * model.out_channels, dtype=model.dtype).apply(
        {"params": params["final_linear"]}, out
    )
    out = out.reshape(b, gh, gw, p, p, model.out_channels)
    return jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(
        b, gh * p, gw * p, model.out_channels
    )


def _pipeline_blocks(block, stacked, tokens, y_tokens, t6, kv_mask, grid, mesh, microbatches):
    """The shard_map GPipe loop over the 'pipe' axis (module docstring)."""
    S = dict(mesh.shape)["pipe"]
    B, N, D = tokens.shape
    M = int(microbatches)
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by pipe stages {S}")
    mb = B // M
    # None-mask == all-true mask for CrossAttention (models/pixart.py)
    mask = kv_mask if kv_mask is not None else jnp.ones((B, y_tokens.shape[1]), bool)

    def to_mb(a):
        return a.reshape(M, mb, *a.shape[1:])

    def per_device(blocks_local, xs, ys, t6s, ms):
        s = jax.lax.axis_index("pipe")

        def stage(x, y_m, t6_m, m_m):
            def body(carry, bp):
                return block.apply({"params": bp}, carry, y_m, t6_m, m_m, grid), None

            out, _ = jax.lax.scan(body, x, blocks_local)
            return out

        def tick(state, t):
            carry, outs = state
            # stage s processes microbatch t - s this tick (garbage in the
            # fill/drain bubbles — masked out of the collected outputs)
            mi = jnp.clip(t - s, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(s == 0, inject, carry)
            y_m = jax.lax.dynamic_index_in_dim(ys, mi, 0, keepdims=False)
            t6_m = jax.lax.dynamic_index_in_dim(t6s, mi, 0, keepdims=False)
            m_m = jax.lax.dynamic_index_in_dim(ms, mi, 0, keepdims=False)
            x_out = stage(x_in, y_m, t6_m, m_m)
            # the last stage emits microbatch t-(S-1) once the pipe is full
            oi = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, oi, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(t - (S - 1) >= 0, x_out, cur), oi, 0
            )
            # one neighbor hop: stage s's activation becomes s+1's input
            carry = jax.lax.ppermute(x_out, "pipe", [(i, i + 1) for i in range(S - 1)])
            return (carry, outs), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # only the last stage's collected outputs are the real ones;
        # masked psum broadcasts them back to every stage
        last = (s == S - 1)
        return jax.lax.psum(jnp.where(last, outs, jnp.zeros_like(outs)), "pipe")

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("pipe"), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    outs = fn(stacked, to_mb(tokens), to_mb(y_tokens), to_mb(t6), to_mb(mask))
    return outs.reshape(B, N, D)


def pixart_pp_forward(
    model,
    params: Any,
    mesh: Mesh,
    x,
    timestep,
    y,
    y_mask=None,
    *,
    microbatches: int = 2,
    stacked: Optional[Any] = None,
):
    """PixArt forward with the block stack pipeline-parallel over 'pipe'.

    ``stacked`` (from :func:`stack_block_params`, placed with
    :func:`shard_stacked`) lets a serving loop keep the per-stage weights
    resident; when omitted it is built from ``params`` on the fly."""
    from instarevive_tpu.models.pixart import PixArtBlock

    if model.micro_condition:
        raise NotImplementedError("pipeline parallelism: micro_condition path not wired")
    if tuple(model.kv_compress_layers) or tuple(model.window_block_indexes):
        raise NotImplementedError(
            "pipeline parallelism needs a homogeneous block stack "
            "(no per-block kv-compression / window attention)"
        )
    tokens, y_tokens, t6, t_emb, grid = _pre_blocks(model, params, x, timestep, y)
    block = PixArtBlock(
        model.hidden_size, model.num_heads, model.mlp_ratio,
        None, 1, model.qk_norm, 0, model.dtype,
    )
    if stacked is None:
        stacked = stack_block_params(params, model.depth)
    tokens = _pipeline_blocks(
        block, stacked, tokens, y_tokens, t6, y_mask, grid, mesh, microbatches
    )
    return _post_blocks(model, params, tokens, t_emb, grid)
