"""Sequence (context) parallelism over a 'seq' mesh axis — beyond reference.

The reference scales spatial size purely architecturally — window
attention, KV compression, token masking, tiled inference (SURVEY §5
"Long-context mechanisms"); it has no way to spread ONE big attention
problem across devices. This module adds that: the DiT's latent token
axis is sharded over a 'seq' mesh axis, every device runs the full block
stack on its token shard, and each self-attention all-gathers K/V so
local queries attend over the exact global sequence
(``models/pixart.py SelfAttention.seq_parallel``). Per block that is two
(B, N, D) all-gathers on ICI — the standard all-gather flavor of context
parallelism; exact, not an approximation.

What it buys on TPU: activation memory and attention FLOPs per device
drop by S for a single large request — the lever for giant un-tiled
latents (2K/4K generation, reference
``configs/pixart_sigma_config/...kvcompress.py`` geometry) where the N²
self-attention no longer fits or dominates on one chip. It composes
conceptually with KV compression but this driver keeps the homogeneous
full-attention stack (asserted), matching the XL-2 default.

Everything per-token (LayerNorm, adaLN modulation, MLP, cross-attention
over the replicated 300-token text) stays local — zero extra collectives.
Pre-block embedders and the final layer run replicated outside the
shard_map (shared with ``parallel/pp.py``); end-to-end equivalence with
the monolithic forward is pinned by ``tests/test_parallel_sp.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .pp import _post_blocks, _pre_blocks, stack_block_params

__all__ = ["make_seq_mesh", "pixart_sp_forward"]


def make_seq_mesh(shards: int, devices=None) -> Mesh:
    """A dedicated ('seq',) mesh (single-axis for the same reason as
    ``pp.make_pipe_mesh``: the blocks' sharding hints must stay no-ops)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < shards:
        raise ValueError(f"need {shards} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:shards]), ("seq",))


def pixart_sp_forward(model, params: Any, mesh: Mesh, x, timestep, y, y_mask=None):
    """PixArt forward with latent tokens sharded over 'seq'.

    Params are replicated (SP shards activations, not weights); the token
    axis N = (H/p)·(W/p) must be divisible by the 'seq' size."""
    from instarevive_tpu.models.pixart import PixArtBlock

    if model.micro_condition:
        raise NotImplementedError("sequence parallelism: micro_condition path not wired")
    if tuple(model.kv_compress_layers) or tuple(model.window_block_indexes):
        raise NotImplementedError(
            "sequence parallelism needs the homogeneous full-attention stack "
            "(KV compression downsamples / windows are spatial-global ops)"
        )
    S = dict(mesh.shape)["seq"]
    tokens, y_tokens, t6, t_emb, grid = _pre_blocks(model, params, x, timestep, y)
    B, N, D = tokens.shape
    if N % S:
        raise ValueError(f"{N} tokens not divisible by seq shards {S}")
    block = PixArtBlock(
        model.hidden_size, model.num_heads, model.mlp_ratio,
        None, 1, model.qk_norm, 0, model.dtype, seq_parallel=True,
    )
    stacked = stack_block_params(params, model.depth)
    mask = y_mask if y_mask is not None else jnp.ones((B, y_tokens.shape[1]), bool)

    def per_device(blocks_all, toks_local, y_rep, t6_rep, m_rep):
        # every device runs ALL blocks on its token shard; the only
        # cross-device traffic is the K/V all-gather inside SelfAttention
        def body(carry, bp):
            return block.apply({"params": bp}, carry, y_rep, t6_rep, m_rep, grid), None

        out, _ = jax.lax.scan(body, toks_local, blocks_all)
        return out

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(), P(), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    tokens = fn(stacked, tokens, y_tokens, t6, mask)
    return _post_blocks(model, params, tokens, t_emb, grid)
