"""Tensor parallelism over a 'tensor' mesh axis — beyond-reference scaling.

The reference has no intra-model parallelism at all (SURVEY §2.5 "Other
parallelism: none"; grep-verified no tensor/pipeline/sequence parallel in
the tree) — it serves one process per GPU. On TPU the natural latency
lever for the 0.6 B-param DiT (reference PixArt_XL_2,
``diffusion/model/nets/PixArt.py:313-315``) is Megatron-style tensor
parallelism over the innermost mesh axis, expressed the GSPMD way: shard
the weight matrices with ``NamedSharding`` annotations, constrain the
attention activations on the head axis, and let XLA insert the
all-reduces (they ride ICI).

Layout per transformer block (hidden c, heads H, tp size t):

- ``attn.qkv`` / ``cross_attn.{q_linear,kv_linear}`` stay **replicated**
  and are computed redundantly on every device (their packed ``[q|k|v]``
  output layout cannot be head-sharded without breaking the
  torch-checkpoint weight layout; the redundant matmuls are ~3/16 of a
  block's linear FLOPs). Their outputs are then *sliced locally* — free,
  no communication — because the attention itself is constrained to
  H/t heads per device (``constrain_heads``).
- attention (the N² hot spot at 4096 latent tokens): split over heads.
- ``attn.proj`` / ``cross_attn.proj``: row-parallel — kernel sharded on
  the input dim P('tensor', None); XLA emits one all-reduce per matmul.
- ``mlp.fc1``: column-parallel — kernel P(None, 'tensor'), bias
  P('tensor'); activation comes out sharded, the GELU stays local.
- ``mlp.fc2``: row-parallel — one all-reduce.

Three (B, N, c) all-reduces per block total — the standard Megatron
count plus one for PixArt's extra cross-attention sublayer.

NOTE on the flash-attention kernel: a Pallas call has no GSPMD
partitioner, so under tp > 1 the attention must take the pure-XLA path
(``IR_ATTN_IMPL=xla``); ``RestorationPipeline.jitted_tp`` sets it for
the trace. Single-chip inference (no 'tensor' axis) is unaffected.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import param_sharding_rules

__all__ = ["tp_rules", "tp_shardings", "shard_params_tp"]

# (path regex, partition spec builder) — matched against the '/'-joined
# flax param path suffix. Kernels are flax (in, out) layout.
_COL_PARALLEL = re.compile(r"(^|/)mlp/fc1/kernel$")
_COL_BIAS = re.compile(r"(^|/)mlp/fc1/bias$")
_ROW_PARALLEL = re.compile(
    r"(^|/)((attn|cross_attn)/proj|mlp/fc2)/kernel$"
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "idx", None)
        parts.append(str(name))
    return "/".join(parts)


def tp_rule(path, leaf, mesh: Mesh) -> NamedSharding:
    """TP sharding for one param; non-TP leaves fall back to the FSDP rule
    (replicated when the mesh's fsdp axis is 1)."""
    t = dict(mesh.shape).get("tensor", 1)
    if t == 1 or not hasattr(leaf, "shape"):
        return param_sharding_rules(leaf, mesh)
    s = _path_str(path)
    if _ROW_PARALLEL.search(s) and leaf.ndim == 2 and leaf.shape[0] % t == 0:
        return NamedSharding(mesh, P("tensor", None))
    if _COL_PARALLEL.search(s) and leaf.ndim == 2 and leaf.shape[1] % t == 0:
        return NamedSharding(mesh, P(None, "tensor"))
    if _COL_BIAS.search(s) and leaf.ndim == 1 and leaf.shape[0] % t == 0:
        return NamedSharding(mesh, P("tensor"))
    return param_sharding_rules(leaf, mesh)


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding tree for jit in_shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_rule(path, leaf, mesh), params
    )


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree with TP(+FSDP fallback) sharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, tp_rule(path, leaf, mesh)), params
    )
