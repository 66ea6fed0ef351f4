"""Functional LoRA for flax param trees.

Parity target: the reference's Dist_ControlLDM LoRA distillation
(``diffusion/cldm.py:1162-1625``) whose ``inject_trainable_lora`` import is
missing upstream (SURVEY.md §2 broken refs) — here it's a first-class
feature: low-rank adapters on chosen Dense kernels, trained while the base
stays frozen, merged at apply time (params' = params + scale * A @ B).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

DEFAULT_PATTERN = r".*(attn1|attn2|cross_attn|attn)_(q|k|v|out)$|.*(q_linear|kv_linear|qkv|proj)$"


def _iter_paths(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _iter_paths(v, p)
        else:
            yield p, v


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def init_lora(
    rng: jax.Array,
    params: Dict[str, Any],
    rank: int = 64,
    pattern: str = DEFAULT_PATTERN,
) -> Dict[str, Any]:
    """Create {path: {a, b}} adapters for matching 2-D 'kernel' leaves.

    a ~ N(0, 1/rank) (down), b = 0 (up) so initial delta is zero — the
    standard LoRA init; lora_rank 64 matches configs/cldm.yaml:24.
    """
    regex = re.compile(pattern)
    lora: Dict[str, Any] = {}
    keys = jax.random.split(rng, 4096)
    i = 0
    for path, leaf in _iter_paths(params):
        if not path.endswith("/kernel") or leaf.ndim != 2:
            continue
        mod_path = path[: -len("/kernel")]
        if not regex.match(mod_path):
            continue
        d_in, d_out = leaf.shape
        r = min(rank, d_in, d_out)
        _set(lora, mod_path + "/a", jax.random.normal(keys[i % 4096], (d_in, r)) / r)
        _set(lora, mod_path + "/b", jnp.zeros((r, d_out)))
        i += 1
    return lora


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any], scale: float = 1.0):
    """params + scale * a @ b on adapted kernels (pure; jit-friendly)."""
    merged = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for path, _ in list(_iter_paths(lora)):
        if not path.endswith("/a"):
            continue
        mod = path[: -len("/a")]
        a = _get(lora, mod + "/a")
        b = _get(lora, mod + "/b")
        kern = _get(merged, mod + "/kernel")
        _set(merged, mod + "/kernel", kern + scale * (a @ b).astype(kern.dtype))
    return merged


def count_lora_params(lora: Dict[str, Any]) -> int:
    return sum(int(v.size) for _, v in _iter_paths(lora))
