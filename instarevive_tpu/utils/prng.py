"""PRNG-key threading helpers.

Replaces the reference's global-seed plumbing (``diffusion/utils/misc.py:33-84``,
``pl.seed_everything``) with explicit, splittable JAX keys.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import jax


class KeySeq:
    """A stateful convenience wrapper producing a fresh subkey per ``next()``.

    Only for host-side orchestration (never inside jit). Inside jit, split
    explicitly.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def __next__(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self, n: int) -> Sequence[jax.Array]:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    def __iter__(self) -> Iterator[jax.Array]:
        return self


def per_sample_keys(base_seed: int, sample_ids) -> jax.Array:
    """Per-sample reproducible keys (diffusion/model/utils.py
    StackedRandomGenerator analog): same sample id -> same noise regardless
    of batch composition."""
    import jax.numpy as jnp

    base = jax.random.key(base_seed)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.asarray(sample_ids))


def stacked_randn(base_seed: int, sample_ids, shape_per_sample) -> jax.Array:
    """Batch of N(0,1) tensors keyed by per-sample ids."""
    keys = per_sample_keys(base_seed, sample_ids)
    return jax.vmap(lambda k: jax.random.normal(k, shape_per_sample))(keys)
