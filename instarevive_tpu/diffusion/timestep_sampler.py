"""Timestep schedule samplers for training.

Parity target: reference ``diffusion/model/timestep_sampler.py:27-120``
(UniformSampler + LossSecondMomentResampler with distributed loss sync).
The torch version all-gathers per-rank losses; here history is part of the
(replicated or psum-reduced) train state, so it works unchanged under pjit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def uniform_sample_t(rng: jax.Array, batch: int, num_timesteps: int):
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,))
    return t, weights


class LossSecondMomentState(NamedTuple):
    history: jnp.ndarray  # (T, history_per_term)
    counts: jnp.ndarray  # (T,)


def loss_second_moment_init(num_timesteps: int, history_per_term: int = 10):
    return LossSecondMomentState(
        history=jnp.zeros((num_timesteps, history_per_term)),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def loss_second_moment_weights(
    state: LossSecondMomentState, uniform_prob: float = 0.001
) -> jnp.ndarray:
    """Importance weights ~ sqrt(E[loss^2]) with uniform mixing."""
    warmed = jnp.all(state.counts >= state.history.shape[1])
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / state.history.shape[0]
    uniform = jnp.full_like(w, 1.0 / w.shape[0])
    return jnp.where(warmed, w, uniform)


def loss_second_moment_sample(
    rng: jax.Array, state: LossSecondMomentState, batch: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = loss_second_moment_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def loss_second_moment_update(
    state: LossSecondMomentState, t: jnp.ndarray, losses: jnp.ndarray
) -> LossSecondMomentState:
    """Ring-buffer insert of per-sample losses at their timesteps.

    (The torch version all-gathers across ranks first; under pjit the
    caller passes globally-gathered (t, losses) or accepts per-shard
    updates — both converge.)"""
    hist, counts = state.history, state.counts
    hpt = hist.shape[1]

    def body(i, carry):
        hist, counts = carry
        ti = t[i]
        c = counts[ti]
        pos = jnp.where(c >= hpt, hpt - 1, c)
        # when full: shift left then write last (matches reference :104-110)
        row = hist[ti]
        shifted = jnp.where(c >= hpt, jnp.roll(row, -1).at[hpt - 1].set(losses[i]),
                            row.at[pos].set(losses[i]))
        hist = hist.at[ti].set(shifted)
        counts = counts.at[ti].set(jnp.minimum(c + 1, hpt))
        return hist, counts

    hist, counts = jax.lax.fori_loop(0, t.shape[0], body, (hist, counts))
    return LossSecondMomentState(hist, counts)
