"""Optimizers + LR schedules (optax).

Parity target: reference ``diffusion/utils/optimizer.py`` (AdamW via mmcv
constructor, Lion :175-242, CAMEWrapper :243-, ``auto_scale_lr`` :18-31) and
``diffusion/utils/lr_scheduler.py:9-80`` (constant/cosine with warmup +
cosine-decay-to-constant). Lion and AdamW come from optax; CAME is
implemented here natively (optax has no CAME).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def auto_scale_lr(base_lr: float, effective_bs: int, base_bs: int = 256, rule: str = "sqrt"):
    """lr scaling rule (optimizer.py:18-31)."""
    ratio = effective_bs / base_bs
    return base_lr * (math.sqrt(ratio) if rule == "sqrt" else ratio)


# ---------------------------------------------------------------------------
# LR schedules (lr_scheduler.py)
# ---------------------------------------------------------------------------


def constant_with_warmup(lr: float, warmup_steps: int) -> optax.Schedule:
    def sched(step):
        warm = jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))
        return lr * warm

    return sched


def cosine_with_warmup(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    def sched(step):
        warm = jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))
        prog = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        return lr * warm * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))

    return sched


def cosine_decay_to_constant_with_warmup(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    final_ratio: float = 0.05,
    decay_fraction: float = 1.0,
) -> optax.Schedule:
    """Cosine decays over decay_fraction of the run, then holds final_ratio
    (lr_scheduler.py get_cosine_decay_to_constant_with_warmup)."""
    decay_steps = max(int((total_steps - warmup_steps) * decay_fraction), 1)

    def sched(step):
        warm = jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))
        prog = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        factor = jnp.where(prog >= 1.0, final_ratio, cos * (1 - final_ratio) + final_ratio)
        return lr * warm * factor

    return sched


# ---------------------------------------------------------------------------
# CAME (Confidence-guided Adaptive Memory Efficient optimizer)
# ---------------------------------------------------------------------------


class CAMEState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    vr: optax.Updates  # factored row stats (or full v for <2D)
    vc: optax.Updates
    rr: optax.Updates  # factored residual (confidence) stats
    rc: optax.Updates


def came(
    learning_rate,
    betas=(0.9, 0.999, 0.9999),
    eps=(1e-30, 1e-16),
    weight_decay: float = 0.0,
    clip_threshold: float = 1.0,
) -> optax.GradientTransformation:
    """CAME optimizer (Luo et al. 2023), factored over the last two dims.

    Matches came-pytorch semantics used by the reference's CAMEWrapper:
    Adafactor-style factored second moment + confidence-weighted momentum.
    Parameters with <2 dims fall back to full second-moment (Adam-like).
    """
    b1, b2, b3 = betas
    eps1, eps2 = eps

    def factored(shape):
        return len(shape) >= 2

    def init(params):
        def zeros_like_rows(p):
            return jnp.zeros(p.shape[:-1], p.dtype) if factored(p.shape) else jnp.zeros_like(p)

        def zeros_like_cols(p):
            return (
                jnp.zeros(p.shape[:-2] + p.shape[-1:], p.dtype)
                if factored(p.shape)
                else jnp.zeros((), p.dtype)
            )

        return CAMEState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
            vr=jax.tree_util.tree_map(zeros_like_rows, params),
            vc=jax.tree_util.tree_map(zeros_like_cols, params),
            rr=jax.tree_util.tree_map(zeros_like_rows, params),
            rc=jax.tree_util.tree_map(zeros_like_cols, params),
        )

    def _approx(vr, vc):
        # RMS-factored approximation: (vr_i * vc_j) / mean(vr)
        denom = jnp.maximum(vr.mean(axis=-1, keepdims=True), eps1)
        return vr[..., None] * vc[..., None, :] / denom[..., None]

    def update(grads, state, params=None):
        count = state.count + 1

        def upd(g, m, vr, vc, rr, rc, p):
            if factored(g.shape):
                g2 = g * g + eps1
                vr_n = b2 * vr + (1 - b2) * g2.mean(axis=-1)
                vc_n = b2 * vc + (1 - b2) * g2.mean(axis=-2)
                u = g * jax.lax.rsqrt(_approx(vr_n, vc_n))
            else:
                vr_n = b2 * vr + (1 - b2) * (g * g + eps1)
                vc_n = vc
                u = g * jax.lax.rsqrt(vr_n)
            # update clipping by RMS (adafactor convention)
            rms = jnp.sqrt(jnp.mean(u * u) + eps1)
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m_n = b1 * m + (1 - b1) * u
            if factored(g.shape):
                res = (u - m_n) ** 2 + eps2
                rr_n = b3 * rr + (1 - b3) * res.mean(axis=-1)
                rc_n = b3 * rc + (1 - b3) * res.mean(axis=-2)
                out = m_n * jax.lax.rsqrt(_approx(rr_n, rc_n))
            else:
                rr_n, rc_n = rr, rc
                out = m_n
            if params is not None and weight_decay:
                out = out + weight_decay * p
            return -out, m_n, vr_n, vc_n, rr_n, rc_n

        flat = jax.tree_util.tree_map(
            upd, grads, state.m, state.vr, state.vc, state.rr, state.rc,
            params if params is not None else grads,
        )
        # unpack tuples
        def pick(i):
            return jax.tree_util.tree_map(
                lambda t: t[i], flat, is_leaf=lambda t: isinstance(t, tuple) and len(t) == 6
            )

        updates = pick(0)
        new_state = CAMEState(count, pick(1), pick(2), pick(3), pick(4), pick(5))
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
        return updates, new_state

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


class AdamWLowMemState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamw_lowmem(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """AdamW with BOTH moments stored in ``moment_dtype`` (default bf16).

    The HBM-fit knob for single-chip PixArt-XL-2 DMD (VERDICT r2 item 1):
    f32 AdamW for the two-model step needs ~19 GB vs 16 GB/v5e; bf16
    moments halve the optimizer-state footprint. Math runs in f32 (moments
    are upcast per step, updated, then stored back) — the T5X-style
    low-memory Adam convention.
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return AdamWLowMemState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf

        def upd(g, m, v, p):
            g = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g
            step = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
            return (
                (-lr * step).astype(p.dtype),
                m32.astype(moment_dtype),
                v32.astype(moment_dtype),
            )

        out = jax.tree_util.tree_map(upd, grads, state.mu, state.nu, params)
        updates = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, AdamWLowMemState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    name: str = "adamw",
    learning_rate=1e-5,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    grad_clip_norm: Optional[float] = 10.0,  # max_grad_norm 10 (run_pixart_dmd.py:27)
    grad_accum: int = 1,
    moment_dtype=None,  # e.g. jnp.bfloat16: low-memory moments (HBM fit)
) -> optax.GradientTransformation:
    if name == "adamw" and moment_dtype is not None:
        opt = adamw_lowmem(
            learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
            moment_dtype=moment_dtype,
        )
    elif name == "adamw":
        opt = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif name == "lion":
        opt = optax.lion(
            learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
            **({"mu_dtype": moment_dtype} if moment_dtype is not None else {}),
        )
    elif name == "came":
        opt = came(learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(name)
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
