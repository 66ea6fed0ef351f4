#!/usr/bin/env python
"""Isolated flash-vs-sdpa A/B on real TPU: forward and grads, self-attn
(4096x4096) and cross-attn (4096x300 masked) at DiT head shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# fair A/B: XLA's DEFAULT f32 matmul on TPU is one-pass bf16, while the
# Pallas kernels accumulate in true f32 — pin both to f32 (3-pass)
jax.config.update("jax_default_matmul_precision", "highest")

from instarevive_tpu.ops.attention import flash_attention, sdpa

def check(name, b, h, nq, nk, d, masked):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, h, nq, d))
    k = jax.random.normal(k2, (b, h, nk, d))
    v = jax.random.normal(k3, (b, h, nk, d))
    mask = None
    if masked:
        mask = jnp.arange(nk)[None, :] < (nk - 50)
        mask = jnp.broadcast_to(mask, (b, nk))

    def lf(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask) ** 2)

    def ls(q, k, v):
        return jnp.sum(sdpa(q, k, v, kv_mask=mask) ** 2)

    of = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv_mask=mask))(q, k, v)
    os_ = jax.jit(lambda q, k, v: sdpa(q, k, v, kv_mask=mask))(q, k, v)
    fwd_err = float(jnp.abs(of - os_).max())
    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(q, k, v)
    gs = jax.jit(jax.grad(ls, argnums=(0, 1, 2)))(q, k, v)
    errs = []
    for a, bb in zip(gf, gs):
        scale = float(jnp.abs(bb).max())
        errs.append(float(jnp.abs(a - bb).max()) / max(scale, 1e-6))
    print(f"[{name}] fwd_maxabs={fwd_err:.2e} grad_rel dq/dk/dv="
          f"{errs[0]:.2e}/{errs[1]:.2e}/{errs[2]:.2e}")

print("backend", jax.default_backend())
check("self 4096", 1, 16, 4096, 4096, 72, False)
check("cross 4096x300", 1, 16, 4096, 300, 72, True)
check("small 1024", 1, 4, 1024, 1024, 72, False)
