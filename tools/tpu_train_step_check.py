#!/usr/bin/env python
"""Validate differentiable flash attention at production shape on real TPU.

VERDICT r1 item 1 'Done' criterion: a TPU train step at full DiT shape
(512^2 latents -> 64x64x4 = 4096 tokens, PixArt-XL-2 geometry) runs through
the Pallas flash-attention custom_vjp, and its gradients match the XLA
(sdpa) path to <= 1e-3.

Usage (real TPU, default env):  python tools/tpu_train_step_check.py
  --depth 28 runs the full 28-block DMD step (timing);
  --depth 2 (default for the grad comparison) keeps the double grad
  computation affordable while exercising the exact hot shapes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--full_step_depth", type=int, default=28)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.models.pixart import PixArt
    from instarevive_tpu.train.distill import dmd_generator_loss
    from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
    from instarevive_tpu.train.state import TrainState

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    b = args.batch

    # ---- grad parity flash vs XLA at full sequence length ----
    def build(depth):
        return PixArt(
            input_size=64, patch_size=2, hidden_size=1152, depth=depth,
            num_heads=16, caption_channels=4096, model_max_length=300,
        )

    sched = make_schedule("linear", 1000)
    y = jax.random.normal(jax.random.key(9), (b, 300, 4096)) * 0.1
    z = jax.random.normal(jax.random.key(0), (b, 64, 64, 4))
    latent = jax.random.normal(jax.random.key(1), (b, 64, 64, 4)) * 0.2
    batch = {"noise": z, "latent": latent}

    def grad_of(dit):
        init = dit.init(jax.random.key(2), jnp.zeros((1, 64, 64, 4)),
                        jnp.zeros((1,)), y[:1])["params"]

        def gen_fn(p, zz, t, **cond):
            out = dit.apply({"params": p}, zz, t.astype(jnp.float32), cond["y"])
            return out[..., : zz.shape[-1]]

        # teacher params enter as an ARGUMENT — closing over them bakes the
        # whole tree into the lowered program as constants (GBs of compile
        # payload, which the remote compile service rejects)
        def loss(p, teacher_p):
            def real_fn(zz, t, **cond):
                return gen_fn(teacher_p, zz, t, **cond)

            l, _ = dmd_generator_loss(
                sched, gen_fn, real_fn, gen_fn, p, teacher_p, batch,
                jax.random.key(3), cond={"y": y},
            )
            return l

        t0 = time.perf_counter()
        g = jax.jit(jax.grad(loss))(init, init)
        jax.block_until_ready(jax.tree_util.tree_leaves(g))
        print(f"  compile+run: {time.perf_counter() - t0:.1f}s")
        return init, g

    print(f"[grad parity] depth={args.depth}, N=4096 tokens, d=72/head")
    # fair A/B: XLA's DEFAULT f32 matmul on TPU is one-pass bf16, while the
    # Pallas kernels accumulate in true f32 — pin both to f32 for parity
    # (the full-step timing below runs at the production default)
    with jax.default_matmul_precision("highest"):
        os.environ["IR_ATTN_IMPL"] = "flash"
        _, g_flash = grad_of(build(args.depth))
        os.environ["IR_ATTN_IMPL"] = "xla"
        _, g_xla = grad_of(build(args.depth))
        os.environ.pop("IR_ATTN_IMPL")
    fd = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_flash)}
    xd = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_xla)}
    assert set(fd) == set(xd)
    # allclose semantics: |a-b| <= atol + rtol|b| — the atol floor keeps
    # near-zero leaves (tiny bias grads) from inflating a relative metric
    rtol, atol = 1e-3, 1e-5
    worst, worst_k = 0.0, None
    for k in fd:
        a, bb = fd[k].astype(jnp.float32), xd[k].astype(jnp.float32)
        viol = float(((jnp.abs(a - bb) - atol) / (jnp.abs(bb) + atol)).max())
        if viol > worst:
            worst, worst_k = viol, k
    print(f"[grad parity] worst (|d|-atol)/(|xla|+atol) = {worst:.2e} at {worst_k}"
          f"  (threshold rtol={rtol})")
    assert worst <= rtol, f"flash-vs-xla grad mismatch {worst} at {worst_k}"
    print("[grad parity] PASS (rtol<=1e-3, atol=1e-5)")

    if args.skip_full:
        return

    # ---- full-size DMD generator backward (the part that used to crash) --
    # Single-chip note: the two-model DMD optimizer states for PixArt-XL-2
    # at f32 AdamW (~19 GB) exceed one v5e's 16 GB HBM — the reference
    # trains this across 8 accelerators; the multi-chip path is validated
    # by dryrun_multichip's FSDP mesh. What a single chip CAN and MUST do
    # is the production-shape backward through all 28 blocks via the flash
    # custom_vjp (round 1 crashed here), with rematerialization like a real
    # production config.
    dit = PixArt(
        input_size=64, patch_size=2, hidden_size=1152,
        depth=args.full_step_depth, num_heads=16, caption_channels=4096,
        model_max_length=300, grad_checkpoint=True,
    )
    init = dit.init(jax.random.key(4), jnp.zeros((1, 64, 64, 4)),
                    jnp.zeros((1,)), y[:1])["params"]

    def gen_fn(p, zz, t, **cond):
        out = dit.apply({"params": p}, zz, t.astype(jnp.float32), cond["y"])
        return out[..., : zz.shape[-1]]

    def loss(p, teacher_p):  # teacher as argument (no giant constants)
        def real_fn(zz, t, **cond):
            return gen_fn(teacher_p, zz, t, **cond)

        l, _ = dmd_generator_loss(
            sched, gen_fn, real_fn, gen_fn, p, teacher_p, batch,
            jax.random.key(5), cond={"y": y},
        )
        return l

    gfn = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    l, g = gfn(init, init)
    jax.block_until_ready(jax.tree_util.tree_leaves(g))
    print(f"[full bwd] depth={args.full_step_depth} compile+grad: "
          f"{time.perf_counter() - t0:.1f}s  loss={float(l):.4f}")
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = gfn(init, init)
    jax.block_until_ready(jax.tree_util.tree_leaves(g))
    dt = (time.perf_counter() - t0) / iters
    print(f"[full bwd] steady-state: {dt * 1e3:.1f} ms/grad-step (batch {b}, "
          f"PixArt-XL-2 DMD generator loss, remat on)")
    assert bool(jnp.isfinite(l))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g))
    print("[full bwd] PASS (finite loss + grads)")


if __name__ == "__main__":
    main()
