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


def pixart_matmul_flops(*, hidden, depth, heads, n_tokens, l_text, mlp_ratio=4.0,
                        caption_channels=4096, patch=2, in_ch=4):
    """Matmul FLOPs of ONE PixArt forward on ONE image (2*M*N*K per matmul).

    Counted: patch embed, t-embedder/t-block, caption MLP, per block
    (qkv, attn scores+values, proj, cross q/kv/attn/proj, MLP), final layer.
    Elementwise/norm FLOPs are excluded (MFU convention).
    """
    d, n, l = hidden, n_tokens, l_text
    f = 0.0
    f += 2 * n * (patch * patch * in_ch) * d              # patch embed conv
    f += 2 * (256 * d + d * d) + 2 * d * (6 * d)          # t_embedder + t_block
    f += 2 * l * (caption_channels * d + d * d)           # caption MLP
    per_block = (
        2 * n * d * (3 * d)                               # qkv
        + 2 * 2 * n * n * d                               # scores + values
        + 2 * n * d * d                                   # proj
        + 2 * n * d * d + 2 * l * d * (2 * d)             # cross q + kv
        + 2 * 2 * n * l * d                               # cross attn
        + 2 * n * d * d                                   # cross proj
        + 2 * 2 * n * d * int(d * mlp_ratio)              # mlp fc1+fc2
    )
    f += depth * per_block
    f += 2 * n * d * (patch * patch * 2 * in_ch)          # final layer
    return f


def _dmd_step_flops(fwd_flops, batch):
    """Matmul FLOPs of one DMD train step (both models, teacher CFG 2B):
    gen fwd+bwd (3F) + teacher CFG fwd (2F) + fake fwd in gloss (1F) +
    fake fwd+bwd in floss (3F) = 9F per image."""
    return 9.0 * fwd_flops * batch


def timed_dmd(args):
    """Full production-scale DMD train step (VERDICT r2 item 1): PixArt-XL-2
    generator + fake score, AdamW (bf16 moments), EMA (bf16), teacher CFG 3,
    remat on, bf16 compute — fits ONE v5e chip; reports ms/step, tokens/s,
    train MFU, HBM; writes BENCH_train.json."""
    import json
    import time

    import jax
    import jax.numpy as jnp

    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.models.pixart import PixArt
    from instarevive_tpu.train.distill import make_cfg_real_fn, make_dmd_train_step
    from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
    from instarevive_tpu.train.state import TrainState
    from instarevive_tpu.parallel.mesh import commit_states, make_mesh

    b = args.batch
    depth = args.full_step_depth
    hidden = args.hidden
    heads = max(1, hidden // 72)
    hw = args.latent_hw
    L = 300  # null-prompt token length (test_scripts/inference.py:256)
    dit = PixArt(
        input_size=hw, patch_size=2, hidden_size=hidden, depth=depth,
        num_heads=heads, caption_channels=4096, model_max_length=L,
        grad_checkpoint=True, remat_policy=args.remat_policy,
        dtype=jnp.bfloat16,
    )
    sched = make_schedule("linear", 1000)
    y = jax.random.normal(jax.random.key(9), (b, L, 4096)) * 0.1
    y_null = jax.random.normal(jax.random.key(10), (L, 4096)) * 0.1

    def raw_fn(p, zz, t, **cond):
        out = dit.apply({"params": p}, zz, t.astype(jnp.float32), cond["y"])
        return out[..., : zz.shape[-1]]

    init = dit.init(jax.random.key(2), jnp.zeros((1, hw, hw, 4)),
                    jnp.zeros((1,)), y[:1])["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(init))
    print(f"[timed dmd] depth={depth} params={n_params/1e6:.1f}M x2 models, "
          f"batch={b}, teacher CFG 3 (2B), bf16 moments+EMA, remat on")

    tx = build_optimizer("adamw", constant_with_warmup(1e-5, 100),
                         grad_clip_norm=10.0, moment_dtype=jnp.bfloat16)
    mesh = make_mesh(data=1, fsdp=1, devices=jax.devices()[:1])
    gen_state = TrainState.create(init, tx, ema=True, ema_dtype=jnp.bfloat16)
    fake_state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, init), tx, ema=False
    )
    gen_state = commit_states(gen_state, mesh)
    fake_state = commit_states(fake_state, mesh)
    # frozen teacher in bf16 (forward-only)
    teacher = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), init)

    def step_fn(gen_state, fake_state, teacher_p, batch, rng, cond):
        def real_raw(zz, t, **c):
            return raw_fn(teacher_p, zz, t, **c)

        real_fn = make_cfg_real_fn(real_raw, y_null, 3.0)
        train_step = make_dmd_train_step(
            sched, raw_fn, real_fn, raw_fn, TrainState, maxt=400
        )
        return train_step(gen_state, fake_state, batch, rng, cond)

    jitted = jax.jit(step_fn, donate_argnums=(0, 1))

    batch = {
        "noise": jax.random.normal(jax.random.key(0), (b, hw, hw, 4)),
        "latent": jax.random.normal(jax.random.key(1), (b, hw, hw, 4)) * 0.2,
    }
    cond = {"y": y}

    t0 = time.perf_counter()
    gen_state, fake_state, metrics = jitted(
        gen_state, fake_state, teacher, batch, jax.random.key(3), cond
    )
    jax.block_until_ready(metrics)
    print(f"[timed dmd] compile+step1: {time.perf_counter() - t0:.1f}s "
          f"metrics={ {k: float(v) for k, v in metrics.items()} }")

    iters = args.iters
    t0 = time.perf_counter()
    for i in range(iters):
        gen_state, fake_state, metrics = jitted(
            gen_state, fake_state, teacher, batch, jax.random.key(4 + i), cond
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters

    n_tokens = (hw // 2) ** 2
    fwd = pixart_matmul_flops(hidden=hidden, depth=depth, heads=heads,
                              n_tokens=n_tokens, l_text=L)
    step_flops = _dmd_step_flops(fwd, b)
    peak = 197e12  # v5e bf16 peak
    mfu = step_flops / dt / peak
    tokens_s = b * n_tokens / dt
    stats = jax.local_devices()[0].memory_stats() or {}
    hbm_gb = stats.get("bytes_in_use", 0) / 2**30
    peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    print(f"[timed dmd] steady-state: {dt*1e3:.1f} ms/step  "
          f"{1.0/dt:.3f} steps/s  {tokens_s:.0f} latent tokens/s  "
          f"MFU={mfu*100:.1f}% (9F counting, v5e 197 TF/s bf16)")
    print(f"[timed dmd] HBM: in_use={hbm_gb:.2f} GiB peak={peak_gb:.2f} GiB")
    assert all(bool(jnp.isfinite(v)) for v in metrics.values()), metrics

    out = {
        "metric": "DMD train step (PixArt-XL-2 x2, 512^2 latents, 1 chip)",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step",
        "batch": b,
        "depth": depth,
        "steps_per_s": round(1.0 / dt, 4),
        "latent_tokens_per_s": round(tokens_s, 1),
        "train_mfu": round(mfu, 4),
        "step_tflops": round(step_flops / 1e12, 2),
        "hbm_peak_gib": round(peak_gb, 2),
        "config": "AdamW bf16 moments, EMA bf16, teacher bf16 CFG3, remat "
                  f"policy={args.remat_policy}, bf16 compute",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_train.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--full_step_depth", type=int, default=28)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip_full", action="store_true")
    ap.add_argument("--hidden", type=int, default=1152)
    ap.add_argument("--remat_policy", default="full", choices=["full", "dots"])
    ap.add_argument("--latent_hw", type=int, default=64)
    ap.add_argument("--timed_dmd", action="store_true",
                    help="full two-model XL-2 DMD train-step benchmark "
                         "(writes BENCH_train.json)")
    args = ap.parse_args()

    if args.timed_dmd:
        import jax

        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(f"backend={jax.default_backend()} devices={jax.devices()}")
        timed_dmd(args)
        return

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
