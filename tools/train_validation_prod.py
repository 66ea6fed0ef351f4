#!/usr/bin/env python
"""Production-geometry distillation quality validation (TRAINVAL stage B
at 512^2): train an XL-2-width teacher eps-model at the production latent
geometry (64x64x4 latents == 512^2 pixels through the f8 VAE), DMD-distill
it into the one-step generator with the REAL production step function
(train/distill.make_dmd_train_step — the same math train.py --task dmd
runs), and measure the 1-step generator closing the gap to the teacher's
20-step DPM-Solver++ on held-out noise.

This is the 64^2-toy TRAINVAL stage-B table reproduced at production
geometry (reference eval pattern: diffusion/cldm.py:835-856 stepped eval +
evaluate_img.py; DMD recipe: scripts/run_pixart_dmd.py:68-104). Zero
egress: the teacher is trained HERE on a procedural latent distribution
(stage A), standing in for the pretrained PixArt teacher. Metrics:

  * latent-space PSNR/SSIM of the 1-step generation vs the teacher's
    20-step sample from the SAME held-out noise (init == teacher weights
    vs trained vs EMA) — the direct distillation-gap measure;
  * pixel-space PSNR/SSIM after decoding all rows through the pipeline's
    f8 VAE decoder (shared random weights — a fixed map, so closeness
    through it is meaningful even without the pretrained decoder);
  * NIQE (evaluate_img.py's no-ref metric) with the pristine model fit on
    the teacher's decoded outputs (utils/niqe.fit_pristine_model) — the
    no-ref toolchain exercised end-to-end at 512^2; generator scores
    should approach the teacher's self-score.

Production knobs mirror the measured single-chip recipe (BENCH.md train
table / train.py --task dmd): bf16 compute, remat 'dots' on the DiT
blocks, bf16 optimizer moments + EMA shadow, bf16 frozen teacher, donated
step buffers, teacher params as jit ARGUMENTS (never closed over — the
2.4 GiB constant payload breaks remote compile).

Usage (real chip, default env):   python tools/train_validation_prod.py
CPU smoke of the code path:       ... --tiny   (minutes, small widths)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_latents(key, b, size, ch):
    """Procedural 'VAE latent' distribution in [-1, 1]: low-frequency random
    fields + oriented ramps (the 64^2 toy's distribution, at latent shape).
    Structured enough to be learnable, smooth enough that 20 solver steps
    reproduce it well."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.normal(k1, (b, 4, 4, ch))
    img = jax.image.resize(base, (b, size, size, ch), "bicubic")
    theta = jax.random.uniform(k2, (b, 1, 1)) * jnp.pi
    yy, xx = jnp.meshgrid(
        jnp.linspace(-1, 1, size), jnp.linspace(-1, 1, size), indexing="ij"
    )
    ramp = (jnp.cos(theta) * xx + jnp.sin(theta) * yy)[..., None]
    amp = jax.random.uniform(k3, (b, 1, 1, 1), minval=0.2, maxval=0.8)
    return jnp.tanh(img * 0.5 + amp * ramp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRAINVAL.md", help="markdown to APPEND to")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: shrink widths/steps to minutes")
    ap.add_argument("--teacher_steps", type=int, default=2500)
    ap.add_argument("--dmd_steps", type=int, default=3000)
    ap.add_argument("--teacher_batch", type=int, default=4)
    ap.add_argument("--dmd_batch", type=int, default=2,
                    help="per-chip DMD batch (measured optimum: 2)")
    ap.add_argument("--pairs", type=int, default=64,
                    help="paired (noise, teacher-sample) count for regression")
    ap.add_argument("--held", type=int, default=16, help="held-out eval samples")
    ap.add_argument("--teacher_lr", type=float, default=1e-4)
    ap.add_argument("--dmd_lr", type=float, default=2e-5,
                    help="generator lr (reference recipe is 1e-5 over many "
                         "more steps, scripts/run_pixart_dmd.py:17; 2e-5 "
                         "makes the gap measurable within a 3k-step run)")
    ap.add_argument("--lr_fake_multiplier", type=float, default=5.0,
                    help="fake-score lr multiple (the reference's "
                         "--lr_fake_multiplier flag; a faster fake score "
                         "tracks the generator distribution sooner, so the "
                         "DM gradient turns informative earlier)")
    ap.add_argument("--ema_rate", type=float, default=0.999,
                    help="validation-run EMA (prod 0.9999 barely moves in "
                         "3k steps: 0.9999^3000 = 0.74 weight on init)")
    ap.add_argument("--maxt", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=50,
                    help="steps per lax.scan dispatch (hides relay latency)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plat = jax.default_backend()
    cache = os.path.join(repo, ".jax_cache" if plat != "cpu" else ".jax_cache_cpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from instarevive_tpu.diffusion.dpm_solver import dpm_solver_pp_2m
    from instarevive_tpu.diffusion.one_step import eps_to_x0
    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.models.pixart import PixArt
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.pipelines.restore import VAE_SCALE
    from instarevive_tpu.train.distill import make_dmd_train_step
    from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
    from instarevive_tpu.train.state import TrainState
    from instarevive_tpu.utils.metrics import psnr, ssim
    from instarevive_tpu.utils.niqe import _to_gray_255, fit_pristine_model, niqe
    from instarevive_tpu.diffusion import gaussian as G

    if args.tiny:  # CPU smoke: exercise every code path at toy cost
        dit_kw = dict(input_size=16, patch_size=2, in_channels=4, hidden_size=64,
                      depth=2, num_heads=4, mlp_ratio=2.0, caption_channels=32,
                      model_max_length=8)
        vae_kw = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                      embed_dim=4)
        size, tokens, cap = 16, 8, 32
        args.teacher_steps = min(args.teacher_steps, 200)
        args.dmd_steps = min(args.dmd_steps, 100)
        args.chunk = min(args.chunk, 20)
        args.pairs, args.held = 8, 4
        args.teacher_lr, args.dmd_lr = 2e-3, 2e-4
        block_size = 8  # decoded 32^2 images: shrink NIQE blocks to fit
    else:
        # the shipped production config (configs/instarevive_v1.yaml dit:)
        dit_kw = dict(input_size=64, patch_size=2, in_channels=4,
                      hidden_size=1152, depth=28, num_heads=16, mlp_ratio=4.0,
                      caption_channels=4096, model_max_length=300)
        vae_kw = dict(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                      z_channels=4, embed_dim=4)
        size, tokens, cap = 64, 300, 4096
        block_size = 96  # pyiqa NIQE default at 512^2 decodes

    ch = 4
    b_t, b_d = args.teacher_batch, args.dmd_batch
    sched = make_schedule("linear", 1000)
    # bf16 compute + dots remat: the measured 283 ms/step single-chip recipe
    dit = PixArt(**dit_kw, grad_checkpoint=True, remat_policy="dots",
                 dtype=jnp.bfloat16)
    y_t = jnp.zeros((b_t, tokens, cap), jnp.float32)
    y_d = jnp.zeros((b_d, tokens, cap), jnp.float32)

    def eps_fn(p, x, t, **cond):
        y = cond.get("y")
        if y is None or y.shape[0] != x.shape[0]:
            y = jnp.zeros((x.shape[0], tokens, cap), jnp.float32)
        out = dit.apply({"params": p}, x, t.astype(jnp.float32), y)
        return out[..., :ch].astype(jnp.float32)

    t0_all = time.time()
    init = dit.init(jax.random.key(args.seed), jnp.zeros((1, size, size, ch)),
                    jnp.zeros((1,)), y_t[:1])["params"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(init))
    print(f"[init +{time.time() - t0_all:.0f}s] DiT params: {n_params / 1e6:.1f}M "
          f"(geometry {size}x{size}x{ch} latents == {size * 8}^2 pixels)",
          flush=True)

    lines = [
        "",
        "# Round 5: production-geometry stage B "
        f"(XL-2{' tiny-smoke' if args.tiny else ''}, {size * 8}² via "
        f"{size}×{size}×{ch} latents, real chip)",
        "",
        f"backend: **{plat}**; DiT {dit_kw['hidden_size']}h/"
        f"{dit_kw['depth']}L/{dit_kw['num_heads']}heads patch "
        f"{dit_kw['patch_size']} ({n_params / 1e6:.0f}M params), "
        f"caption tokens {tokens}×{cap}; bf16 compute, remat 'dots', "
        "bf16 moments/EMA/teacher (the measured single-chip recipe). "
        "Teacher trained here on a procedural latent distribution "
        "(zero-egress stand-in for the pretrained PixArt teacher).",
        "",
    ]

    # ---------------- stage A: teacher eps-model at production width -------
    moment = jnp.bfloat16
    tx = build_optimizer("adamw", constant_with_warmup(args.teacher_lr, 200),
                         grad_clip_norm=1.0, moment_dtype=moment)
    # no stage-A EMA: at 0.999 the shadow still carries 0.999^steps of the
    # RANDOM init (8% at 2500 steps — enough to blow up the 20-step solver
    # in short runs); the raw trained params are the teacher.
    tstate = TrainState.create(init, tx, ema=False)

    def teacher_step(state, key):
        kd, kt, kn = jax.random.split(key, 3)
        x0 = synth_latents(kd, b_t, size, ch)
        t = jax.random.randint(kt, (b_t,), 0, sched.num_timesteps)
        noise = jax.random.normal(kn, x0.shape)
        x_t = G.q_sample(sched, x0, t, noise)

        def loss(p):
            return jnp.mean((eps_fn(p, x_t, t, y=y_t) - noise) ** 2)

        l, g = jax.value_and_grad(loss)(state.params)
        return state.apply_gradients(g), l

    def teacher_chunk_fn(state, keys):
        return jax.lax.scan(teacher_step, state, keys)

    teacher_chunk = jax.jit(teacher_chunk_fn, donate_argnums=(0,))

    key = jax.random.key(args.seed + 1)
    curve_a = []
    t0 = time.time()
    n_chunks = max(args.teacher_steps // args.chunk, 1)
    for c in range(n_chunks):
        key, sk = jax.random.split(key)
        tstate, ls = teacher_chunk(tstate, jax.random.split(sk, args.chunk))
        i = (c + 1) * args.chunk - 1
        curve_a.append((i, float(ls[-1])))
        print(f"[A +{time.time() - t0_all:.0f}s] step {i} "
              f"eps_mse={curve_a[-1][1]:.4f}", flush=True)
    dt_a = time.time() - t0
    steps_a = n_chunks * args.chunk
    teacher = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), tstate.params)
    del tstate  # free the stage-A optimizer HBM before stage B

    lines += ["## Stage A — teacher eps-model (DDPM loss, XL-2 width)", "",
              "| step | eps MSE |", "|---|---|"]
    lines += [f"| {i} | {v:.4f} |" for i, v in curve_a[:: max(len(curve_a) // 10, 1)]]
    first_a, last_a = curve_a[0][1], curve_a[-1][1]
    lines += ["", f"loss {first_a:.4f} -> {last_a:.4f} ({steps_a} steps, "
              f"{dt_a:.0f}s, {steps_a / dt_a:.1f} steps/s)", ""]
    assert last_a < first_a * 0.7, "teacher did not train"

    # ---------------- teacher 20-step DPM-Solver++ sampler -----------------
    @jax.jit
    def sample_teacher(teacher_p, noise):
        def t_eps(x, t, **cond):
            return eps_fn(teacher_p, x, t, **cond)

        # clip_denoised: the data distribution is tanh-bounded, so clipping
        # x0 each solver step (the reference's clip_denoised convention)
        # keeps targets in-range even from an imperfect teacher
        return dpm_solver_pp_2m(t_eps, sched, noise, steps=20,
                                clip_denoised=True)

    key, kp = jax.random.split(key)
    n_pb = max(args.pairs // b_t, 1)
    pair_noise = jax.random.normal(kp, (n_pb, b_t, size, size, ch))
    t0 = time.time()
    pair_latent = jnp.stack(
        [sample_teacher(teacher, pair_noise[i]) for i in range(n_pb)])
    pair_latent.block_until_ready()
    print(f"[pairs +{time.time() - t0_all:.0f}s] {n_pb * b_t} teacher pairs "
          f"({time.time() - t0:.0f}s)", flush=True)
    # regroup pairs to the DMD batch size
    pair_noise = pair_noise.reshape(-1, size, size, ch)
    pair_latent = pair_latent.reshape(-1, size, size, ch)
    n_pd = pair_noise.shape[0] // b_d
    pair_noise = pair_noise[: n_pd * b_d].reshape(n_pd, b_d, size, size, ch)
    pair_latent = pair_latent[: n_pd * b_d].reshape(n_pd, b_d, size, size, ch)

    # ---------------- stage B: DMD with the production step ----------------
    # cfg_scale 1.0: conditioning is a zero embedding on both branches here,
    # so CFG 3 would return the identical eps at 2x teacher cost (the real
    # run trains --cfg 3 with the cached null embed — r4 TRAINVAL section).
    gen_tx = build_optimizer("adamw", constant_with_warmup(args.dmd_lr, 100),
                             grad_clip_norm=10.0, moment_dtype=moment)
    fake_tx = build_optimizer(
        "adamw",
        constant_with_warmup(args.dmd_lr * args.lr_fake_multiplier, 100),
        grad_clip_norm=10.0, moment_dtype=moment)
    f32 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), t)
    gen_state = TrainState.create(f32(teacher), gen_tx, ema=True,
                                  ema_rate=args.ema_rate, ema_dtype=jnp.bfloat16)
    fake_state = TrainState.create(f32(teacher), fake_tx, ema=False)

    def dmd_step_fn(gen_state, fake_state, teacher_p, batch, k):
        def teacher_fn(z, t, **c):
            return eps_fn(teacher_p, z, t, **c)

        step = make_dmd_train_step(sched, eps_fn, teacher_fn, eps_fn,
                                   TrainState, maxt=args.maxt,
                                   regression_weight=0.25)
        return step(gen_state, fake_state, batch, k, {"y": y_d})

    # ONE step per dispatch, exactly train.py's production shape. Wrapping
    # the two XL-2 states in a lax.scan carry instead OOMs the chip: XLA
    # inserts carry copies at the loop boundary (20.25M f32 weight
    # copy-starts in the HBM dump) that double-buffer part of the ~12 GiB
    # state — measured 17.52G > 15.75G at compile. Donate both states (r4:
    # un-donated states double-buffer ~9.7 GiB); teacher rides as an
    # argument, never a constant.
    dmd_step = jax.jit(dmd_step_fn, donate_argnums=(0, 1))

    curve_b = []
    t0 = time.time()
    pending = None  # fetch metrics one chunk late: never blocks the chip
    for i in range(args.dmd_steps):
        key, sk = jax.random.split(key)
        j = i % n_pd
        batch = {"noise": pair_noise[j], "latent": pair_latent[j]}
        gen_state, fake_state, m = dmd_step(
            gen_state, fake_state, teacher, batch, sk)
        if (i + 1) % args.chunk == 0:
            if pending is not None:
                pi, pm = pending
                curve_b.append((pi, float(pm["regression"]), float(pm["dm"]),
                                float(pm["fake_score"])))
                print(f"[B +{time.time() - t0_all:.0f}s] step {pi} "
                      f"reg={curve_b[-1][1]:.4f} dm={curve_b[-1][2]:.4f} "
                      f"fake={curve_b[-1][3]:.4f}", flush=True)
            pending = (i, m)
    if pending is not None:
        pi, pm = pending
        curve_b.append((pi, float(pm["regression"]), float(pm["dm"]),
                        float(pm["fake_score"])))
        print(f"[B +{time.time() - t0_all:.0f}s] step {pi} "
              f"reg={curve_b[-1][1]:.4f} dm={curve_b[-1][2]:.4f} "
              f"fake={curve_b[-1][3]:.4f}", flush=True)
    dt_b = time.time() - t0
    steps_b = args.dmd_steps
    del fake_state

    lines += ["## Stage B — DMD distillation (production step: regression "
              "0.25 + DM + fake score, lr "
              f"{args.dmd_lr:g}, maxt {args.maxt})", "",
              "| step | regression | dm | fake_score |", "|---|---|---|---|"]
    lines += [f"| {i} | {r:.4f} | {d:.4f} | {f:.4f} |"
              for i, r, d, f in curve_b[:: max(len(curve_b) // 10, 1)]]
    lines += ["", f"({steps_b} steps, {dt_b:.0f}s, {steps_b / dt_b:.2f} "
              "steps/s wall)", ""]

    # ---------------- eval: held-out noise, 1-step vs teacher 20-step ------
    key, kh = jax.random.split(key)
    held = jax.random.normal(kh, (args.held, size, size, ch))
    n_hb = max(args.held // b_t, 1)
    held_tgt = jnp.concatenate(
        [sample_teacher(teacher, held[i * b_t:(i + 1) * b_t])
         for i in range(n_hb)])
    held = held[: held_tgt.shape[0]]

    @jax.jit
    def onestep(p, noise):
        t = jnp.full((noise.shape[0],), args.maxt, jnp.int32)
        return eps_to_x0(sched, eps_fn(p, noise, t), noise, t)

    # keep only the param trees for eval: dropping the optimizer moments
    # frees ~2.5 GiB so the decode passes below fit beside the generator
    gen_params, gen_ema = gen_state.params, gen_state.ema_params
    del gen_state
    rows = [
        ("init (= teacher weights, 1-step)", f32(teacher)),
        ("trained 1-step (raw params)", gen_params),
        ("trained 1-step (EMA)", f32(gen_ema)),
    ]

    def lat01(z):
        return jnp.clip((z + 1.0) / 2.0, 0.0, 1.0)

    # pixel space: every row decodes through the SAME f8 VAE decoder
    # (random weights — a fixed map; closeness through it is meaningful)
    vae = AutoencoderKL(**vae_kw, dtype=jnp.bfloat16)
    zd = jnp.zeros((1, size, size, ch))
    vparams = vae.init(jax.random.key(args.seed + 7), zd, method=vae.decode)["params"]

    @jax.jit
    def _decode01(z):
        img = vae.apply({"params": vparams}, z / VAE_SCALE, method=vae.decode)
        return jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

    def decode01(z, b=2):
        # chunked decode to host numpy: a single batched 512^2 decode of all
        # held samples allocates ~0.7 GiB/sample of top-layer activations
        # and OOMs beside the generator params (the first full-scale run
        # died exactly here)
        n = (z.shape[0] // b) * b
        return np.concatenate(
            [np.asarray(_decode01(z[i:i + b])) for i in range(0, n, b)])

    tgt01_lat = lat01(held_tgt)
    tgt01_pix = decode01(held_tgt)
    pris = fit_pristine_model(
        [_to_gray_255(np.asarray(im)) for im in tgt01_pix], block_size)
    niqe_teacher = float(np.mean(
        [niqe(np.asarray(im), pris, block_size) for im in tgt01_pix]))

    lines += ["1-step generation vs teacher 20-step DPM-Solver++ on "
              f"{held.shape[0]} held-out noises (latent PSNR/SSIM on the "
              "diffusion tensors; pixel PSNR/SSIM + NIQE after the shared "
              "f8 VAE decode; NIQE pristine model fit on the teacher's "
              f"decoded outputs — teacher self-score {niqe_teacher:.2f}):",
              "",
              "| generator | latent PSNR | latent SSIM | pixel PSNR | "
              "pixel SSIM | NIQE |", "|---|---|---|---|---|---|"]

    results = {}
    for name, p in rows:
        gen = onestep(p, held)
        g_lat, g_pix = lat01(gen), decode01(gen)
        lp = float(psnr(g_lat, tgt01_lat).mean())
        ls = float(ssim(g_lat, tgt01_lat).mean())
        pp = float(psnr(g_pix, tgt01_pix).mean())
        ps = float(ssim(g_pix, tgt01_pix).mean())
        nq = float(np.mean([niqe(np.asarray(im), pris, block_size)
                            for im in g_pix]))
        results[name] = (lp, ls, pp, ps, nq)
        lines += [f"| {name} | {lp:.2f} | {ls:.4f} | {pp:.2f} | {ps:.4f} | "
                  f"{nq:.2f} |"]
        print(f"[eval +{time.time() - t0_all:.0f}s] {name}: latent "
              f"{lp:.2f}/{ls:.4f} pixel {pp:.2f}/{ps:.4f} NIQE {nq:.2f}",
              flush=True)
    lines += ["", f"total wall {time.time() - t0_all:.0f}s", ""]

    init_psnr = results[rows[0][0]][0]
    best = max(results[rows[1][0]][0], results[rows[2][0]][0])
    if args.tiny:
        # the smoke validates the code path, not convergence: early DMD
        # degrades before the fake score has learned the generator
        # distribution (the 64^2 toy needed ~2k steps to cross over)
        print(f"tiny smoke: best {best:.2f} vs init {init_psnr:.2f} latent "
              "PSNR (no assert at smoke scale)")
    else:
        assert best > init_psnr, (
            f"DMD generator did not close the gap: best {best:.2f} vs init "
            f"{init_psnr:.2f} latent PSNR")

    with open(os.path.join(repo, args.out), "a") as f:
        f.write("\n".join(lines))
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
