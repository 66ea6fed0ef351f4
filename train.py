#!/usr/bin/env python
"""Training launcher: SwinIR stage-1 / ControlLDM / Reflow / DMD distillation.

Replaces the reference's three harnesses (Lightning for SwinIR+cldm,
Accelerate for PixArt/DMD, the ``scripts/run_pixart_dmd.py`` shell launcher)
with one pjit-based loop over a ('data','fsdp') mesh.

    python train.py --task swinir --data /path/hq --out runs/swinir
    python train.py --task dmd    --data /path/hq --out runs/dmd \
        --config configs/instarevive_v1.yaml --batch_size 8 --grad_accum 8

The reference recipe (scripts/run_pixart_dmd.py:17-29,68-96): lr 1e-5
constant, one_step_maxt 400, start_ts 999, cfg 3, regression 0.25,
max_grad_norm 10, ckpt every 5000 steps, bf16.

Measured single-v5e-chip DMD recipe (BENCH.md round-3 batch sweep):
``--task dmd --lowmem --remat_policy dots --batch_size 2 --grad_accum 4``
— per-chip batch 2 is the throughput optimum (41.6% train MFU,
283 ms/step; batch 4 exceeds HBM under the dots policy).
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["swinir", "cldm", "reflow", "dmd"], required=True)
    p.add_argument("--config", default="configs/tiny.yaml")
    p.add_argument("--data", required=True, help="HQ image folder or file list")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=512)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr_fake_multiplier", type=float, default=1.0)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=10.0)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "lion", "came"])
    p.add_argument("--ema_rate", type=float, default=0.9999)
    p.add_argument("--lowmem", action="store_true",
                   help="HBM-fit knobs for single-chip XL-2 DMD: bf16 "
                        "optimizer moments, bf16 EMA shadow, bf16 frozen "
                        "teacher (BENCH.md train table config)")
    p.add_argument("--remat_policy", default=None, choices=["full", "dots"],
                   help="DiT block remat policy for --task dmd (default: "
                        "config value; 'dots' saves matmul outputs — the "
                        "BENCH.md fast-train config)")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--maxt", type=int, default=400)
    p.add_argument("--cfg_scale", type=float, default=3.0)
    p.add_argument("--regression_weight", type=float, default=0.25)
    p.add_argument("--checkpointing_steps", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--degradation", default="realesrgan", choices=["realesrgan", "codeformer"])
    p.add_argument("--t_sampler", default="uniform",
                   choices=["uniform", "loss_second_moment"],
                   help="timestep importance sampler for --task cldm "
                        "(diffusion/timestep_sampler.py; reference "
                        "diffusion/model/timestep_sampler.py:27-120)")
    p.add_argument("--trace_steps", type=int, default=0,
                   help="capture a jax.profiler device-timeline trace of N "
                        "mid-loop steps to <out>/trace (starts at "
                        "--trace_at, after compile/warmup; parse with "
                        "tools/trace_ops.py parse)")
    p.add_argument("--trace_at", type=int, default=10)
    p.add_argument("--queue_size", type=int, default=256)
    p.add_argument("--dmd_noise_dir", default=None,
                   help="paired-noise dir (DMD dataset quadruples) — when set with "
                        "--dmd_latent_dir, regression pairs come from disk instead of "
                        "on-the-fly encoding (diffusion/data/datasets/dmd.py layout)")
    p.add_argument("--dmd_latent_dir", default=None)
    p.add_argument("--dmd_t5_dir", default=None,
                   help="per-sample T5 caption-feature dir (.npz with "
                        "caption_feature) supplying real prompt embeddings for "
                        "the DMD loop instead of the null/zero conditioning")
    p.add_argument("--null_embed", default=None,
                   help="cached T5 null-prompt embedding (.pth/.npy); used as "
                        "the unconditional branch of the teacher's CFG "
                        "(reference scripts/run_pixart_dmd.py --cfg 3)")
    p.add_argument("--context_npz", default=None,
                   help="precomputed text-encoder features for cldm conditioning")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instarevive_tpu.config import load_config
    from instarevive_tpu.data.codeformer import (
        CodeformerDegradationConfig,
        degrade_batch_codeformer,
    )
    from instarevive_tpu.data.dataset import ImageFolderDataset, PrefetchLoader
    from instarevive_tpu.data.realesrgan import RealESRGANDegradationConfig, degrade_batch
    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from instarevive_tpu.pipelines.build import build_pipeline, init_params
    from instarevive_tpu.train import checkpoint as ckpt
    from instarevive_tpu.train.distill import (
        make_cfg_real_fn,
        make_dmd_train_step,
        swinir_loss,
    )
    from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
    from instarevive_tpu.train.state import TrainState
    from instarevive_tpu.utils.debug import SimpleTimer, nan_guard
    from instarevive_tpu.utils.logging import LogBuffer, MetricWriter, get_root_logger

    os.makedirs(args.out, exist_ok=True)
    logger = get_root_logger(os.path.join(args.out, "train.log"))

    # persistent XLA compile cache (per-platform dir so CPU smoke runs and
    # TPU runs don't evict each other); repeated runs start in seconds
    _repo = os.path.dirname(os.path.abspath(__file__))
    _plat = jax.default_backend()
    _cache = os.path.join(_repo, ".jax_cache" if _plat != "cpu" else ".jax_cache_cpu")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    writer = MetricWriter(os.path.join(args.out, "tb"))
    logger.info(f"devices: {jax.devices()}  task: {args.task}")

    cfg = load_config(args.config)
    if args.task == "dmd":
        # remat on the DiT blocks is what makes the XL-2 DMD step fit one
        # chip (BENCH.md train table); 'dots' keeps matmul outputs
        # (checkpoint_policies.dots_with_no_batch_dims_saveable) — measured
        # -7.5% step time vs full remat for ~0.6 GiB extra b1 activations
        dit_cfg = dict(cfg.get("dit", {}) or {})
        dit_cfg.setdefault("grad_checkpoint", True)
        if args.remat_policy is not None:
            dit_cfg["remat_policy"] = args.remat_policy
        cfg = dict(cfg)
        cfg["dit"] = dit_cfg
    # --bf16 = mixed precision: every matmul/conv computes in bf16 while
    # params stay f32 master (the reference trains fp16/bf16 via Accelerate,
    # scripts/run_pixart_dmd.py:110-113; the measured 283 ms/step DMD recipe
    # is bf16 compute — f32 compute does not fit bs2 on one chip)
    pipe = build_pipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    mesh = make_mesh(fsdp=args.fsdp)
    # cldm/reflow bring their own UNet denoiser — don't pay the DiT init
    needed = ("swinir", "vae") if args.task in ("cldm", "reflow") else None
    params = init_params(pipe, seed=args.seed, components=needed)
    logger.info("params initialized")

    ds = ImageFolderDataset(args.data, out_size=args.crop_size, crop_type="random", seed=args.seed)
    loader = PrefetchLoader(ds, args.batch_size, seed=args.seed)
    deg_cfg = (
        RealESRGANDegradationConfig()
        if args.degradation == "realesrgan"
        else CodeformerDegradationConfig()
    )
    degrade = degrade_batch if args.degradation == "realesrgan" else degrade_batch_codeformer
    degrade_jit = jax.jit(lambda k, x: degrade(k, x, deg_cfg))

    moment_dtype = jnp.bfloat16 if args.lowmem else None
    tx = build_optimizer(
        args.optimizer, constant_with_warmup(args.lr, args.warmup),
        grad_clip_norm=args.max_grad_norm, grad_accum=args.grad_accum,
        moment_dtype=moment_dtype,
    )

    sched = pipe.sched
    key = jax.random.key(args.seed)
    buf = LogBuffer()
    timer = SimpleTimer(args.steps, log_interval=args.log_every)

    with mesh:
        if args.task == "swinir":
            state = TrainState.create(shard_params(params["swinir"], mesh), tx,
                                      ema=True, ema_rate=args.ema_rate)

            @jax.jit
            def step(state, batch, key):
                def loss_fn(p):
                    return swinir_loss(pipe.swinir, p, batch)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                new_state = nan_guard(state.apply_gradients, state, grads)
                return new_state, {"loss": loss}

            def run_step(state_tuple, batch, key):
                (state,) = state_tuple
                hq01 = (batch["hq"] + 1.0) / 2.0
                state, m = step(state, {"hq": hq01, "lq": batch["lq"]}, key)
                return (state,), m

            states = (state,)
            del state  # see dmd branch: stale locals pin device buffers across --resume
        elif args.task == "dmd":
            y = jnp.zeros(
                (args.batch_size, pipe.dit.model_max_length, pipe.dit.caption_channels)
            )

            def gen_fn(p, z, t, **cond):
                out = pipe.dit.apply({"params": p}, z, t.astype(jnp.float32), cond["y"])
                return out[..., : z.shape[-1]]

            teacher = jax.tree_util.tree_map(
                (lambda x: x.astype(jnp.bfloat16)) if args.lowmem else jnp.copy,
                params["dit"],
            )

            # Teacher CFG (reference trains with --cfg 3 on the real score,
            # scripts/run_pixart_dmd.py:95): uncond branch = cached null-prompt
            # T5 embedding. Without --null_embed we fall back to zeros, which
            # matches the CaptionEmbedder's uncond drop only if the checkpoint's
            # y_embedding is zero — pass --null_embed for faithful guidance.
            if args.null_embed:
                y_null = jnp.asarray(ckpt.load_null_embed(args.null_embed))
            else:
                y_null = jnp.zeros(
                    (pipe.dit.model_max_length, pipe.dit.caption_channels)
                )
                if args.cfg_scale != 1.0:
                    logger.warning(
                        "cfg_scale=%.1f with no --null_embed: using a zero "
                        "uncond embedding", args.cfg_scale)

            gen_state = TrainState.create(
                shard_params(params["dit"], mesh), tx, ema=True,
                ema_rate=args.ema_rate,
                ema_dtype=jnp.bfloat16 if args.lowmem else None,
            )
            fake_tx = build_optimizer(
                args.optimizer,
                constant_with_warmup(args.lr * args.lr_fake_multiplier, args.warmup),
                grad_clip_norm=args.max_grad_norm, grad_accum=args.grad_accum,
                moment_dtype=moment_dtype,
            )
            fake_state = TrainState.create(
                shard_params(jax.tree_util.tree_map(jnp.copy, params["dit"]), mesh),
                fake_tx, ema=False,
            )
            # teacher params enter the jitted step as an ARGUMENT: closing
            # over them would bake the whole 0.6B tree into the lowered
            # program as constants (GB-scale compile payloads)
            def _dmd_step_fn(gen_state, fake_state, dmd_batch, k, cond, teacher_p):
                def teacher_fn(z, t, **c):
                    return gen_fn(teacher_p, z, t, **c)

                real_fn = make_cfg_real_fn(teacher_fn, y_null, args.cfg_scale)
                step = make_dmd_train_step(
                    sched, gen_fn, real_fn, gen_fn, TrainState, maxt=args.maxt,
                    regression_weight=args.regression_weight,
                )
                return step(gen_state, fake_state, dmd_batch, k, cond)

            # donate BOTH train states: without donation XLA double-buffers
            # input+output state (~9.7 GiB for the two XL-2 states) and the
            # bs2 512^2 step OOMs on one chip — the measured 283 ms/step
            # recipe (tools/tpu_train_step_check.py:125) always donated.
            dmd_step = jax.jit(_dmd_step_fn, donate_argnums=(0, 1))
            # encode needs only the VAE subtree; keeping the full init tree
            # alive would hold a stale f32 DiT copy (~2.5 GiB) on device
            vae_params = {"vae": params["vae"]}
            enc_jit = jax.jit(lambda p, img01: pipe.encode(p, img01))
            del params["dit"]
            params.pop("swinir", None)

            pair_loader = None
            pair_prefetch = None
            if args.dmd_noise_dir and args.dmd_latent_dir:
                from instarevive_tpu.data.internal import DMDPairDataset

                pair_ds = DMDPairDataset(
                    args.dmd_noise_dir, args.dmd_latent_dir, t5_dir=args.dmd_t5_dir
                )
                pair_prefetch = PrefetchLoader(pair_ds, args.batch_size, seed=args.seed)

                def _cycle(ld):  # epochs cycle forever (loader = one epoch)
                    while True:
                        yield from ld

                pair_loader = _cycle(pair_prefetch)

            def _fit_tokens(fea):
                """(B,[1,]L,C) caption features -> (B, model_max_length, C)."""
                fea = jnp.asarray(fea)
                if fea.ndim == 4:
                    fea = fea[:, 0]
                L = pipe.dit.model_max_length
                if fea.shape[1] < L:
                    fea = jnp.pad(fea, ((0, 0), (0, L - fea.shape[1]), (0, 0)))
                return fea[:, :L]

            def run_step(states, batch, key):
                gen_state, fake_state = states
                k1, k2 = jax.random.split(key)
                y_step = y
                if pair_loader is not None:
                    pair = next(pair_loader)
                    dmd_batch = {
                        "noise": jnp.asarray(pair["noise"]),
                        "latent": jnp.asarray(pair["latent"]),
                    }
                    if "txt_fea" in pair:  # real prompt embeds from --dmd_t5_dir
                        y_step = _fit_tokens(pair["txt_fea"])
                else:
                    latent = enc_jit(vae_params, (batch["hq"] + 1.0) / 2.0)
                    noise = jax.random.normal(k1, latent.shape)
                    dmd_batch = {"noise": noise, "latent": latent}
                gen_state, fake_state, m = dmd_step(
                    gen_state, fake_state, dmd_batch, k2, {"y": y_step}, teacher
                )
                return (gen_state, fake_state), m

            states = (gen_state, fake_state)
            # the tuple owns the states now — stale locals would keep the
            # fresh device buffers (~11.4 GiB at XL-2) alive through a
            # --resume restore, doubling state HBM and OOMing commit_states
            del gen_state, fake_state
        else:  # cldm | reflow: the LDM/ControlNet stack (configs/cldm.yaml)
            import optax

            from instarevive_tpu.models.unet import UNetBackbone
            from instarevive_tpu.train.cldm import ControlLDMTask

            unet = UNetBackbone(**{k: tuple(v) if isinstance(v, list) else v
                                   for k, v in cfg["unet"].items()})
            cnet = UNetBackbone(**{k: tuple(v) if isinstance(v, list) else v
                                   for k, v in cfg["controlnet"].items()})
            task = ControlLDMTask(unet, cnet, pipe.vae, pipe.swinir, sched,
                                  sd_locked=bool(cfg.get("sd_locked", False)))
            ctx_dim = int(cfg["unet"].get("context_dim", 1024))
            if args.context_npz:
                # precomputed text-encoder features (CLIP/OpenCLIP/T5 —
                # models/clip.py / models/t5.py produce these); the cldm
                # reference conditions on a fixed empty prompt ("txt": "")
                feat = np.load(args.context_npz)
                feat = feat[feat.files[0]] if hasattr(feat, "files") else feat
                feat = np.asarray(feat, np.float32)
                if feat.ndim == 2:
                    feat = feat[None]
                ctx = jnp.asarray(np.repeat(feat[:1], args.batch_size, axis=0))
            else:
                ctx = jnp.zeros((args.batch_size, 4, ctx_dim))
            lat = args.crop_size // pipe.latent_factor
            k0 = jax.random.key(args.seed)
            cldm_params = {
                "unet": unet.init(k0, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,)),
                                  ctx[:1])["params"],
                "controlnet": cnet.init(k0, jnp.zeros((1, lat, lat, 8)), jnp.zeros((1,)),
                                        ctx[:1])["params"],
            }
            frozen = {"vae": params["vae"], "swinir": params["swinir"]}

            def trainable(path_key: str) -> bool:
                # reference trains controlnet (+ UNet decoder when not
                # sd_locked, cldm.py:411-418); encoder/time_embed frozen
                if path_key == "controlnet":
                    return True
                return not task.sd_locked

            def unet_leaf_trainable(path):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                if top != "unet":
                    return top == "controlnet"
                if task.sd_locked:
                    return False
                sub = path[1].key if hasattr(path[1], "key") else str(path[1])
                return sub.startswith(("out_", "up_"))

            mask = jax.tree_util.tree_map_with_path(
                lambda p, _: unet_leaf_trainable(p), cldm_params
            )
            tx_masked = optax.masked(tx, mask)
            state = TrainState.create(shard_params(cldm_params, mesh), tx_masked,
                                      ema=True, ema_rate=args.ema_rate)
            loss_fn = task.reflow_loss if args.task == "reflow" else task.eps_loss

            # loss-second-moment importance sampling of t (eps-loss only):
            # sampler state rides the step as an explicit carry so the whole
            # thing stays one jitted pure function.
            use_lsm = args.t_sampler == "loss_second_moment" and args.task == "cldm"
            from instarevive_tpu.diffusion.timestep_sampler import (
                loss_second_moment_init, loss_second_moment_sample,
                loss_second_moment_update)

            ts0 = loss_second_moment_init(task.sched.num_timesteps) if use_lsm else None
            if ts0 is not None:
                # commit replicated now: an uncommitted carry would come back
                # committed after step 1 and force a second step compile
                ts0 = jax.device_put(
                    ts0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
                )

            @jax.jit
            def step(state, ts_state, batch, key, frozen_p):
                # frozen vae/swinir params as arguments, not lowered constants
                t_key, l_key = jax.random.split(key)
                if use_lsm:  # trace-time constant
                    t, w = loss_second_moment_sample(
                        t_key, ts_state, batch["hq"].shape[0])

                    def lf(p):
                        return loss_fn(p, frozen_p, batch, l_key,
                                       t=t, loss_weights=w)
                else:
                    def lf(p):
                        return loss_fn(p, frozen_p, batch, l_key)

                (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
                if use_lsm:
                    ts_state = loss_second_moment_update(
                        ts_state, metrics["t"], metrics["per_sample_loss"])
                return nan_guard(state.apply_gradients, state, grads), ts_state, metrics

            def run_step(state_tuple, batch, key):
                state, ts_state = state_tuple
                cldm_batch = {"hq": batch["hq"], "lq": batch["lq"], "context": ctx}
                state, ts_state, m = step(state, ts_state, cldm_batch, key, frozen)
                return (state, ts_state), m

            states = (state, ts0)
            del state  # see dmd branch: stale locals pin device buffers across --resume

        step_i = 0
        if args.resume:
            # Full train-state resume (reference diffusion/utils/checkpoint.py:
            # 40-85 restores optimizer/scheduler/epoch; the DMD side saves both
            # models, scripts/DMD/transformer_train/utils.py:39-158): params,
            # EMA, optimizer moments, fake-score state, LSM carry, RNG key and
            # step all round-trip. Legacy params/EMA-only checkpoints still load.
            states, key, step_i = ckpt.restore_train_state(args.resume, states, key)
            if step_i:
                loader.fast_forward(step_i)
                if args.task == "dmd" and pair_prefetch is not None:
                    pair_prefetch.fast_forward(step_i)
            logger.info(f"resumed full train state from {args.resume} at step {step_i}")
        # one canonical step signature for fresh, resumed (host numpy) and
        # looped states: strong dtypes, FSDP tensors, replicated scalars —
        # otherwise each entry path pays its own multi-minute recompile
        from instarevive_tpu.parallel.mesh import commit_states

        states = tuple(
            commit_states(s, mesh) if hasattr(s, "opt_state") else s for s in states
        )
        if step_i:  # resumed: progress display shows absolute steps
            timer = SimpleTimer(args.steps, log_interval=args.log_every,
                                initial=step_i)
        logger.info("train state ready; entering loop")
        # one-step-delayed metrics fetch: materializing step i's scalars
        # immediately blocks the host on device completion, serializing the
        # whole data path (JPEG decode + degrade/encode dispatches) against
        # the chip — measured 630 ms/step wall for a 283 ms device step.
        # Fetching step i-1's metrics AFTER dispatching step i keeps the
        # device queue fed (<= 2 steps in flight) while the host prepares
        # the next batch.
        pending_metrics = None
        trace_stop_at = None
        while step_i < args.steps:
            for batch in loader:
                if step_i >= args.steps:
                    break
                if args.trace_steps and step_i == args.trace_at:
                    # drain in-flight work so the trace window is exactly
                    # the steady-state loop (not a prior step's tail)
                    jax.block_until_ready(jax.tree_util.tree_leaves(states))
                    jax.profiler.start_trace(os.path.join(args.out, "trace"))
                    trace_stop_at = args.trace_at + args.trace_steps
                    logger.info(f"trace started at step {step_i} "
                                f"({args.trace_steps} steps)")
                key, dk, sk = jax.random.split(key, 3)
                hq01 = jnp.asarray(batch["hq"], jnp.float32) / 255.0
                data = degrade_jit(dk, shard_batch(hq01, mesh))
                if step_i == 0:
                    jax.block_until_ready(jax.tree_util.tree_leaves(data))
                    logger.info("degradation program compiled")
                try:
                    states, step_metrics = run_step(states, data, sk)
                    # fetch the PREVIOUS step's scalars (device almost
                    # certainly done with it) inside the recovery scope so
                    # async device errors (OOM etc.) surface here
                    metrics, pending_metrics = (
                        {k: float(v) for k, v in pending_metrics.items()
                         if getattr(v, "ndim", 0) == 0}
                        if pending_metrics is not None else None,
                        step_metrics,
                    )
                except Exception:
                    # crash recovery (SURVEY §5 failure detection): dump an
                    # emergency full-state checkpoint before propagating.
                    # Best-effort: with donated step buffers (dmd) the
                    # pre-step state may already be invalidated.
                    try:
                        ckpt.save_train_state(
                            os.path.join(args.out, f"crash_step_{step_i}"),
                            states, key, step_i,
                        )
                        logger.exception(
                            f"step {step_i} failed; emergency checkpoint saved")
                    except Exception:
                        logger.exception(
                            f"step {step_i} failed; emergency checkpoint "
                            "unavailable (donated buffers)")
                    raise
                if metrics is not None:
                    buf.update(metrics)
                step_i += 1
                if trace_stop_at is not None and step_i >= trace_stop_at:
                    jax.block_until_ready(jax.tree_util.tree_leaves(states))
                    jax.profiler.stop_trace()
                    trace_stop_at = None
                    logger.info(
                        f"trace stopped at step {step_i}; parse with "
                        f"tools/trace_ops.py parse {args.out}/trace")
                msg = timer.update()
                if msg:
                    avg = buf.average()
                    logger.info(f"{msg}  {avg}")
                    writer.scalars(step_i, avg)
                if step_i % args.checkpointing_steps == 0:
                    ckpt.save_train_state(
                        os.path.join(args.out, f"step_{step_i}"), states, key, step_i
                    )
                    logger.info(f"checkpoint at step {step_i}")

        if pending_metrics is not None:  # drain the delayed fetch
            buf.update({k: float(v) for k, v in pending_metrics.items()
                        if getattr(v, "ndim", 0) == 0})
        if step_i % args.checkpointing_steps == 0 and step_i:
            # the loop just wrote step_<N> with identical contents — don't
            # pay a second multi-GiB save (8.5 GiB / ~7 min at XL-2 scale)
            logger.info(f"final state already checkpointed at step_{step_i}")
        else:
            ckpt.save_train_state(os.path.join(args.out, "final"), states, key, step_i)
        writer.flush()
        logger.info("done")


if __name__ == "__main__":
    main()
