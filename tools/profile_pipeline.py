#!/usr/bin/env python
"""Per-stage device timing of the restoration pipeline (perf triage).

    python tools/profile_pipeline.py [--config configs/instarevive_v1.yaml]
        [--size 512] [--batch 1] [--bf16] [--trace /tmp/jax-trace]
"""

from __future__ import annotations

import argparse
import os
import json
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params
    from instarevive_tpu.utils.profiling import pipeline_stage_times, trace

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = load_config(args.config)
    pipe = build_pipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    params = init_params(pipe, 0)

    lq = jnp.full((args.batch, args.size, args.size, 3), 0.5, jnp.float32)
    y = jnp.zeros((args.batch, pipe.dit.model_max_length, pipe.dit.caption_channels),
                  jnp.float32)

    times = pipeline_stage_times(pipe, params, lq, y, iters=args.iters)
    mp = args.batch * args.size**2 / 1e6
    report = {k: round(v * 1e3, 2) for k, v in times.items()}
    report["MP_per_s_full"] = round(mp / times["full_pipeline"], 3)
    print(json.dumps(report, indent=2))

    if args.trace:
        full = jax.jit(lambda p, x, yy: pipe.process(p, x, yy))
        with trace(args.trace):
            jax.block_until_ready(full(params, lq, y))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
