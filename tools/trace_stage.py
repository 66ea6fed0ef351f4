#!/usr/bin/env python
"""Capture + parse a device trace of one pipeline stage.

    python tools/trace_stage.py dit 1      # stage, batch
    python tools/trace_stage.py decode 2
"""

from __future__ import annotations

import sys

import os
sys_path_dir = os.path.dirname(os.path.abspath(__file__))
import sys as _sys
_sys.path.insert(0, sys_path_dir)
from trace_decode import parse  # same parser


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "dit"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config("configs/instarevive_v1.yaml")
    pipe = build_pipeline(cfg, dtype=jnp.bfloat16)
    params = init_params(pipe, 0)
    rng = jax.random.key(0)

    if stage == "dit":
        z = jax.random.normal(rng, (batch, 64, 64, 4)) * 0.2
        y = jnp.zeros((batch, 300, 4096))
        fn = jax.jit(lambda p, z, y: pipe.one_step(p, z, y))
        args = (params, z, y)
    elif stage == "decode":
        z = jax.random.normal(rng, (batch, 64, 64, 4)) * 0.2
        fn = jax.jit(lambda p, z: pipe.decode(p, z))
        args = (params, z)
    elif stage == "swinir":
        x = jnp.full((batch, 512, 512, 3), 0.5)
        fn = jax.jit(lambda p, x: pipe.clean(p, x))
        args = (params, x)
    elif stage == "full":
        x = jnp.full((batch, 512, 512, 3), 0.5)
        y = jnp.zeros((batch, 300, 4096))
        fn = jax.jit(lambda p, x, y: pipe.process(p, x, y))
        args = (params, x, y)
    else:
        raise SystemExit(f"unknown stage {stage}")

    out = fn(*args)
    jax.block_until_ready(out)
    out_dir = f"/tmp/trace_{stage}_b{batch}"
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    parse(out_dir, top=30)


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    main()
