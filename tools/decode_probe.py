#!/usr/bin/env python
"""VAE-decoder perf probe: scan-amortized single-dispatch timings.

    python tools/decode_probe.py [b1 b2 f32 noattn]
"""

from __future__ import annotations

import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    which = set(sys.argv[1:]) or {"b1", "b2"}
    REPS = 10
    rng = jax.random.key(0)
    cfg = load_config("configs/instarevive_v1.yaml")

    def run(tag, batch, dtype):
        pipe = build_pipeline(cfg, dtype=dtype)
        params = init_params(pipe, 0)
        zs = jax.random.normal(rng, (REPS, batch, 64, 64, 4)) * 0.2

        f = jax.jit(
            lambda p, zs: jax.lax.scan(
                lambda _, z: (0.0, pipe.decode(p, z).sum()), 0.0, zs
            )[1]
        )
        out = f(params, zs)  # compile+warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(params, zs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"decode[{tag}] batch={batch}: {dt*1e3:.2f} ms/call "
              f"({dt/batch*1e3:.2f} ms/img)")

    if "b1" in which:
        run("bf16", 1, jnp.bfloat16)
    if "b2" in which:
        run("bf16", 2, jnp.bfloat16)
    if "f32" in which:
        run("f32", 1, None)
        run("f32", 2, None)


if __name__ == "__main__":
    main()
