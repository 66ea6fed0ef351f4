#!/usr/bin/env python
"""Bench VAE decode variants on TPU: baseline vs fused-upsample conv
(IR_FUSED_UPSAMPLE) vs fused GN kernels (IR_FUSED_KERNELS), batch 1 and 4.

Each variant runs in a fresh subprocess (the flags are read at import/trace
time). Timings are coarse (>100 ms per measured loop) to stay trustworthy
through the axon tunnel (BENCH.md caveats).

Usage: python tools/bench_decode_variants.py            # run all variants
       _IR_DECODE_VARIANT=... internal single-variant mode
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

VARIANTS = {
    "baseline": {},
    "fused_upsample": {"IR_FUSED_UPSAMPLE": "1"},
    "fused_gn": {"IR_FUSED_KERNELS": "1"},
    "fused_both": {"IR_FUSED_UPSAMPLE": "1", "IR_FUSED_KERNELS": "1"},
}


def run_variant(batch: int) -> None:
    import time

    import jax
    import jax.numpy as jnp

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    params = vae.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    z = jax.random.normal(jax.random.key(1), (batch, 64, 64, 4))

    dec = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
    out = dec(params, z)
    jax.block_until_ready(out)
    iters = 20 if batch == 1 else 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dec(params, z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"variant": os.environ.get("_IR_DECODE_VARIANT"),
                      "batch": batch, "ms_per_iter": round(dt, 2)}))


def main():
    if os.environ.get("_IR_DECODE_VARIANT"):
        run_variant(int(os.environ.get("_IR_DECODE_BATCH", "1")))
        return
    for name, flags in VARIANTS.items():
        for batch in (1, 4):
            env = dict(os.environ)
            env.update(flags)
            env["_IR_DECODE_VARIANT"] = name
            env["_IR_DECODE_BATCH"] = str(batch)
            subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, cwd=HERE)


if __name__ == "__main__":
    main()
