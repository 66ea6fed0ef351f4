#!/usr/bin/env python
"""Micro-benchmarks for perf triage on TPU.

    python tools/micro_bench.py conv attn dit vae
"""

from __future__ import annotations

import os
import sys


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.utils.profiling import time_fn

    which = set(sys.argv[1:]) or {"conv", "attn", "dit", "vae"}
    rng = jax.random.key(0)

    REPS = 50  # iterate inside ONE device program: remote-tunnel-proof timing

    def scan_time(apply_fn, x0, *consts):
        f = jax.jit(
            lambda x, *c: jax.lax.scan(lambda carry, _: (apply_fn(carry, *c), None),
                                       x, None, length=REPS)[0]
        )
        t = time_fn(f, x0, *consts, iters=3)
        return t / REPS

    if "conv" in which:
        import flax.linen as nn

        for (res, cin, cout) in [(512, 128, 128), (256, 256, 256), (128, 512, 512), (64, 512, 512)]:
            conv = nn.Conv(cin, (3, 3), padding="SAME", dtype=jnp.bfloat16)  # cin->cin to chain
            x = jax.random.normal(rng, (1, res, res, cin), jnp.bfloat16)
            p = conv.init(rng, x)
            t = scan_time(lambda c, p: conv.apply(p, c) * 1e-3, x, p)
            fl = 2 * res * res * cin * cin * 9
            print(f"conv {res}x{res} {cin}->{cin}: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TF/s")

    if "attn" in which:
        from instarevive_tpu.ops.attention import flash_attention

        for (b, h, n, nk, d) in [(1, 16, 4096, 4096, 72), (1, 1, 4096, 4096, 512),
                                 (1, 16, 4096, 300, 72)]:
            q = jax.random.normal(rng, (b, h, n, d), jnp.bfloat16)
            k = jax.random.normal(rng, (b, h, nk, d), jnp.bfloat16)
            v = jax.random.normal(rng, (b, h, nk, d), jnp.bfloat16)
            t = scan_time(
                lambda c, k, v: flash_attention(c, k, v).astype(jnp.bfloat16) * 1e-3 + c * 0.5,
                q, k, v,
            )
            fl = 4 * b * h * n * nk * d
            print(f"flash {b}x{h}x{n}x{nk}x{d}: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TF/s")

    if "dit" in which:
        from instarevive_tpu.config import load_config
        from instarevive_tpu.pipelines.build import build_pipeline, init_params

        cfg = load_config("configs/instarevive_v1.yaml")
        pipe = build_pipeline(cfg, dtype=jnp.bfloat16)
        params = init_params(pipe, 0)
        z = jax.random.normal(rng, (1, 64, 64, 4))
        y = jnp.zeros((1, 300, 4096))
        one = jax.jit(lambda p, z, y: pipe.one_step(p, z, y))
        t = time_fn(one, params, z, y, iters=10)
        print(f"dit one_step 64x64: {t*1e3:.2f} ms")

    if "vae" in which:
        from instarevive_tpu.config import load_config
        from instarevive_tpu.pipelines.build import build_pipeline, init_params

        cfg = load_config("configs/instarevive_v1.yaml")
        pipe = build_pipeline(cfg, dtype=jnp.bfloat16)
        params = init_params(pipe, 0)
        z = jax.random.normal(rng, (1, 64, 64, 4)) * 0.2
        dec = jax.jit(lambda p, z: pipe.decode(p, z))
        t = time_fn(dec, params, z, iters=10)
        print(f"vae decode 64->512: {t*1e3:.2f} ms")
        # encoder for comparison
        x = jnp.full((1, 512, 512, 3), 0.5)
        enc = jax.jit(lambda p, x: pipe.encode(p, x))
        t = time_fn(enc, params, x, iters=10)
        print(f"vae encode 512->64: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
