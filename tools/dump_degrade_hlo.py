"""Dump the TPU-optimized HLO of the train loop's degradation program.

Usage (TPU env): python tools/dump_degrade_hlo.py [out.txt] [--batch 2 --size 512]
Maps trace_ops fusion names (fusion.N / while.N) back to source ops via the
metadata lines in the optimized module text.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="/tmp/degrade_hlo.txt")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    import jax
    import jax.numpy as jnp

    from instarevive_tpu.data.realesrgan import (
        RealESRGANDegradationConfig,
        degrade_batch,
    )

    cfg = RealESRGANDegradationConfig()
    fn = jax.jit(lambda k, x: degrade_batch(k, x, cfg))
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    compiled = fn.lower(key, x).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    try:
        print("cost analysis:", {k: v for k, v in compiled.cost_analysis().items()
                                  if k in ("flops", "bytes accessed")})
    except Exception as e:  # noqa: BLE001
        print("cost analysis unavailable:", e)


if __name__ == "__main__":
    main()
