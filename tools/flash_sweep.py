#!/usr/bin/env python
"""Sweep pallas flash-attention block sizes on the DiT self-attention shape.

Finds the best (FLASH_BLOCK_Q, FLASH_BLOCK_K) for the hot shape
(B*H=16, n=4096, d=72 at 512²) on real TPU. Timing uses ≥100-iteration
device loops (the axon tunnel makes shorter host timings untrustworthy —
see BENCH.md).

    python tools/flash_sweep.py [--scan 256 --reps 5]
"""

from __future__ import annotations

import argparse
import functools
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=256, help="flash calls per jit dispatch")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--bh", type=int, default=16)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--d", type=int, default=72)
    p.add_argument("--blocks_q", default="256,512,1024")
    p.add_argument("--blocks_k", default="512,1024,2048,4096")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # NB: `from instarevive_tpu.ops import attention` yields the FUNCTION
    # re-exported by ops/__init__ (it shadows the submodule attribute);
    # resolve the module through sys.modules instead.
    import instarevive_tpu.ops.attention  # noqa: F401

    attn_mod = sys.modules["instarevive_tpu.ops.attention"]

    key = jax.random.key(0)
    shape = (1, args.bh, args.n, args.d)  # (B, H, N, D)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(key, shape, jnp.bfloat16)
    v = jax.random.normal(key, shape, jnp.bfloat16)

    results = []
    bqs = [int(x) for x in args.blocks_q.split(",")]
    bks = [int(x) for x in args.blocks_k.split(",")]
    for bq, bk in itertools.product(bqs, bks):
        if bq > args.n or bk > args.n:
            continue
        @functools.partial(jax.jit, static_argnums=(3, 4, 5))
        def run(q, k, v, bq, bk, nscan):
            # chain q through the scan so the 8 calls can't be hoisted
            def body(qc, _):
                return attn_mod.flash_attention(qc, k, v, block_q=bq, block_k=bk), None

            out, _ = jax.lax.scan(body, q, None, length=nscan)
            return out

        try:
            out = run(q, k, v, bq, bk, args.scan)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # hard host sync
            reps = args.reps
            qc = out
            t0 = time.perf_counter()
            for _ in range(reps):
                qc = run(qc, k, v, bq, bk, args.scan)  # host-level chain
            _ = float(jnp.sum(qc.astype(jnp.float32)))  # device->host: cannot lie
            dt = (time.perf_counter() - t0) / (reps * args.scan)
            results.append((dt, bq, bk))
            print(f"bq={bq:5d} bk={bk:5d}  {dt*1e6:9.1f} us/call", flush=True)
        except Exception as e:  # VMEM OOM etc.
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}", flush=True)

    if results:
        results.sort()
        best = results[0]
        print(f"\nBEST: bq={best[1]} bk={best[2]}  {best[0]*1e6:.1f} us/call "
              f"(default 512/1024)")


if __name__ == "__main__":
    main()
