#!/usr/bin/env python
"""Sweep pallas flash-attention block sizes on real TPU.

Two modes:
  * single-shape (default): best (block_q, block_k) for one shape.
  * ``--table``: sweep the framework's hot attention shapes (DiT self/cross
    at full-image and tile sizes) and persist the winners to
    ``instarevive_tpu/ops/flash_blocks.json`` — the per-shape table
    ``ops/attention.py`` consults at call time (VERDICT r2 item 6).
    FLASH_BLOCK_Q/K env vars still override everything.

Timing uses >=100-call device scan loops (the axon tunnel makes shorter
host timings untrustworthy — see BENCH.md).

    python tools/flash_sweep.py --table
"""

from __future__ import annotations

import argparse
import functools
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hot shapes: (label, BH, nq, nk, d).
# DiT XL-2 at 512^2: latent 64^2, patch 2 -> 1024 tokens; the 4096-token row
# covers 1024^2 non-tiled / patch-1 style use. Cross-attn keys = 300-token
# null prompt (padded to 384).
TABLE_SHAPES = [
    ("dit-self-1k", 16, 1024, 1024, 72),
    ("dit-self-4k", 16, 4096, 4096, 72),
    ("dit-cross-1k", 16, 1024, 384, 72),
    ("dit-cross-4k", 16, 4096, 384, 72),
]


def sweep_shape(attn_mod, jax, jnp, bh, nq, nk, d, bqs, bks, scan, reps):
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, bh, nq, d), jnp.bfloat16)
    k = jax.random.normal(key, (1, bh, nk, d), jnp.bfloat16)
    v = jax.random.normal(key, (1, bh, nk, d), jnp.bfloat16)

    def round_up(x, m):
        return -(-x // m) * m

    results = []
    for bq, bk in itertools.product(bqs, bks):
        if bq > round_up(nq, 128) or bk > round_up(nk, 128):
            continue

        @functools.partial(jax.jit, static_argnums=(3, 4, 5))
        def run(q, k, v, bq, bk, nscan):
            def body(qc, _):
                return attn_mod.flash_attention(qc, k, v, block_q=bq, block_k=bk), None

            out, _ = jax.lax.scan(body, q, None, length=nscan)
            return out

        try:
            out = run(q, k, v, bq, bk, scan)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # hard host sync
            qc = out
            t0 = time.perf_counter()
            for _ in range(reps):
                qc = run(qc, k, v, bq, bk, scan)  # host-level chain
            _ = float(jnp.sum(qc.astype(jnp.float32)))  # device->host: cannot lie
            dt = (time.perf_counter() - t0) / (reps * scan)
            results.append((dt, bq, bk))
            print(f"  bq={bq:5d} bk={bk:5d}  {dt*1e6:9.1f} us/call", flush=True)
        except Exception as e:  # VMEM OOM etc.
            print(f"  bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}", flush=True)
    results.sort()
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=256, help="flash calls per jit dispatch")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--bh", type=int, default=16)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--nk", type=int, default=None)
    p.add_argument("--d", type=int, default=72)
    p.add_argument("--blocks_q", default="128,256,512,1024")
    p.add_argument("--blocks_k", default="128,256,512,1024,2048,4096")
    p.add_argument("--table", action="store_true",
                   help="sweep TABLE_SHAPES and write ops/flash_blocks.json")
    p.add_argument("--force", action="store_true",
                   help="overwrite e2e-refit table entries with sweep winners")
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
    bqs = [int(x) for x in args.blocks_q.split(",")]
    bks = [int(x) for x in args.blocks_k.split(",")]

    if not args.table:
        nk = args.nk or args.n
        results = sweep_shape(attn_mod, jax, jnp, args.bh, args.n, nk, args.d,
                              bqs, bks, args.scan, args.reps)
        if results:
            best = results[0]
            print(f"\nBEST: bq={best[1]} bk={best[2]}  {best[0]*1e6:.1f} us/call")
        return

    table = {}
    details = {}
    for label, bh, nq, nk, d in TABLE_SHAPES:
        print(f"[{label}] BH={bh} nq={nq} nk={nk} d={d}")
        results = sweep_shape(attn_mod, jax, jnp, bh, nq, nk, d,
                              bqs, bks, args.scan, args.reps)
        if not results:
            print(f"[{label}] all candidates failed; skipping")
            continue
        dt, bq, bk = results[0]
        key = f"{attn_mod._bucket(nq)}:{attn_mod._bucket(nk)}"
        table[key] = [bq, bk]
        details[label] = {"key": key, "block_q": bq, "block_k": bk,
                          "us_per_call": round(dt * 1e6, 1),
                          "candidates_tried": len(results)}
        print(f"[{label}] BEST bq={bq} bk={bk} {dt*1e6:.1f} us -> table[{key}]")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "instarevive_tpu", "ops", "flash_blocks.json")
    # Entries marked e2e_refit in the existing table were chosen by
    # END-TO-END bench A/B (block shape interacts with fusion/overlap in
    # context; BENCH.md round 3) — the isolated-kernel sweep must not
    # silently revert them. Preserve unless --force.
    refit = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        refit = existing.get("e2e_refit", {})
        if not args.force:
            for key, note in refit.items():
                if key in table and key in existing.get("table", {}):
                    if table[key] != existing["table"][key]:
                        print(f"[keep] {key}: e2e-refit {existing['table'][key]} "
                              f"kept over sweep winner {table[key]} ({note}); "
                              f"--force to override")
                    table[key] = existing["table"][key]
    out = {
        "comment": "fitted by tools/flash_sweep.py --table on real TPU; "
                   "keys are nq_bucket:nk_bucket (pow2); env FLASH_BLOCK_Q/K "
                   "override. Entries listed under e2e_refit were REFIT "
                   "against the end-to-end bench (e2e evidence overrides the "
                   "microbench) and are preserved across sweeps unless "
                   "--force is given.",
        "device": str(jax.devices()[0]),
        "table": table,
        "details": details,
    }
    if refit and not args.force:
        out["e2e_refit"] = refit
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
