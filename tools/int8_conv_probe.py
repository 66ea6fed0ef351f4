#!/usr/bin/env python
"""Is an int8 conv actually faster than bf16 on this TPU through XLA?

Gate experiment for the IR_INT8_DECODE idea (VERDICT r4 item 6): v5e lists
2x int8 MXU peak (394 vs 197 TOPS), and the VAE decoder's 3x3 convs run
~40% bf16 MFU (16 ms/sample of the 43 ms/sample b4 pipeline) — but the win
only exists if XLA lowers s8xs8->s32 convs to the int8 MXU path instead of
upcasting. Times each decoder-resolution conv shape as a >=100 ms device
scan loop (the relay-tunnel rule: sub-ms dispatch timings are phantoms),
chaining output->input to defeat dispatch memoization.

Decoder hot shapes (sd-vae f8, 512^2 decode, NHWC): the per-resolution
3x3 convs that dominate decode time.
"""

from __future__ import annotations

import functools
import json
import os
import time

SHAPES = (
    # (H, W, Cin, Cout, iters) — iters sized for >=100 ms loops
    (512, 512, 128, 128, 48),
    (256, 256, 256, 256, 48),
    (128, 128, 512, 512, 48),
    (64, 64, 512, 512, 96),
)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plat = jax.default_backend()
    cache = os.path.join(repo, ".jax_cache" if plat != "cpu" else ".jax_cache_cpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    results = {}
    for h, w_, cin, cout, iters in SHAPES:
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, h, w_, cin), jnp.float32)
        wt = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05

        rows = {}
        for tag in ("bf16", "int8"):
            if tag == "bf16":
                xi = x.astype(jnp.bfloat16)
                wi = wt.astype(jnp.bfloat16)
                acc = jnp.float32

                def body(cur, _, wi=wi, acc=acc):
                    y = conv(cur, wi, acc)
                    # keep channel count: chain via cast only (cin==cout
                    # for every probed shape)
                    return y.astype(cur.dtype), None
            else:
                xi = jnp.clip(x * 32.0, -127, 127).astype(jnp.int8)
                wi = jnp.clip(wt * 512.0, -127, 127).astype(jnp.int8)
                acc = jnp.int32

                def body(cur, _, wi=wi, acc=acc):
                    y = conv(cur, wi, acc)
                    # rescale to int8 range so the chain doesn't saturate
                    return (y >> 8).astype(jnp.int8), None

            @jax.jit
            def loop(x0, n=iters, body=body):
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return out

            out = loop(xi)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = loop(out)  # chained: different input than warmup
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            flops = 2 * h * w_ * cin * cout * 9
            rows[tag] = (dt * 1e3, flops / dt / 1e12)
        sp = rows["bf16"][0] / rows["int8"][0]
        results[f"{h}x{w_}x{cin}->{cout}"] = {
            "bf16_ms": round(rows["bf16"][0], 3),
            "bf16_tf_s": round(rows["bf16"][1], 1),
            "int8_ms": round(rows["int8"][0], 3),
            "int8_tops": round(rows["int8"][1], 1),
            "speedup": round(sp, 2),
        }
        print(json.dumps({f"{h}x{w_}x{cin}->{cout}": results[f"{h}x{w_}x{cin}->{cout}"]}), flush=True)

    gm = float(np.prod([r["speedup"] for r in results.values()])) ** (1 / len(results))
    print(json.dumps({"geomean_speedup": round(gm, 3), "backend": plat}))


if __name__ == "__main__":
    main()
