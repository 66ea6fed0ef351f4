#!/usr/bin/env python
"""Capture + parse device traces of the VAE decoder (batch-scaling triage).

Captures jax.profiler traces for decode at batch sizes, then parses the
perfetto trace.json.gz to aggregate per-op device time — no tensorboard UI
needed (the tunnel breaks sub-ms host timing; the trace records on-device
timestamps).

    python tools/trace_decode.py 1 2
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def capture(batch: int, out_dir: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config("configs/instarevive_v1.yaml")
    pipe = build_pipeline(cfg, dtype=jnp.bfloat16)
    params = init_params(pipe, 0)
    z = jax.random.normal(jax.random.key(0), (batch, 64, 64, 4)) * 0.2
    dec = jax.jit(lambda p, z: pipe.decode(p, z))
    out = dec(params, z)
    jax.block_until_ready(out)

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = dec(params, z)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def parse(out_dir: str, top: int = 25):
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace.json.gz under {out_dir}")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in proc_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            total += dur
    print(f"== top ops by device time ({out_dir}), total {total/1e3:.1f} ms over 3 iters")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/1e3:8.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:90]}")


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2]
    for b in batches:
        out_dir = f"/tmp/trace_decode_b{b}"
        capture(b, out_dir)
        parse(out_dir)


if __name__ == "__main__":
    main()
