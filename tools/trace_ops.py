#!/usr/bin/env python
"""Op-level device-time profiling for any pipeline stage (perf triage).

The axon tunnel makes host-side timing of sub-100ms work unreliable
(see BENCH.md), so the trustworthy signal is the on-device timestamps in
a jax.profiler perfetto trace. This tool captures a trace of a chosen
pipeline stage and aggregates per-op + per-category device time, with a
rough MXU-utilization estimate for the matmul/conv categories.

    python tools/trace_ops.py capture --stage dit --batch 1 --size 512
    python tools/trace_ops.py parse /tmp/trace_dit_b1 --top 30

Categories follow XLA op naming: fusion kernels, convolutions, dots,
data-movement (copy/convert/bitcast/transpose), collectives, infeed.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CATEGORIES = [
    ("pallas", re.compile(r"flash_attention|pallas|custom-call")),
    ("conv", re.compile(r"conv|Conv")),
    ("dot", re.compile(r"^(dot|.*gemm|.*matmul)", re.I)),
    ("collective", re.compile(r"all-reduce|all-gather|reduce-scatter|collective|permute")),
    ("data-movement", re.compile(r"copy|convert|bitcast|transpose|reshape|slice|pad|concat")),
    ("reduce", re.compile(r"reduce")),
    ("fusion", re.compile(r"fusion|loop_")),
]


def categorize(name: str) -> str:
    for cat, rx in _CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def load_events(out_dir: str):
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {out_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    return trace.get("traceEvents", [])


def parse_trace(out_dir: str) -> tuple[dict, dict, float]:
    """Aggregate device-lane events: returns (per_op_us, per_cat_us, total_us)."""
    events = load_events(out_dir)
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in proc_names.items() if "TPU" in n or "/device" in n.lower()}
    per_op, per_cat = defaultdict(float), defaultdict(float)
    total = 0.0
    module_rx = re.compile(r"^jit_.*\(\d+\)$")  # enclosing XLA-module event
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            name, dur = e.get("name", "?"), float(e.get("dur", 0.0))
            if module_rx.match(name):
                per_op["<module> " + name] += dur  # shown but not in total
                continue
            per_op[name] += dur
            per_cat[categorize(name)] += dur
            total += dur
    return dict(per_op), dict(per_cat), total


def report(out_dir: str, top: int = 25, iters: int = 1):
    per_op, per_cat, total = parse_trace(out_dir)
    print(f"== {out_dir}: total device time {total/1e3:.2f} ms "
          f"({total/1e3/iters:.2f} ms/iter over {iters})")
    print("-- by category")
    for cat, dur in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {cat}")
    print(f"-- top {top} ops")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:100]}")


def capture(stage: str, batch: int, size: int, iters: int, out_dir: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config("configs/instarevive_v1.yaml")
    pipe = build_pipeline(cfg, dtype=jnp.bfloat16)
    params = init_params(pipe, 0)
    key = jax.random.key(0)
    lq = jax.random.uniform(key, (batch, size, size, 3))
    f = pipe.latent_factor
    z = jax.random.normal(key, (batch, size // f, size // f, 4)) * 0.2
    y = jnp.zeros((batch, pipe.dit.model_max_length, pipe.dit.caption_channels),
                  jnp.float32)

    from instarevive_tpu.data.realesrgan import (
        RealESRGANDegradationConfig,
        degrade_batch,
    )

    deg_cfg = RealESRGANDegradationConfig()
    fns = {
        "swinir": (jax.jit(lambda p, a: pipe.clean(p, a)), (params, lq)),
        "encode": (jax.jit(lambda p, a: pipe.encode(p, a)), (params, lq)),
        "dit": (jax.jit(lambda p, a, b: pipe.one_step(p, a, b)), (params, z, y)),
        "decode": (jax.jit(lambda p, a: pipe.decode(p, a)), (params, z)),
        "full": (jax.jit(lambda p, a, b: pipe.process(p, a, b)), (params, lq, y)),
        # the train loop's on-device Real-ESRGAN synthesis (train.py
        # degrade_jit) — 101.5 ms/step at b2 512² in the r5 loop trace
        "degrade": (
            jax.jit(lambda k, x: degrade_batch(k, x, deg_cfg)),
            (key, lq),
        ),
    }
    if stage not in fns:
        raise SystemExit(f"unknown stage {stage!r}; choose from {list(fns)}")
    fn, fargs = fns[stage]
    out = fn(*fargs)  # compile + warm
    jax.block_until_ready(out)

    jax.profiler.start_trace(out_dir)
    for _ in range(iters):
        out = fn(*fargs)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    report(out_dir, iters=iters)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("capture")
    c.add_argument("--stage", default="dit",
                   choices=["swinir", "encode", "dit", "decode", "full", "degrade"])
    c.add_argument("--batch", type=int, default=1)
    c.add_argument("--size", type=int, default=512)
    c.add_argument("--iters", type=int, default=3)
    c.add_argument("--out", default=None)
    r = sub.add_parser("parse")
    r.add_argument("out_dir")
    r.add_argument("--top", type=int, default=25)
    r.add_argument("--iters", type=int, default=1)
    args = p.parse_args()
    if args.cmd == "capture":
        out = args.out or f"/tmp/trace_{args.stage}_b{args.batch}_s{args.size}"
        capture(args.stage, args.batch, args.size, args.iters, out)
    else:
        report(args.out_dir, top=args.top, iters=args.iters)


if __name__ == "__main__":
    main()
