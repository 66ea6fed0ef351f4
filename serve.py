#!/usr/bin/env python
"""Batched serving daemon for one-step restoration (production-serving path).

A micro-batching server: concurrent requests are queued, grouped into
size-bucketed batches (pad to x64 buckets, one compiled program per bucket),
run through the jitted pipeline, and answered individually. This is the
deployment story on a TPU chip — throughput scales with batch without
recompiles.

    python serve.py --config configs/instarevive_v1.yaml --random_init --port 7870
    curl -X POST localhost:7870/restore --data '{"image": "<base64 png>"}'
    curl localhost:7870/healthz
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--swinir_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--null_embed", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--port", type=int, default=7870)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--batch_window_ms", type=int, default=30)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard request batches over N devices (one jitted "
                        "program, params replicated, batch split over the "
                        "mesh; batches are padded to a multiple of N)")
    p.add_argument("--tensor_parallel", type=int, default=0,
                   help="Megatron-style tensor parallelism over N devices "
                        "(parallel/tp.py): the DiT's attention heads and "
                        "MLPs are split per request — the latency lever, "
                        "vs --data_parallel's throughput scaling. "
                        "Composes with --data_parallel (data x tensor "
                        "devices total).")
    p.add_argument("--pipeline_parallel", type=int, default=0,
                   help="GPipe pipeline parallelism over S devices "
                        "(parallel/pp.py): the DiT block stack runs "
                        "stage-resident (depth/S blocks per device, blocks "
                        "stripped from the replicated tree) — the "
                        "serving-memory lever for DiTs past one chip's "
                        "HBM. Mutually exclusive with the other mesh "
                        "flags; batches are padded to an even size.")
    p.add_argument("--seq_parallel", type=int, default=0,
                   help="sequence/context parallelism over N devices "
                        "(parallel/sp.py): the DiT's latent token axis "
                        "is sharded with per-block K/V all-gathers "
                        "(exact global attention) — the lever for giant "
                        "un-tiled restorations. Mutually exclusive with "
                        "the other mesh flags.")
    args = p.parse_args()
    n_mesh_flags = sum(
        1 for v in (args.pipeline_parallel, args.seq_parallel) if v > 1
    ) + (1 if (args.tensor_parallel > 1 or args.data_parallel > 1) else 0)
    if n_mesh_flags > 1:
        p.error("--pipeline_parallel / --seq_parallel are mutually exclusive "
                "with each other and with --data_parallel/--tensor_parallel")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params
    from instarevive_tpu.utils.image_io import auto_resize, pad_to_multiple

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if (args.bf16 or jax.default_backend() == "tpu") else None
    pipe = build_pipeline(cfg, dtype=dtype)
    params = (
        init_params(pipe, 0)
        if args.random_init or not args.ckpt
        else load_params(pipe, swinir_ckpt=args.swinir_ckpt, vae_ckpt=args.vae_ckpt,
                         dit_ckpt=args.ckpt)
    )
    L = pipe.dit.model_max_length
    y1 = np.asarray(params["dit"]["y_embedder"]["y_embedding"])[None][:, :L]

    mesh = None
    tp_mesh = None
    pp_mesh = None
    sp_mesh = None
    pp_microbatches = 2
    if args.pipeline_parallel > 1:
        from instarevive_tpu.parallel.pp import make_pipe_mesh

        pp_mesh = make_pipe_mesh(args.pipeline_parallel)
    elif args.seq_parallel > 1:
        from instarevive_tpu.parallel.sp import make_seq_mesh

        sp_mesh = make_seq_mesh(args.seq_parallel)
    elif args.tensor_parallel > 1:
        from instarevive_tpu.parallel.mesh import make_mesh

        dp = max(args.data_parallel, 1)
        tp_mesh = make_mesh(data=dp, tensor=args.tensor_parallel,
                            devices=jax.devices()[: dp * args.tensor_parallel])
        if dp > 1:
            mesh = tp_mesh  # batch padding below keys off data_parallel
    elif args.data_parallel > 1:
        from instarevive_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.data_parallel,
                         devices=jax.devices()[: args.data_parallel])

    fns = {}

    def get_fn(h, w):
        if (h, w) not in fns:
            if pp_mesh is not None:
                fns[(h, w)] = pipe.jitted_pp(
                    pp_mesh, microbatches=pp_microbatches, color_fix="wavelet"
                )
            elif sp_mesh is not None:
                fns[(h, w)] = pipe.jitted_sp(sp_mesh, color_fix="wavelet")
            elif tp_mesh is not None:
                fns[(h, w)] = pipe.jitted_tp(tp_mesh, color_fix="wavelet")
            elif mesh is not None:
                fns[(h, w)] = pipe.jitted_sharded(mesh, color_fix="wavelet")
            else:
                fns[(h, w)] = jax.jit(
                    lambda p, x, yy: pipe.process(p, x, yy, color_fix="wavelet")
                )
        return fns[(h, w)]

    req_q: "queue.Queue" = queue.Queue()
    stats = {"served": 0, "batches": 0}

    def worker():
        while True:
            first = req_q.get()
            batch = [first]
            t0 = time.time()
            # micro-batching window: same-bucket requests coalesce
            while len(batch) < args.max_batch and (time.time() - t0) * 1e3 < args.batch_window_ms:
                try:
                    item = req_q.get(timeout=args.batch_window_ms / 1e3)
                except queue.Empty:
                    break
                if item["shape"] == first["shape"]:
                    batch.append(item)
                else:
                    req_q.put(item)
                    break
            h, w = first["shape"]
            xs = [b["x"] for b in batch]
            if mesh is not None and len(xs) % args.data_parallel:
                # pad to a mesh-size multiple (replicate the last request)
                pad = args.data_parallel - len(xs) % args.data_parallel
                xs = xs + [xs[-1]] * pad
            elif pp_mesh is not None and len(xs) % pp_microbatches:
                # the GPipe schedule needs batch % microbatches == 0
                xs = xs + [xs[-1]] * (pp_microbatches - len(xs) % pp_microbatches)
            x = jnp.asarray(np.stack(xs), jnp.float32)
            yy = jnp.asarray(np.repeat(y1, len(xs), axis=0), jnp.float32)
            out = np.asarray(get_fn(h, w)(params, x, yy))
            stats["served"] += len(batch)
            stats["batches"] += 1
            for i, b in enumerate(batch):
                b["result"] = out[i, : b["th"], : b["tw"]]
                b["event"].set()

    threading.Thread(target=worker, daemon=True).start()

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"ok": True, **stats}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/restore":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            img = Image.open(io.BytesIO(base64.b64decode(payload["image"]))).convert("RGB")
            resized = auto_resize(img, 512)
            x = pad_to_multiple(np.array(resized), 64).astype(np.float32) / 255.0
            item = {
                "x": x, "shape": x.shape[:2],
                "th": resized.height, "tw": resized.width,
                "event": threading.Event(),
            }
            req_q.put(item)
            item["event"].wait(timeout=600)
            buf = io.BytesIO()
            Image.fromarray(
                (item["result"] * 255 + 0.5).clip(0, 255).astype(np.uint8)
            ).save(buf, "PNG")
            body = json.dumps({"image": base64.b64encode(buf.getvalue()).decode()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"[serve] listening on :{args.port} (max_batch={args.max_batch})")
    ThreadingHTTPServer(("127.0.0.1", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
