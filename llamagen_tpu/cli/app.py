"""Interactive c2i demo server.

Equivalent of the reference Gradio demo (`/root/reference/app.py`): serves
class-conditional generation over HTTP, backed by the continuous-batching
ServeEngine. The reference hot-swaps the vLLM sampler per request
(app.py:54); here cfg_scale / temperature / top-k / top-p are PER-REQUEST
traced data in one compiled engine program — mixed guidance scales serve
concurrently with zero recompiles. Uses Gradio when installed, otherwise a
dependency-free stdlib HTTP server with the same endpoints.

  python -m llamagen_tpu.cli.app --gpt-ckpt c2i_B_256.pt --vq-ckpt vq.pt
  curl "localhost:7860/generate?class_id=207&cfg_scale=3.5" -o dog.png
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class DemoBackend:
    def __init__(self, args):
        from llamagen_tpu.cli.common import load_gpt, load_vq
        from llamagen_tpu.models import vq as vq_lib
        from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

        self.latent = args.image_size // args.downsample_size
        gpt_params, gpt_cfg = load_gpt(args.gpt_ckpt, args.gpt_model,
                                       args.image_size, args.downsample_size)
        self.vq_params, self.vq_cfg = load_vq(
            args.vq_ckpt, args.vq_model, args.codebook_size,
            args.codebook_embed_dim)
        self.vq_lib = vq_lib
        if args.quantize == "int8":
            from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
            gpt_params = quantize_gpt_params(gpt_params)
        elif args.quantize in ("w4", "w4-pc"):
            from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
            gpt_params = quantize_gpt_params_w4k(
                gpt_params, per_channel=args.quantize == "w4-pc")
        self.engine = ServeEngine(
            gpt_params, gpt_cfg, num_pairs=args.num_slots,
            max_new_tokens=self.latent * self.latent,
            sampling_params=SamplingParams(cfg_scale=args.cfg_scale,
                                           top_k=args.top_k,
                                           top_p=args.top_p,
                                           temperature=args.temperature),
            chunk=args.chunk)
        self._default_sp = self.engine.sp
        self._lock = threading.Lock()

    def generate_png(self, class_id: int, cfg_scale=None, temperature=None,
                     top_k=None, top_p=None) -> bytes:
        from PIL import Image
        from llamagen_tpu.serve.engine import SamplingParams

        d = self._default_sp
        sp = SamplingParams(
            cfg_scale=d.cfg_scale if cfg_scale is None else float(cfg_scale),
            temperature=(d.temperature if temperature is None
                         else float(temperature)),
            top_k=d.top_k if top_k is None else int(top_k),
            top_p=d.top_p if top_p is None else float(top_p))
        with self._lock:  # engine host loop is single-driver
            req = self.engine.submit(class_id, sp=sp)
            self.engine.run_until_idle()
            tokens = req.result
        idx = jnp.asarray(tokens.reshape(1, self.latent, self.latent))
        img = self.vq_lib.decode_code(self.vq_params, idx, self.vq_cfg)
        arr = np.asarray(img.astype(jnp.float32))[0]
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()


def serve_http(backend: DemoBackend, port: int):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/generate":
                q = urllib.parse.parse_qs(url.query)
                class_id = int(q.get("class_id", ["207"])[0])
                opt = {k: q[k][0] for k in
                       ("cfg_scale", "temperature", "top_k", "top_p")
                       if k in q}
                png = backend.generate_png(class_id, **opt)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/stats":
                body = json.dumps(backend.engine.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    print(f"serving on http://0.0.0.0:{port}  "
          f"(GET /generate?class_id=N, GET /stats)")
    ThreadingHTTPServer(("0.0.0.0", port), Handler).serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--top-k", type=int, default=4000)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--num-slots", type=int, default=4)
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "w4", "w4-pc"],
                   help="weight quantization: int8 = W8A16 (near-exact, "
                        "the serving default for quality), w4/w4-pc = "
                        "W4A16 Pallas kernel (faster on weights-bound "
                        "models, numerics tradeoff — see BENCH.md)")
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    backend = DemoBackend(args)
    try:
        import gradio as gr

        def infer(class_id, cfg_scale):
            png = backend.generate_png(int(class_id), cfg_scale=cfg_scale)
            from PIL import Image
            return Image.open(io.BytesIO(png))

        demo = gr.Interface(
            fn=infer,
            inputs=[gr.Number(label="ImageNet class id"),
                    gr.Slider(1.0, 10.0, value=4.0, label="cfg scale")],
            outputs=gr.Image(),
            title="LlamaGen-TPU c2i demo")
        demo.launch(server_port=args.port)
    except ImportError:
        serve_http(backend, args.port)


if __name__ == "__main__":
    main()
