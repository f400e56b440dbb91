"""Minimal HTTP inference server over the serving API.

One process owns the chip (the rollout is compiled once and reused);
requests are serialised through a lock — scale out with more processes
behind a load balancer (one per chip; see docs/SERVING.md for --mesh_data
batched serving inside a process). Stdlib-only on purpose: no web
framework to pin, nothing between the socket and VideoGenerator.

Endpoints:
  GET  /healthz       -> {"ok": true, "model": ..., "config": {...}}
  POST /generate      JSON body:
        {"image": <base64 png/jpg>,        # the start frame (required)
         "num_frames": 32,                 # prompt + generated
         "seed": 0,                        # optional; random if absent
         "actions": [[...25 floats]...]}   # optional, per frame
      -> video/mp4 bytes (Content-Disposition: attachment)

The reference has no serving story at all (generate.py is a one-shot
script, /root/reference/generate.py).

Usage:
  python -m gtax.cli.serve --port 8000 \
      --dit_model_path dit.safetensors --vae_model_path vit-l-20.safetensors
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import tempfile
import threading

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()  # must precede any jax device use
enable_compile_cache()


def build_parser():
    p = argparse.ArgumentParser(description="gtax HTTP inference server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dit_model_path", default="checkpoints/dit.safetensors")
    p.add_argument("--vae_model_path",
                   default="checkpoints/vit-l-20.safetensors")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attention_backend", default="fused")
    p.add_argument("--quantize", choices=["none", "int8"], default="int8")
    p.add_argument("--noise_steps", type=int, default=100)
    p.add_argument("--max_frames", type=int, default=128,
                   help="reject requests beyond this num_frames")
    p.add_argument("--dit_model", default="DiT-S/2")
    p.add_argument("--vae_model", default="vit-l-20-shallow-encoder")
    p.add_argument("--aot_dir", default=None,
                   help="AOT executable cache dir (gtax.aot): restart the "
                        "server in seconds instead of recompiling")
    return p


def make_server(args):
    """Build (and return) the configured HTTPServer — separated from main()
    so tests can run it on an ephemeral port in a thread."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    from gtax.io.video import read_image_bytes, write_video
    from gtax.serving import ServingConfig, VideoGenerator

    cfg = ServingConfig(
        dtype=args.dtype, attention_backend=args.attention_backend,
        quantize=args.quantize, noise_steps=args.noise_steps,
        aot_dir=args.aot_dir,
        dit_model=args.dit_model, vae_model=args.vae_model,
    )
    gen = VideoGenerator.load(args.dit_model_path, args.vae_model_path, cfg)
    lock = threading.Lock()  # the chip runs one rollout at a time
    h, w = gen.vae_cfg.input_height, gen.vae_cfg.input_width

    class Handler(BaseHTTPRequestHandler):
        # connection timeout: a client that stalls mid-body must not pin a
        # handler thread forever (rfile.read blocks on Content-Length)
        timeout = 120

        def log_message(self, fmt, *a):  # route through print, not stderr
            print("[gtax.serve]", fmt % a)

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            self._json(200, {
                "ok": True, "model": cfg.dit_model,
                "config": {"quantize": cfg.quantize,
                           "noise_steps": cfg.noise_steps,
                           "backend": cfg.attention_backend,
                           "dtype": cfg.dtype},
            })

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                num_frames = int(req.get("num_frames", 32))
                if not 1 < num_frames <= args.max_frames:
                    raise ValueError(
                        f"num_frames must be in (1, {args.max_frames}]")
                frame = read_image_bytes(
                    base64.b64decode(req["image"]), (h, w))
                actions = req.get("actions")
                if actions is not None:
                    actions = np.asarray(actions, np.float32)[None]
                    if actions.ndim != 3 or actions.shape[-1] != 25 \
                            or actions.shape[1] < num_frames:
                        raise ValueError(
                            f"actions must be ({num_frames}+, 25), got "
                            f"{actions.shape[1:]}")
                seed = int(req["seed"]) if "seed" in req else (
                    int.from_bytes(os.urandom(4), "big"))
            except Exception as e:
                return self._json(400, {"error": f"bad request: {e}"})
            try:
                with lock:
                    pixels = gen.generate(frame[None, None], actions,
                                          num_frames=num_frames,
                                          seed=seed)
                with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                    write_video(f.name, pixels[0], fps=10)
                    with open(f.name, "rb") as fh:  # cv2 wrote via the path
                        data = fh.read()
            except Exception as e:
                return self._json(500, {"error": f"generation failed: {e}"})
            self.send_response(200)
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Content-Disposition",
                             'attachment; filename="video.mp4"')
            self.send_header("X-Seed", str(seed))
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return ThreadingHTTPServer((args.host, args.port), Handler)


def main(argv=None):
    args = build_parser().parse_args(argv)
    server = make_server(args)
    print(f"[gtax.serve] listening on http://{args.host}:"
          f"{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
