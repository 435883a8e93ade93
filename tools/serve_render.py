#!/usr/bin/env python
"""Minimal HTTP render server over a trained NSFF checkpoint.

The online-serving counterpart of `eval.py` (which is batch-oriented,
`eval.py:121-261` semantics): load a checkpoint once, keep the jitted
renderer warm, and serve novel-view/novel-time renders over HTTP. Uses
only the stdlib server — requests are handled serially, matching the
one-process-per-accelerator model.

    python tools/serve_render.py --root_dir <scene> --ckpt_path <ckpt> \
        --img_wh 512 288 --start_end 0 30 --encode_t --use_viewdir \
        --N_samples 128 --port 8765

Endpoints:
    GET  /health  -> {"status": "ok"}
    GET  /meta    -> scene metadata: n_frames, img_wh, K, and the test
                     poses (poses are in the model's centered/scaled
                     frame — clients pick or interpolate between them)
    POST /render  -> body {"t": int, "c2w": optional 3x4 nested list
                     (defaults to training pose t)}; returns image/png.
                     `?format=json` returns {"rgb": ..., "depth": ...}
                     as nested lists instead.
"""
import argparse
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--img_wh", nargs="+", type=int, default=[512, 288])
    parser.add_argument("--start_end", nargs="+", type=int, default=[0, 100])
    parser.add_argument("--use_viewdir", default=False, action="store_true")
    parser.add_argument("--N_samples", type=int, default=128)
    parser.add_argument("--N_importance", type=int, default=0)
    parser.add_argument("--encode_a", default=False, action="store_true")
    parser.add_argument("--N_a", type=int, default=48)
    parser.add_argument("--encode_t", default=False, action="store_true")
    parser.add_argument("--N_tau", type=int, default=48)
    parser.add_argument("--flow_scale", type=float, default=0.2)
    parser.add_argument("--chunk", type=int, default=32 * 1024)
    parser.add_argument("--num_gpus", type=int, default=1,
                        help="chips to render data-parallel over")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--no_warmup", default=False, action="store_true",
                        help="skip the startup render that pays the jit "
                             "compile before the first request")
    parser.add_argument("--jax_cache_dir", type=str, default="")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="render compute dtype; bfloat16 enables the "
                             "fused Pallas eval kernels on TPU")
    return parser.parse_args(argv)


class RenderService:
    """Checkpoint + scene + one jitted renderer (same construction as
    `eval.py`: config from flags, `load_params`, `make_render_fn`)."""

    def __init__(self, args):
        import jax

        from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache

        enable_compilation_cache(args.jax_cache_dir)

        from nsff_pl_tpu.apps.evaluate import load_params
        from nsff_pl_tpu.config import NSFFConfig
        from nsff_pl_tpu.scene import scene_dict
        from nsff_pl_tpu.training.step import (make_render_fn,
                                               render_full_image)
        from nsff_pl_tpu.training.trainer import render_config

        self._render_full_image = render_full_image
        w, h = args.img_wh
        self.w, self.h = w, h
        self.scene = scene_dict["monocular"](
            root_dir=args.root_dir, split="test", img_wh=(w, h),
            start_end=tuple(args.start_end))
        cfg = NSFFConfig(
            root_dir=args.root_dir, img_wh=(w, h),
            start_end=(args.start_end[0],
                       args.start_end[0] + self.scene.N_frames),
            use_viewdir=args.use_viewdir, N_samples=args.N_samples,
            N_importance=args.N_importance, encode_a=args.encode_a,
            N_a=args.N_a, encode_t=args.encode_t, N_tau=args.N_tau,
            flow_scale=args.flow_scale,
            dtype=getattr(args, "dtype", "float32"))
        self.cfg = cfg
        params = load_params(args, cfg)

        self.mesh = None
        self.chunk = args.chunk
        if args.num_gpus > 1:
            from nsff_pl_tpu.parallel import (make_mesh,
                                              replicated_sharding)

            n = min(args.num_gpus, len(jax.devices()))
            self.mesh = make_mesh(n)
            self.chunk = max(n, self.chunk - self.chunk % n)
            params = jax.device_put(params, replicated_sharding(self.mesh))
        self.params = params
        # full scene render (static + transient) when the model has a
        # transient field — the serving default, unlike eval.py's
        # opt-in --output_transient metric semantics
        self.render = make_render_fn(
            render_config(cfg), test_time=True,
            output_transient=cfg.encode_t,
            output_transient_flow=(),
            keys=("rgb_fine", "depth_fine"), mesh=self.mesh)
        self.rng = jax.random.PRNGKey(42)

    def meta(self):
        return {
            "n_frames": int(self.scene.N_frames),
            "img_wh": [self.w, self.h],
            "K": np.asarray(self.scene.K).tolist(),
            "poses": np.asarray(self.scene.poses).tolist(),
        }

    def render_pose(self, t: int, c2w=None):
        """Render frame time `t` from `c2w` (3x4; defaults to training
        pose t). Returns (rgb (h, w, 3) uint8, depth (h, w) float32)."""
        import jax.numpy as jnp

        if not 0 <= t < self.scene.N_frames:
            raise ValueError(f"t must be in [0, {self.scene.N_frames})")
        c2w = self.scene.poses[t] if c2w is None \
            else np.asarray(c2w, np.float32).reshape(3, 4)
        rays_o, rays_d, _ = self.scene._frame_rays(c2w)
        rays = jnp.asarray(np.concatenate([rays_o, rays_d], 1), jnp.float32)
        ts = jnp.full((rays.shape[0],), t, jnp.int32)
        out = self._render_full_image(self.render, self.params, rays, ts,
                                      self.rng, chunk=self.chunk)
        rgb = np.clip(np.asarray(out["rgb_fine"]), 0, 1)
        rgb = (rgb.reshape(self.h, self.w, 3) * 255).astype(np.uint8)
        depth = np.asarray(out["depth_fine"],
                           np.float32).reshape(self.h, self.w)
        return rgb, depth


def make_handler(service):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code, obj):
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            if self.path == "/health":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/meta":
                self._send_json(200, service.meta())
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/render":
                self._send_json(404, {"error": f"unknown path {path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                rgb, depth = service.render_pose(int(req.get("t", 0)),
                                                 req.get("c2w"))
            except Exception as e:
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            if "format=json" in query:
                self._send_json(200, {"rgb": rgb.tolist(),
                                      "depth": depth.tolist()})
            else:
                import imageio.v2 as imageio

                buf = io.BytesIO()
                imageio.imwrite(buf, rgb, format="png")
                self._send(200, buf.getvalue(), "image/png")

        def log_message(self, fmt, *a):  # concise one-line access log
            print(f"[serve] {self.address_string()} {fmt % a}", flush=True)

    return Handler


def main(args):
    from http.server import HTTPServer

    service = RenderService(args)
    if not args.no_warmup:
        print("[serve] warmup render (pays the jit compile)...", flush=True)
        service.render_pose(0)
    server = HTTPServer((args.host, args.port), make_handler(service))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"({service.scene.N_frames} frames at {service.w}x{service.h})",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main(get_opts())
