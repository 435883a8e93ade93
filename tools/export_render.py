#!/usr/bin/env python
"""Export a trained NSFF renderer as a single portable serving artifact.

TPU-native addition (no reference analog — the reference's only serving
story is re-running `eval.py` inside the full repo, `eval.py:121-261`):
`jax.export` ahead-of-time lowers the test-time render function WITH the
checkpoint parameters baked in to a self-contained StableHLO blob. The
artifact is loadable with nothing but `jax` — none of this framework's
code — and runs fixed-shape `(chunk, 6)` ray batches:

    python tools/export_render.py --ckpt_path ckpts/kid/step_221150 \
        --encode_t --use_viewdir --N_samples 128 --chunk 32768 \
        --out kid_render.nsffx --check

    # serving side (only jax required):
    import jax, jax.numpy as jnp
    from jax import export
    rt = export.deserialize(open("kid_render.nsffx", "rb").read())
    rgb, depth = rt.call(rays, ts)   # rays (chunk, 6) f32, ts (chunk,) i32

A `<out>.json` sidecar records shapes, flags, and output names. The
export defaults to the portable XLA path (`--mlp_backend xla`); exporting
Pallas kernels is possible on a TPU host but ties the artifact to the
exact mosaic runtime, so it stays opt-in.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_opts(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, required=True,
                   help="orbax checkpoint dir or reference PL .ckpt")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path (sidecar: <out>.json)")
    p.add_argument("--chunk", type=int, default=32 * 1024,
                   help="rays per call (the artifact's fixed batch shape)")
    p.add_argument("--img_wh", nargs="+", type=int, default=[512, 288])
    p.add_argument("--use_viewdir", default=False, action="store_true")
    p.add_argument("--N_samples", type=int, default=128)
    p.add_argument("--N_importance", type=int, default=0)
    p.add_argument("--encode_a", default=False, action="store_true")
    p.add_argument("--N_a", type=int, default=48)
    p.add_argument("--encode_t", default=False, action="store_true")
    p.add_argument("--N_tau", type=int, default=48)
    p.add_argument("--N_frames", type=int, default=30,
                   help="number of training frames (t-embedding rows)")
    p.add_argument("--flow_scale", type=float, default=0.2)
    p.add_argument("--output_transient", default=False, action="store_true",
                   help="also bake the transient branch maps")
    p.add_argument("--mlp_backend", type=str, default="xla",
                   choices=["xla", "auto", "pallas"],
                   help="xla (default) exports a portable StableHLO blob; "
                        "pallas ties the artifact to the mosaic runtime")
    p.add_argument("--platforms", nargs="+", type=str, default=None,
                   help="lowering platforms baked into the artifact, e.g. "
                        "'--platforms cpu tpu' cross-lowers a TPU-servable "
                        "artifact from a CPU host (default: the current "
                        "backend only)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--check", default=False, action="store_true",
                   help="after export: deserialize and compare one batch "
                        "against the live renderer")
    return p.parse_args(argv)


OUTPUT_KEYS = ("rgb_fine", "depth_fine")


def build_serve_fn(args, params):
    """The fixed-shape serving function: (rays, ts) -> (rgb, depth).

    test_time render (`models/rendering.py::render_rays` with
    test_time=True) is deterministic, so the rng is baked as a constant.
    """
    import jax

    from nsff_pl_tpu.models.rendering import RenderConfig
    from nsff_pl_tpu.training.step import make_render_fn

    rcfg = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        use_viewdir=args.use_viewdir, encode_a=args.encode_a,
        encode_t=args.encode_t, max_t=args.N_frames - 1,
        N_tau=args.N_tau, N_a=args.N_a,
        img_wh=tuple(args.img_wh), flow_scale=args.flow_scale,
        compute_dtype=args.dtype, mlp_backend=args.mlp_backend,
        train_backend=args.mlp_backend, fused_train="off")
    render = make_render_fn(
        rcfg, test_time=True,
        output_transient=args.output_transient and args.encode_t,
        keys=OUTPUT_KEYS)
    rng = jax.random.PRNGKey(42)

    def serve(rays, ts):
        out = render(params, rays, ts, rng)
        return tuple(out[k] for k in OUTPUT_KEYS)

    return jax.jit(serve)


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from nsff_pl_tpu.config import NSFFConfig

    cfg = NSFFConfig(
        img_wh=tuple(args.img_wh), start_end=(0, args.N_frames),
        use_viewdir=args.use_viewdir, N_samples=args.N_samples,
        N_importance=args.N_importance, encode_a=args.encode_a,
        N_a=args.N_a, encode_t=args.encode_t, N_tau=args.N_tau,
        flow_scale=args.flow_scale)
    from nsff_pl_tpu.apps.evaluate import load_params

    params = load_params(args, cfg)
    serve = build_serve_fn(args, params)

    rays_spec = jax.ShapeDtypeStruct((args.chunk, 6), jnp.float32)
    ts_spec = jax.ShapeDtypeStruct((args.chunk,), jnp.int32)
    exp = jexport.export(serve, platforms=args.platforms)(rays_spec, ts_spec)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {
        "inputs": {"rays": [args.chunk, 6], "ts": [args.chunk]},
        "outputs": list(OUTPUT_KEYS),
        "platforms": list(exp.platforms),
        "flags": {k: v for k, v in vars(args).items()
                  if k not in ("out", "check", "ckpt_path")},
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {len(blob)/1e6:.1f} MB -> {args.out} "
          f"(platforms {exp.platforms})")

    if args.check:
        rt = jexport.deserialize(blob)
        key = jax.random.PRNGKey(0)
        rays = jnp.concatenate([
            (jax.random.uniform(key, (args.chunk, 3)) - 0.5)
            .at[:, 2].set(-1.0),
            (jax.random.uniform(jax.random.PRNGKey(1), (args.chunk, 3))
             * 0.1).at[:, 2].set(2.0)], -1)
        ts = jnp.zeros((args.chunk,), jnp.int32)
        got = rt.call(rays, ts)
        want = serve(rays, ts)
        for g, w, name in zip(got, want, OUTPUT_KEYS):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=2e-5)
            print(f"check {name}: max|err| "
                  f"{float(abs(np.asarray(g) - np.asarray(w)).max()):.2e}")
        print("roundtrip check OK")


if __name__ == "__main__":
    main(get_opts())
