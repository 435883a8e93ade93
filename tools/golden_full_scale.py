"""Full-scale golden parity artifact (VERDICT r2 #4).

Synthesizes a reference-layout Lightning checkpoint at the REAL
kid-running shapes (512x288 frame, S=128 samples, 30 frames, N_tau=48 —
the recipe of `/root/reference/README.md:227-234`), imports it through
`import_pl_checkpoint` (the path `eval.py:143-170` takes with real
checkpoints), renders ONE FULL FRAME on the ambient device (TPU when
available) through the chunked eval renderer, and asserts a random ray
subsample against the independent float64 NumPy implementation of the
reference forward equations (tests/test_golden_cross.py::ref_forward).

This is the strongest quality-parity evidence obtainable without the
real dataset: it pins the torch->JAX import, posenc, tower topology,
head activations, flow z_far zeroing and NeRF-W compositing at the exact
eval shapes a reference user would run. Recorded tolerances live in
docs/ROADMAP.md (round 3).

Run (TPU): python tools/golden_full_scale.py
Run (CPU): env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
               python tools/golden_full_scale.py --quick
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W_IMG, H_IMG = 512, 288
S = 128
N_FRAMES = 30
N_TAU = 48


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="64x36 frame, S=16, 256-ray subsample (CPU smoke)")
    ap.add_argument("--subsample", type=int, default=4096,
                    help="rays checked against the f64 reference")
    ap.add_argument("--ckpt", type=str, default="/tmp/golden_full.ckpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tests.test_golden_cross import make_torch_ckpt, ref_forward
    from nsff_pl_tpu.models.rendering import RenderConfig
    from nsff_pl_tpu.ops import rays as ray_ops
    from nsff_pl_tpu.training.checkpoint import import_pl_checkpoint
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image

    w, h, s, sub = ((64, 36, 16, 256) if args.quick
                    else (W_IMG, H_IMG, S, args.subsample))
    print(f"frame {w}x{h}, S={s}, {N_FRAMES} frames, N_tau={N_TAU}, "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.RandomState(7)
    sd = make_torch_ckpt(args.ckpt, rng, n_tau=N_TAU, n_frames=N_FRAMES)
    params = import_pl_checkpoint(args.ckpt)

    # rays exactly as the scene loader builds them (scene/monocular.py:
    # 204-210): camera-space directions -> world (identity pose at the
    # origin) -> NDC with origins shifted to the near plane
    f = 500.0 * w / 960
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    dirs = ray_ops.get_ray_directions(h, w, K)
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    rays_o, rays_d = ray_ops.get_rays(dirs, c2w)
    shift_near = -min(-1.0, float(c2w[2, 3]))
    rays_o, rays_d = ray_ops.get_ndc_rays(jnp.asarray(K), 1.0, shift_near,
                                          rays_o, rays_d)
    rays = jnp.concatenate([rays_o, rays_d], -1)
    ts = jnp.full((h * w,), N_FRAMES // 2, jnp.int32)

    keys = ("rgb_fine", "depth_fine", "zs_fine", "static_sigmas_fine",
            "transient_flows_fw", "transient_flows_bw")
    # Committed tolerances per compute path vs the f64 reference.
    # TPU tolerances are wider than CPU ones because the hardware
    # transcendentals (the posenc sin at frequencies up to 2^9) carry
    # ~1e-5 absolute error that the towers amplify; measured full-scale
    # maxima on v5e (recorded in docs/ROADMAP.md round 3):
    #   xla-f32:     rgb 1.75e-4  depth 1.65e-4  sigma 1.25e-3  flow 4.3e-4
    #   pallas-bf16: rgb 5.8e-3   depth 7.5e-3   sigma 4.5e-2   flow 1.6e-2
    # CPU (--quick) lands at ~1e-6 for the f32 path.
    if jax.default_backend() == "cpu":
        tols = {
            "xla-f32": {"rgb": 2e-4, "depth": 5e-4, "sigma": 2e-3,
                        "flow": 5e-5},
            "pallas-bf16": {"rgb": 2e-2, "depth": 5e-2, "sigma": 0.2,
                            "flow": 5e-2},
        }
    else:
        tols = {
            "xla-f32": {"rgb": 5e-4, "depth": 5e-4, "sigma": 5e-3,
                        "flow": 1.5e-3},
            "pallas-bf16": {"rgb": 2e-2, "depth": 3e-2, "sigma": 0.2,
                            "flow": 5e-2},
        }

    ref_cache = {}
    failures = []
    for tag, dtype in (("xla-f32", "float32"), ("pallas-bf16", "bfloat16")):
        cfg = RenderConfig(
            N_samples=s, N_importance=0, perturb=0.0, noise_std=0.0,
            use_viewdir=True, encode_a=False, encode_t=True, N_tau=N_TAU,
            max_t=N_FRAMES - 1, img_wh=(w, h), compute_dtype=dtype)
        render = make_render_fn(cfg, test_time=True, output_transient=True,
                                output_transient_flow=("fw", "bw"),
                                keys=keys)
        t0 = time.time()
        out = render_full_image(render, {"nerf_fine": params["nerf_fine"],
                                         "embedding_t":
                                         params["embedding_t"]},
                                rays, ts, jax.random.PRNGKey(0),
                                chunk=min(32768, h * w))
        out = {k: np.asarray(v) for k, v in out.items()}
        dt = time.time() - t0
        assert np.isfinite(out["rgb_fine"]).all()
        print(f"[{tag}] rendered {h * w} rays x {s} samples "
              f"in {dt:.1f}s", flush=True)

        idx = rng.choice(h * w, size=min(sub, h * w), replace=False)
        if "ref" not in ref_cache:  # f64 reference on the subsample
            zs = np.broadcast_to(
                np.linspace(0, 1, s, dtype=np.float32), (len(idx), s))
            ro = np.asarray(rays_o)[idx].astype(np.float64)
            rd = np.asarray(rays_d)[idx].astype(np.float64)
            xyz = ro[:, None] + rd[:, None] * zs[..., None]
            t_emb = sd["embedding_t.weight"][np.asarray(ts)[idx]]
            t0 = time.time()
            ref_cache["ref"] = ref_forward(sd, xyz, rd, t_emb,
                                           zs.astype(np.float64))
            ref_cache["idx"] = idx
            print(f"f64 reference on {len(idx)} rays: "
                  f"{time.time() - t0:.1f}s", flush=True)
        ref, idx = ref_cache["ref"], ref_cache["idx"]

        tol = tols[tag]
        checks = [
            ("rgb", out["rgb_fine"][idx], ref["rgb_fine"]),
            ("depth", out["depth_fine"][idx], ref["depth_fine"]),
            ("sigma", np.log1p(np.exp(ref["static_sigmas"])),
             out["static_sigmas_fine"][idx]),
            ("flow", out["transient_flows_fw"][idx], ref["flows_fw"]),
        ]
        for name, got, want in checks:
            err = np.abs(np.asarray(got, np.float64)
                         - np.asarray(want, np.float64)).max()
            ok = err <= tol[name]
            print(f"[{tag}] {name:6s} max|err| {err:.2e} "
                  f"(tol {tol[name]:g}) {'OK' if ok else 'FAIL'}",
                  flush=True)
            if not ok:
                failures.append((tag, name, err))

    if failures:
        raise SystemExit(f"golden full-scale parity FAILED: {failures}")
    print("golden full-scale parity: ALL OK")


if __name__ == "__main__":
    main()
