#!/usr/bin/env python
"""Multi-seed warp-importance A/B at the 30-frame parity scale
(VERDICT r4 #1b done-bar: >=3 seeds, 50 epochs, 512x288x30, exact vs
--warp_importance 0.5, within +-0.1 dB).

Runs the arms SERIALLY in this one process (one TPU process at a time —
the tunnel corrupts concurrent sessions). Each run is the round-4 A/B
protocol (tools/learning_equiv.py::run) at frames=30. Prints a table and
writes /tmp/ab_campaign.json as it goes so a wedged tunnel can't erase
finished arms.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache

from tools.learning_equiv import run  # noqa: E402  (same protocol fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", nargs="+", type=int, default=[42, 43, 44])
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--wh", nargs=2, type=int, default=[512, 288])
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--N_samples", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--flow_scale", type=float, default=0.2)
    p.add_argument("--scan_steps", type=int, default=32)
    p.add_argument("--scene", type=str, default="/tmp/ab_scene_30f")
    p.add_argument("--warp_importance", type=float, default=0.5)
    p.add_argument("--out", type=str, default="/tmp/ab_campaign.json")
    args = p.parse_args()
    args.seed = args.seeds[0]  # run() reads args.seed; set per arm below

    enable_compilation_cache("/root/repo/.jax_cache")
    if not os.path.isdir(args.scene):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from helpers_scene import make_synthetic_scene
        make_synthetic_scene(args.scene, W=args.wh[0], H=args.wh[1],
                             N=args.frames, seed=0, learnable=True)

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    for seed in args.seeds:
        for wi, arm in ((0.0, "exact"), (args.warp_importance, "wi")):
            key = f"{arm}_s{seed}"
            if key in results:
                print(f"[{key}] cached: {results[key]:.3f} dB", flush=True)
                continue
            args.seed = seed
            # the tunneled backend intermittently drops a remote-compile
            # HTTP body mid-arm; run() auto-resumes from the arm's latest
            # epoch checkpoint, so a retry loses at most one epoch
            for attempt in range(3):
                try:
                    psnr = run("pallas", args.scene, args,
                               warp_importance=wi, tag=f"ab30_{key}")
                    break
                except Exception as e:
                    print(f"[{key}] attempt {attempt + 1}/3 failed: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    if attempt == 2:
                        raise
                    import time
                    time.sleep(30)
            results[key] = float(psnr)
            json.dump(results, open(args.out, "w"), indent=1)
            print(f"[{key}] final val PSNR = {psnr:.3f} dB", flush=True)

    ex = [results[k] for k in results if k.startswith("exact")]
    wi_ = [results[k] for k in results if k.startswith("wi")]
    if ex and wi_:
        mex = sum(ex) / len(ex)
        mwi = sum(wi_) / len(wi_)
        print(f"exact: {[round(v, 3) for v in ex]} mean {mex:.3f}")
        print(f"wi:    {[round(v, 3) for v in wi_]} mean {mwi:.3f}")
        print(f"delta (wi - exact) = {mwi - mex:+.3f} dB")


if __name__ == "__main__":
    main()
