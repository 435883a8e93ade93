#!/usr/bin/env python
"""Learning-equivalence check: train the SAME synthetic scene with the
XLA and Pallas train backends and compare validation PSNR.

The Pallas custom-VJP kernels must not change training outcomes beyond
bf16-level noise (the kernel-level gradient equivalence is asserted in
tests/test_mlp_train_kernel.py; this is the end-to-end version on real
hardware). Run on TPU:

    python tools/learning_equiv.py [--epochs 12] [--wh 128 72]

Prints per-backend final val PSNR and the delta.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(backend: str, root: str, args, warp_subsample: int = 1,
        warp_importance: float = 0.0, tag: str = "") -> float:
    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.training.trainer import NSFFSystem

    from nsff_pl_tpu.training.checkpoint import latest_checkpoint

    exp = tag or f"equiv_{backend}"
    # auto-resume an interrupted arm: the trainer checkpoints each epoch
    # and fit() continues from state.step, so a killed run loses at most
    # one epoch instead of the whole arm.
    resume = latest_checkpoint(os.path.join("/tmp/equiv_ckpts", exp))
    if resume:
        print(f"[{exp}] resuming from {resume}", flush=True)
    cfg = NSFFConfig(
        root_dir=root, img_wh=tuple(args.wh), start_end=(0, args.frames),
        N_samples=args.N_samples, batch_size=args.batch_size,
        num_epochs=args.epochs, lr=5e-4, lr_scheduler="cosine",
        encode_t=True, use_viewdir=True, dtype="bfloat16",
        train_backend=backend, warp_subsample=warp_subsample,
        warp_importance=warp_importance, seed=args.seed,
        flow_scale=args.flow_scale, scan_steps=args.scan_steps,
        exp_name=exp, ckpt_path=resume,
        log_dir="/tmp/equiv_logs", ckpt_dir="/tmp/equiv_ckpts",
        val_every_steps=10 ** 9)
    sys_ = NSFFSystem(cfg)
    sys_.fit(log_every=200, progress=True)
    log = sys_.validate(args.epochs)
    del sys_
    return log["psnr"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--wh", nargs=2, type=int, default=[128, 72])
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--N_samples", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--flow_scale", type=float, default=0.2)
    p.add_argument("--scan_steps", type=int, default=1)
    p.add_argument("--scene", type=str, default="/tmp/equiv_scene_v2")
    p.add_argument("--seed", type=int, default=42,
                   help="training seed (the scene content is fixed by "
                        "the scene cache; rerun with several seeds for "
                        "the multi-seed A/B protocol)")
    p.add_argument("--warp_importance", type=float, default=0.5,
                   help="the f value the warp_imp mode tests")
    p.add_argument("--arm", choices=["both", "exact", "test"],
                   default="both",
                   help="warp/warp_imp modes: run both arms, or a single "
                        "arm (for splitting seeds across invocations)")
    p.add_argument("--mode", choices=["backend", "warp", "warp_imp"],
                   default="backend",
                   help="backend: XLA vs Pallas (both exact). "
                        "warp: Pallas exact (warp_subsample=1) vs "
                        "subsampled (warp_subsample=2) — the VERDICT r3 #2 "
                        "learning-equivalence check for the >=5x path. "
                        "warp_imp: exact vs the importance-concentrated "
                        "estimator (--warp_importance).")
    args = p.parse_args()

    if not os.path.isdir(args.scene):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from helpers_scene import make_synthetic_scene

        # learnable=True: structured frames. The default uniform-noise
        # frames cap val PSNR at the predict-the-mean 10*log10(12) =
        # 10.79 dB regardless of backend (both backends land there to
        # +-0.001 dB — an equivalence check but not a learning one).
        make_synthetic_scene(args.scene, W=args.wh[0], H=args.wh[1],
                             N=args.frames, seed=0, learnable=True)

    results = {}
    if args.mode == "backend":
        for backend in ("xla", "pallas"):
            results[backend] = run(backend, args.scene, args)
            print(f"[{backend}] final val PSNR = {results[backend]:.3f} dB",
                  flush=True)
        delta = results["pallas"] - results["xla"]
        print(f"PSNR delta (pallas - xla) = {delta:+.3f} dB")
    elif args.mode == "warp":
        # exact 2-warp evaluation vs one-direction-per-ray subsampling
        for ws in (1, 2):
            if args.arm != "both" and (ws == 1) != (args.arm == "exact"):
                continue
            results[ws] = run("pallas", args.scene, args, warp_subsample=ws,
                              tag=f"equiv_ws{ws}_s{args.seed}")
            print(f"[warp_subsample={ws} seed={args.seed}] final val PSNR "
                  f"= {results[ws]:.3f} dB", flush=True)
        if len(results) == 2:
            print(f"PSNR delta (ws2 - exact) = "
                  f"{results[2] - results[1]:+.3f} dB")
    else:  # warp_imp: exact vs importance-concentrated warp estimator
        for wi in (0.0, args.warp_importance):
            if args.arm != "both" and (wi == 0.0) != (args.arm == "exact"):
                continue
            results[wi] = run("pallas", args.scene, args,
                              warp_importance=wi,
                              tag=f"equiv_wi{int(wi * 100)}_s{args.seed}")
            print(f"[warp_importance={wi} seed={args.seed}] final val "
                  f"PSNR = {results[wi]:.3f} dB", flush=True)
        if len(results) == 2:
            print(f"PSNR delta (wi - exact) = "
                  f"{results[args.warp_importance] - results[0.0]:+.3f} dB")


if __name__ == "__main__":
    main()
