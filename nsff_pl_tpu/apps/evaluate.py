#!/usr/bin/env python
"""Evaluate / render an NSFF checkpoint — CLI-compatible with the reference
`eval.py:24-78`.

Splits (semantics identical to `datasets/monocular.py:20-27`):
    test                 render the training poses/times + metric tables
    test_spiral          spiral over the whole trajectory, time advancing
    test_spiralX         wander path around training pose X (fixed time)
    test_fixviewX_interpY  fix view to pose X, interpolate Y frames between
                           each pair of timestamps (softmax-splatting MPI)

Outputs per-frame PNGs, an mp4/gif, optional depth maps, and (split=test)
per-frame + mean PSNR/SSIM/LPIPS tables saved as .npy
(`eval.py:230-261`).
"""
import argparse
import os
import numpy as np


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, default="monocular",
                        choices=["monocular"])
    parser.add_argument("--scene_name", type=str, default="test",
                        help="scene name, used as output folder name")
    parser.add_argument("--split", type=str, default="test",
                        help="test / test_spiral / test_spiralX / "
                             "test_fixviewX_interpY")
    parser.add_argument("--img_wh", nargs="+", type=int, default=[512, 288])
    parser.add_argument("--start_end", nargs="+", type=int, default=[0, 100])

    parser.add_argument("--use_viewdir", default=False, action="store_true")
    parser.add_argument("--N_samples", type=int, default=128)
    parser.add_argument("--N_importance", type=int, default=0)
    parser.add_argument("--chunk", type=int, default=32 * 1024)
    parser.add_argument("--num_gpus", type=int, default=1,
                        help="chips to render data-parallel over (a 1-D "
                             "jax.sharding mesh; beyond reference parity — "
                             "the reference's eval is single-GPU)")

    parser.add_argument("--encode_a", default=False, action="store_true")
    parser.add_argument("--N_a", type=int, default=48)
    parser.add_argument("--encode_t", default=False, action="store_true")
    parser.add_argument("--N_tau", type=int, default=48)
    parser.add_argument("--flow_scale", type=float, default=0.2)
    parser.add_argument("--output_transient", default=False,
                        action="store_true")

    parser.add_argument("--ckpt_path", type=str, required=True)

    parser.add_argument(
        "--fix_view_dir", default=False, action="store_true",
        help="on test_spiral* splits, evaluate the view-dependence "
             "embedding with the FIRST pose's ray directions for every "
             "frame, so novel spiral views don't extrapolate view-dependent "
             "color (the reference ships this disabled as a commented-out "
             "block, `eval.py:192-193`; opt-in here)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="render compute dtype; bfloat16 enables the "
                             "fused Pallas eval kernels on TPU (float32 "
                             "matches the reference's eval numerics)")
    parser.add_argument("--planar_eval", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="planar no-grad eval path (in-kernel xyz, "
                             "(N,S)-plane boundaries). 'auto': taken with "
                             "--dtype bfloat16 on TPU; 'on': force the "
                             "planar kernel; 'off': packed eval path")
    parser.add_argument("--video_format", type=str, default="mp4",
                        choices=["mp4", "gif"])
    parser.add_argument("--fps", type=int, default=10)
    parser.add_argument("--save_depth", default=False, action="store_true")
    parser.add_argument("--depth_format", type=str, default="png")
    parser.add_argument("--jax_cache_dir", type=str, default="",
                        help="persistent XLA compilation cache directory; "
                             "repeat runs skip the first-compile cost")
    parser.add_argument(
        "--lpips_weights", type=str, default=None,
        help="path to a torch state dict of the lpips package's "
             "LPIPS(net='alex') module; enables real LPIPS numbers in "
             "offline environments (otherwise LPIPS prints n/a when the "
             "lpips package can't fetch pretrained weights)")
    return parser.parse_args(argv)


def load_params(args, cfg):
    """Load model params from an orbax dir or a reference PL .ckpt
    (`eval.py:143-170`)."""
    from nsff_pl_tpu.training import checkpoint as ckpt_lib
    from nsff_pl_tpu.training.trainer import build_params
    import jax

    init = build_params(cfg, jax.random.PRNGKey(0))
    if args.ckpt_path.endswith(".ckpt"):
        loaded = ckpt_lib.import_pl_checkpoint(args.ckpt_path)
        return ckpt_lib.merge_params(init, loaded)
    # orbax: either a full train state or bare params
    try:
        from nsff_pl_tpu.training.optim import make_optimizer
        from nsff_pl_tpu.training.step import TrainState
        import jax.numpy as jnp

        tx = make_optimizer(cfg, 1)
        abstract = {"state": TrainState(init, tx.init(init),
                                        jnp.zeros((), jnp.int32)),
                    "sampling_weights": np.zeros((1,), np.float32)}
        restored = ckpt_lib.restore_checkpoint(args.ckpt_path, abstract)
        return restored["state"].params
    except Exception as e:
        print(f"full-train-state restore failed "
              f"({type(e).__name__}: {str(e)[:300]}); "
              f"trying bare params", flush=True)
        try:
            restored = ckpt_lib.restore_checkpoint(args.ckpt_path,
                                                   {"params": init})
            return restored["params"]
        except Exception:
            raise SystemExit(
                "could not restore the checkpoint with either a full "
                "train-state or a bare-params structure. This is usually "
                "a model-shape mismatch: eval must be invoked with the "
                "same model flags as training (--use_viewdir --encode_a "
                "--encode_t --N_tau ... — compare "
                f"{args.ckpt_path.rstrip('/').rsplit('/', 1)[0]}"
                "/config.json)")


def save_depth_img(depth, h, w, dir_name, filename):
    import imageio.v2 as imageio

    from nsff_pl_tpu.utils import visualization as viz

    depth_pred = np.nan_to_num(np.asarray(depth).reshape(h, w))
    img = (viz.visualize_depth(depth_pred) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(dir_name, filename), img)
    return img


def main(args):
    import jax
    import jax.numpy as jnp

    from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache(getattr(args, "jax_cache_dir", ""))

    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.models.rendering import interpolate
    from nsff_pl_tpu.scene import scene_dict
    from nsff_pl_tpu.training import metrics as metrics_lib
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image
    from nsff_pl_tpu.training.trainer import render_config
    import imageio.v2 as imageio

    w, h = args.img_wh
    dataset = scene_dict[args.dataset_name](
        root_dir=args.root_dir, split=args.split, img_wh=(w, h),
        start_end=tuple(args.start_end))
    n_frames = dataset.N_frames

    cfg = NSFFConfig(
        root_dir=args.root_dir, img_wh=(w, h),
        start_end=(args.start_end[0], args.start_end[0] + n_frames),
        use_viewdir=args.use_viewdir, N_samples=args.N_samples,
        N_importance=args.N_importance, encode_a=args.encode_a, N_a=args.N_a,
        encode_t=args.encode_t, N_tau=args.N_tau, flow_scale=args.flow_scale,
        dtype=getattr(args, "dtype", "float32"),
        planar_eval=getattr(args, "planar_eval", "auto"))
    params = load_params(args, cfg)
    rcfg = render_config(cfg)

    dir_name = f"results/{args.dataset_name}/{args.scene_name}"
    os.makedirs(dir_name, exist_ok=True)

    # interpolation mode needs the flow/alpha/plane buffers
    # (eval.py:136-141)
    is_interp = (args.split.startswith("test_fixview")
                 and int(args.split.split("_")[-1][6:]) > 0)
    if is_interp:
        output_transient = True
        flow = ("fw", "bw")
        keys = ("rgb_fine", "depth_fine", "xyzs_fine", "zs_fine",
                "static_rgbs_fine", "static_alphas_fine",
                "transient_rgbs_fine", "transient_alphas_fine",
                "transient_flows_fw", "transient_flows_bw")
    else:
        output_transient = args.output_transient
        flow = ()
        keys = ("rgb_fine", "depth_fine")

    mesh = None
    if args.num_gpus > 1:
        from nsff_pl_tpu.parallel import make_mesh, replicated_sharding

        n = min(args.num_gpus, len(jax.devices()))
        mesh = make_mesh(n)
        args.chunk = max(n, args.chunk - args.chunk % n)
        # params replicate over the mesh (single-device-committed arrays
        # conflict with the in-jit ray sharding constraint)
        params = jax.device_put(params, replicated_sharding(mesh))
        print(f"mesh: {n} chips, rendering data-parallel over rays")
    render = make_render_fn(
        rcfg, test_time=True, output_transient=output_transient,
        output_transient_flow=flow,
        with_visibility=output_transient, keys=keys, mesh=mesh)
    from nsff_pl_tpu.models.rendering import planar_eval_decision
    engaged, why = planar_eval_decision(
        rcfg, output_transient and rcfg.encode_t)
    print(f"render path: {'planar fused kernel' if engaged else 'packed'}"
          + ("" if engaged else f" ({'; '.join(why)})"), flush=True)
    if rcfg.planar_eval == "on" and not engaged:
        import warnings
        warnings.warn(
            "--planar_eval on requested but the planar test path cannot "
            f"serve this configuration: {'; '.join(why)} — falling back "
            "to the packed path")
    rng = jax.random.PRNGKey(42)
    vis_K = jnp.asarray(dataset.K)

    fixed_view_dir = None
    if args.fix_view_dir and args.split.startswith("test_spiral"):
        # the reference's (commented-out) intent: embed every spiral frame
        # with the first pose's ray directions (`eval.py:192-193`)
        fixed_view_dir = jnp.asarray(
            dataset.test_item(0)["rays"][:, 3:6])
        print("fix_view_dir: view-dependence embedded with pose-0 ray "
              "directions for all frames", flush=True)

    def f(rays, ts, t_for_vis):
        """Chunked full-image render (eval.py:81-110) with test-time
        visibility culling against the training camera at time t."""
        vis_poses = (jnp.asarray(dataset.poses[t_for_vis:t_for_vis + 1])
                     if output_transient else None)
        return render_full_image(render, params, rays, ts, rng,
                                 chunk=args.chunk, vis_poses=vis_poses,
                                 vis_K=vis_K, view_dir=fixed_view_dir,
                                 # single-process: scan the chunk loop in
                                 # one dispatch (multi-process keeps the
                                 # host loop for replicated chunk inputs)
                                 scan_chunks=mesh is None
                                 or jax.process_count() == 1)

    if args.split == "test":
        psnrs = np.zeros((n_frames, 2))
        ssims = np.zeros((n_frames, 2))
        lpipss = np.full((n_frames, 2), np.nan)
        lpips_model = metrics_lib.get_lpips_model(args.lpips_weights)
        if lpips_model is None:
            print("LPIPS unavailable (no offline AlexNet-LPIPS weights in "
                  "this environment); reporting n/a — PSNR/SSIM are "
                  "unaffected (`metrics.py:35-49`)", flush=True)

    imgs, depths = [], []
    last_results = None
    n_items = len(dataset)
    for i in range(n_items):
        if args.split.startswith("test_fixview") and i == n_items - 1:
            # final frame: reuse the last t+1 render (eval.py:182-189)
            img_pred = np.clip(np.asarray(
                last_results["rgb_fine"]).reshape(h, w, 3), 0, 1)
            img_pred_ = (255 * img_pred).astype(np.uint8)
            imgs.append(img_pred_)
            imageio.imwrite(os.path.join(dir_name, f"{i:03d}_000.png"),
                            img_pred_)
            if args.save_depth:
                depths.append(save_depth_img(last_results["depth_fine"], h, w,
                                             dir_name, f"depth_{i:03d}_000.png"))
            sample = dataset.test_item(i)
        else:
            sample = dataset.test_item(i)
            rays = jnp.asarray(sample["rays"])
            ts = jnp.asarray(sample["ts"])
            t = int(sample["ts"][0])
            results = last_results if last_results is not None \
                else f(rays, ts, t)

            if args.split.startswith("test_fixview"):
                interp = int(args.split.split("_")[-1][6:])
                results_tp1 = f(rays, jnp.clip(ts + 1, 0, n_frames - 1),
                                min(t + 1, n_frames - 1))
                for dt in np.linspace(0, 1, interp + 1)[:-1]:
                    if dt == 0:
                        img_pred = np.asarray(
                            results["rgb_fine"]).reshape(h, w, 3)
                        depth_pred = results["depth_fine"]
                    else:
                        img_pred, depth_pred = interpolate(
                            results, results_tp1, float(dt),
                            jnp.asarray(dataset.Ks[sample["cam_ids"]]),
                            jnp.asarray(sample["c2w"]), (w, h))
                        img_pred = np.asarray(img_pred)
                    img_pred = np.clip(img_pred, 0, 1)
                    img_pred_ = (255 * img_pred).astype(np.uint8)
                    imgs.append(img_pred_)
                    imageio.imwrite(
                        os.path.join(dir_name, f"{i:03d}_{int(dt*100):03d}.png"),
                        img_pred_)
                    if args.save_depth:
                        depths.append(save_depth_img(
                            depth_pred, h, w, dir_name,
                            f"depth_{i:03d}_{int(dt*100):03d}.png"))
                last_results = results_tp1
            else:
                img_pred = np.clip(np.asarray(
                    results["rgb_fine"]).reshape(h, w, 3), 0, 1)
                img_pred_ = (255 * img_pred).astype(np.uint8)
                imgs.append(img_pred_)
                imageio.imwrite(os.path.join(dir_name, f"{i:03d}.png"),
                                img_pred_)
                if args.save_depth:
                    depths.append(save_depth_img(
                        results["depth_fine"], h, w, dir_name,
                        f"depth_{i:03d}.png"))

        if args.split == "test" and "rgbs" in sample:
            img_gt = sample["rgbs"].reshape(h, w, 3)
            gt_j, pr_j = jnp.asarray(img_gt), jnp.asarray(img_pred)
            psnrs[i, 0] = float(metrics_lib.psnr(gt_j, pr_j))
            ssims[i, 0] = float(metrics_lib.ssim(gt_j, pr_j))
            v = metrics_lib.lpips(lpips_model, img_gt, img_pred)
            lpipss[i, 0] = np.nan if v is None else v
            if "mask" in sample:
                mask = sample["mask"].reshape(h, w) == 0
                if mask.any():
                    psnrs[i, 1] = float(metrics_lib.psnr(gt_j, pr_j,
                                                         jnp.asarray(mask)))
                    sm = metrics_lib.ssim(gt_j, pr_j, reduction="none")
                    ssims[i, 1] = float(jnp.mean(jnp.asarray(sm)[mask]))
                    v = metrics_lib.lpips(lpips_model, img_gt, img_pred, mask)
                    lpipss[i, 1] = np.nan if v is None else v
        print(f"[{i+1}/{n_items}] rendered", flush=True)

    if args.split == "test":
        mean_psnr = np.nanmean(psnrs, 0)
        mean_ssim = np.nanmean(ssims, 0)
        mean_lpips = np.array([np.nan if np.isnan(c).all()
                               else np.nanmean(c) for c in lpipss.T])
        np.save(os.path.join(dir_name, "psnr.npy"), psnrs)
        np.save(os.path.join(dir_name, "ssim.npy"), ssims)
        np.save(os.path.join(dir_name, "lpips.npy"), lpipss)
        print("Score \t Whole image \t Dynamic only")
        print("-------------------------------------")
        print(f"PSNR  \t {mean_psnr[0]:.4f} \t {mean_psnr[1]:.4f}")
        print(f"SSIM  \t {mean_ssim[0]:.4f} \t {mean_ssim[1]:.4f}")
        def _fmt(v):
            return "n/a" if np.isnan(v) else f"{v:.4f}"

        print(f"LPIPS \t {_fmt(mean_lpips[0])} \t {_fmt(mean_lpips[1])}")

    video_path = os.path.join(dir_name,
                              f"{args.scene_name}.{args.video_format}")
    try:
        imageio.mimsave(video_path, imgs, fps=args.fps)
    except Exception as e:  # mp4 needs ffmpeg; fall back to gif
        alt = os.path.join(dir_name, f"{args.scene_name}.gif")
        print(f"video save failed ({e}); writing {alt}")
        imageio.mimsave(alt, imgs, fps=args.fps)
    if args.save_depth and depths:
        try:
            imageio.mimsave(
                os.path.join(dir_name,
                             f"depth_{args.scene_name}.{args.video_format}"),
                depths, fps=args.fps)
        except Exception:
            imageio.mimsave(
                os.path.join(dir_name, f"depth_{args.scene_name}.gif"),
                depths, fps=args.fps)


def cli(argv=None):
    """Console entry point (`nsff-eval`)."""
    main(get_opts(argv))


if __name__ == "__main__":
    cli()
