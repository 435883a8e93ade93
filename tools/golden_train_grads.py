#!/usr/bin/env python
"""Training-gradient golden (VERDICT r4 next-round #6).

Extends the render-only golden (`tools/golden_full_scale.py`) to the
TRAINING math: an independent float64 NumPy implementation of the
reference training forward — the 3-evaluation warped render
(`/root/reference/models/rendering.py:169-232`) — plus all 8 loss terms
with their schedules (`/root/reference/losses.py:72-171`), evaluated at
the full recipe shapes (S=128, 30 frames, N_tau=48, batch 512), and:

1. LOSS GOLDEN: every loss term of the jitted training loss (both the
   reference-shaped XLA f32 path and the planar fused Pallas bf16 path —
   the step the flagship recipe actually runs) asserted against the f64
   reference equations.
2. GRADIENT GOLDEN: central finite differences of the f64 reference
   loss on selected weight entries (one per tower/head + the time
   embedding) asserted against the jitted `jax.grad` of the same loss —
   the training-gradient counterpart of the render golden.

Run (TPU):  python tools/golden_train_grads.py
Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                python tools/golden_train_grads.py --quick
CI: tests/test_golden_train_grads.py runs --quick.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = 30
N_TAU = 48
Z_FAR = 0.95
LAMBDA_GEO_INIT = 0.04  # opt.py:47
LAMBDA_REG = 0.1        # losses.py:55
LAMBDA_ENT = 1e-3       # losses.py:61
EPOCH = 2


def _ndc2world_f64(x, y, z, K):
    """`datasets/ray_utils.py:127-151` componentwise, f64."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    rz = 2.0 / (z - 1 - 1e-6)
    return -rz * x * cx / fx, -rz * y * cy / fy, rz


def ref_train_loss(sd, rays_o, rays_d, ts_np, gt, disps, uv_fw_t, uv_bw_t,
                   K, Ps, s, epoch=EPOCH):
    """f64 reference-equation training loss. Returns a dict of scalar
    terms (+ 'total'). Forward: `rendering.py:169-232` train semantics
    (perturb=0, noise=0); terms: `losses.py:72-171`; schedules:
    `train.py:174-176` + `losses.py:90`."""
    from tests.test_golden_cross import (N_EMB_DIR, N_EMB_XYZ, S_EMB_DIR,
                                         S_EMB_XYZ, _np_static_tower,
                                         _np_transient_tower, np_posenc)

    n = rays_o.shape[0]
    softplus = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)  # noqa: E731

    zs = np.broadcast_to(np.linspace(0, 1, s), (n, s)).astype(np.float64)
    xyz = rays_o.astype(np.float64)[:, None] \
        + rays_d.astype(np.float64)[:, None] * zs[..., None]
    far = (zs.reshape(-1) > Z_FAR)[:, None]

    xyz_emb = np_posenc(xyz.reshape(-1, 3), N_EMB_XYZ, S_EMB_XYZ)
    dir_emb = np.repeat(
        np_posenc(rays_d.astype(np.float64), N_EMB_DIR, S_EMB_DIR), s, 0)
    emb_t = sd["embedding_t.weight"].astype(np.float64)
    t_rows = np.repeat(emb_t[ts_np], s, axis=0)

    static_rgbs, static_sigma = _np_static_tower(sd, xyz_emb, dir_emb)
    static_rgbs = static_rgbs.reshape(n, s, 3)
    tr = _np_transient_tower(sd, xyz_emb, t_rows)
    trans_rgbs = tr["rgb"].reshape(n, s, 3)
    flows_fw = np.where(far, 0.0, tr["fw"]).reshape(n, s, 3)
    flows_bw = np.where(far, 0.0, tr["bw"]).reshape(n, s, 3)

    deltas = zs[:, 1:] - zs[:, :-1]
    s_deltas = np.concatenate([deltas, 100 * np.ones_like(zs[:, :1])], -1)
    t_deltas = np.concatenate([deltas, 1e-3 * np.ones_like(zs[:, :1])], -1)
    static_alphas = 1 - np.exp(
        -s_deltas * softplus(static_sigma.reshape(n, s)))
    transient_alphas = 1 - np.exp(
        -t_deltas * softplus(tr["sigma"].reshape(n, s)))
    alphas = 1 - (1 - static_alphas) * (1 - transient_alphas)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alphas[:, :1]), 1 - alphas[:, :-1]], -1), -1)
    sw = static_alphas * trans
    tw = transient_alphas * trans
    w = alphas * trans

    rgb_fine = (sw[..., None] * static_rgbs
                + tw[..., None] * trans_rgbs).sum(1)
    depth = (w * zs).sum(1)

    def warped(xyz_w, t_idx, flow_out):
        """`render_transient_warping` (`rendering.py:98-140`): warped
        transient vs the CURRENT static field, shared transmittance."""
        emb_rows = np.repeat(emb_t[t_idx], s, axis=0)
        xw_emb = np_posenc(xyz_w.reshape(-1, 3), N_EMB_XYZ, S_EMB_XYZ)
        trw = _np_transient_tower(sd, xw_emb, emb_rows, flows=(flow_out,))
        flows_w = np.where(far, 0.0, trw[flow_out]).reshape(n, s, 3)
        ta_w = 1 - np.exp(-t_deltas * softplus(trw["sigma"].reshape(n, s)))
        a_w = 1 - (1 - static_alphas) * (1 - ta_w)
        tr_w = np.cumprod(np.concatenate(
            [np.ones_like(a_w[:, :1]), 1 - a_w[:, :-1]], -1), -1)
        sw_w = static_alphas * tr_w
        tw_w = ta_w * tr_w
        rgb_w = (sw_w[..., None] * static_rgbs).sum(1) \
            + (tw_w[..., None] * trw["rgb"].reshape(n, s, 3)).sum(1)
        return rgb_w, flows_w, tw_w

    xyz_fw = xyz + flows_fw
    rgb_fw, flows_fw_bw, tw_fw = warped(
        xyz_fw, np.minimum(ts_np + 1, N_FRAMES - 1), "bw")
    xyz_bw = xyz + flows_bw
    rgb_bw, flows_bw_fw, tw_bw = warped(
        xyz_bw, np.maximum(ts_np - 1, 0), "fw")
    disocc_fw = 1 - np.abs((tw_fw - tw).sum(1))[:, None]
    disocc_bw = 1 - np.abs((tw_bw - tw).sum(1))[:, None]
    disoccs_fw = 1 - np.abs(tw_fw - tw)
    disoccs_bw = 1 - np.abs(tw_bw - tw)

    # ---- the 8 loss terms (losses.py:72-171) ----
    lambda_geo = LAMBDA_GEO_INIT * 0.1 ** (epoch // 10)
    terms = {}
    terms["col_l"] = ((rgb_fine - gt) ** 2).mean()

    t_pred = np.median(depth)
    s_pred = np.abs(depth - t_pred).mean()
    t_gt = np.median(-disps)
    s_gt = np.abs(-disps - t_gt).mean()
    terms["disp_l"] = lambda_geo * (
        ((depth - t_pred) / s_pred - (-disps - t_gt) / s_gt) ** 2).mean()

    terms["entropy_l"] = LAMBDA_ENT * (
        (-tw * np.log(tw + 1e-8)).sum(1)).mean()
    w_ce = LAMBDA_ENT / 5 * min(epoch / 10.0, 1.0)  # losses.py:90 ramp
    terms["cross_entropy_l"] = w_ce * (
        (tw * np.log(sw + 1e-8)).sum(1)).mean()  # thickness=1: no dilation

    xyz_fine_map = (w[..., None] * xyz).sum(1)
    xyz_fw_map = xyz_fine_map + (w[..., None] * flows_fw).sum(1)
    xyz_bw_map = xyz_fine_map + (w[..., None] * flows_bw).sum(1)

    def flow_term(xyz_map, t_idx, target, valid_t):
        wx, wy, wz = _ndc2world_f64(xyz_map[:, 0], xyz_map[:, 1],
                                    xyz_map[:, 2], K)
        P = Ps[t_idx]  # (n, 3, 4)
        xyzw = np.stack([wx, wy, wz, np.ones_like(wx)], -1)
        uvd = np.einsum("nij,nj->ni", P, xyzw)
        uv = uvd[:, :2] / (np.abs(uvd[:, 2:]) + 1e-8)
        valid = ((uvd[:, 2] > 0) & valid_t).astype(np.float64)
        per_ray = np.abs(uv - target).mean(-1)
        return (lambda_geo / 2) * (per_ray * valid).sum() \
            / max(valid.sum(), 1.0)

    terms["flow_fw_l"] = flow_term(
        xyz_fw_map, np.minimum(ts_np + 1, N_FRAMES - 1), uv_fw_t,
        ts_np < N_FRAMES - 1)
    terms["flow_bw_l"] = flow_term(
        xyz_bw_map, np.maximum(ts_np - 1, 0), uv_bw_t, ts_np > 0)

    pho = (disocc_fw * (rgb_fw - gt) ** 2 / disocc_fw.mean()
           + disocc_bw * (rgb_bw - gt) ** 2 / disocc_bw.mean())
    terms["pho_l"] = pho.mean(-1).mean()

    cyc = (disoccs_fw[..., None]
           * np.abs(xyz_fw + flows_fw_bw - xyz) / disoccs_fw.mean()
           + disoccs_bw[..., None]
           * np.abs(xyz_bw + flows_bw_fw - xyz) / disoccs_bw.mean())
    terms["cyc_l"] = cyc.mean((1, 2)).mean()

    n_near = int(s * Z_FAR)  # losses.py:143-146 static slice
    sl = np.s_[:, :n_near]

    def to_world(p):
        wx, wy, wz = _ndc2world_f64(p[sl + (0,)], p[sl + (1,)],
                                    p[sl + (2,)], K)
        return np.stack([wx, wy, wz], -1)

    xw = to_world(xyz)
    fww = to_world(xyz_fw)
    bww = to_world(xyz_bw)
    terms["reg_temp_sm_l"] = LAMBDA_REG * np.abs(
        fww + bww - 2 * xw).mean((1, 2)).mean()
    terms["reg_min_l"] = LAMBDA_REG * (
        np.abs(fww - xw) + np.abs(bww - xw)).mean((1, 2)).mean()
    d = np.linalg.norm(xw[:, 1:] - xw[:, :-1], axis=-1, keepdims=True)
    sp_w = np.exp(-2 * d)
    sf_fw, sf_bw = fww - xw, bww - xw
    terms["reg_sp_sm_l"] = LAMBDA_REG * (
        np.abs(sf_fw[:, 1:] - sf_fw[:, :-1]) * sp_w
        + np.abs(sf_bw[:, 1:] - sf_bw[:, :-1]) * sp_w).mean((1, 2)).mean()

    terms["total"] = sum(terms.values())
    return terms


# FD probe entries: (torch sd key, (row, col) in torch (out, in) layout,
# ours key). Gradient lookup transposes for weights.
FD_ENTRIES = [
    ("nerf_fine.static_xyz_encoding_1.0.weight", (0, 0), "static_xyz_0"),
    ("nerf_fine.static_sigma.weight", (0, 5), "static_sigma"),
    ("nerf_fine.static_rgb.0.weight", (1, 3), "static_rgb"),
    ("nerf_fine.transient_xyz_encoding_1.0.weight", (2, 7),
     "transient_xyz_0"),
    ("nerf_fine.transient_sigma.weight", (0, 11), "transient_sigma"),
    ("nerf_fine.transient_rgb.0.weight", (2, 9), "transient_rgb"),
    ("nerf_fine.transient_flow_fw.0.weight", (1, 13),
     "transient_flow_fw"),
    ("nerf_fine.transient_flow_bw.0.weight", (0, 4), "transient_flow_bw"),
    ("embedding_t.weight", (3, 5), None),
]


def run(quick=False, ckpt="/tmp/golden_train.ckpt", fd_h=2e-5):
    import jax
    import jax.numpy as jnp

    from tests.test_golden_cross import make_torch_ckpt
    from nsff_pl_tpu.models.raymarch import render_train_planar
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
    from nsff_pl_tpu.training.checkpoint import import_pl_checkpoint
    from nsff_pl_tpu.training.loss import (LossConfig, compute_losses,
                                           compute_losses_planar,
                                           total_loss)

    n, s = (64, 16) if quick else (512, 128)
    w_img, h_img = 512, 288
    print(f"train-gradient golden: batch {n}, S={s}, {N_FRAMES} frames, "
          f"N_tau={N_TAU}, backend={jax.default_backend()}", flush=True)

    rng = np.random.RandomState(13)
    sd = {k: v.astype(np.float64) for k, v in
          make_torch_ckpt(ckpt, rng, n_tau=N_TAU, n_frames=N_FRAMES)
          .items()}

    rays_o = rng.uniform(-0.5, 0.5, (n, 3))
    rays_o[:, 2] = -1.0
    rays_d = rng.uniform(-0.2, 0.2, (n, 3))
    rays_d[:, 2] = 2.0
    ts_np = rng.randint(0, N_FRAMES, (n,))
    gt = rng.rand(n, 3)
    disps = rng.rand(n)
    uv_fw_t = rng.uniform(-2, 2, (n, 2))
    uv_bw_t = rng.uniform(-2, 2, (n, 2))
    f = 500.0 * w_img / 960
    K = np.array([[f, 0, w_img / 2], [0, f, h_img / 2], [0, 0, 1]],
                 np.float64)
    # per-frame projection matrices with a small camera motion
    Ps = np.tile(np.eye(3, 4), (N_FRAMES, 1, 1))
    Ps[:, 0, 3] = 0.01 * np.arange(N_FRAMES)
    Ps = K @ Ps

    t0 = time.time()
    ref = ref_train_loss(sd, rays_o, rays_d, ts_np, gt, disps,
                         uv_fw_t, uv_bw_t, K, Ps, s)
    print(f"f64 reference loss ({time.time() - t0:.1f}s): "
          + " ".join(f"{k}={v:.6f}" for k, v in ref.items()), flush=True)

    # ---- jitted losses -------------------------------------------------
    batch = {
        "rays": jnp.asarray(np.concatenate([rays_o, rays_d], -1),
                            jnp.float32),
        "ts": jnp.asarray(ts_np, jnp.int32),
        "rgbs": jnp.asarray(gt, jnp.float32),
        "disps": jnp.asarray(disps, jnp.float32),
        "cam_ids": jnp.zeros((n,), jnp.int32),
        "uv_fw": jnp.asarray(uv_fw_t, jnp.float32),
        "uv_bw": jnp.asarray(uv_bw_t, jnp.float32),
    }
    Ks_j = jnp.asarray(K[None], jnp.float32)
    Ps_j = jnp.asarray(Ps[None], jnp.float32)
    lcfg = LossConfig(max_t=N_FRAMES - 1)
    key = jax.random.PRNGKey(0)

    def make_loss(tag):
        planar = tag.startswith("planar")
        cfg = RenderConfig(
            N_samples=s, N_importance=0, perturb=0.0, noise_std=0.0,
            use_viewdir=True, encode_t=True, N_tau=N_TAU,
            max_t=N_FRAMES - 1, img_wh=(w_img, h_img),
            compute_dtype="bfloat16" if planar else "float32",
            train_backend="pallas" if planar else "xla",
            fused_train="on" if planar else "off",
            planar_compositing="on" if planar else "auto")

        def loss_terms(params):
            models = {"fine": params["nerf_fine"]}
            emb = {"t": params["embedding_t"]}
            if planar:
                res = render_train_planar(models["fine"], emb,
                                          batch["rays"], batch["ts"],
                                          key, cfg)
                return compute_losses_planar(res, batch, lcfg, epoch=EPOCH,
                                             Ks=Ks_j, Ps=Ps_j)
            res = render_rays(models, emb, batch["rays"], batch["ts"],
                              key, cfg, test_time=False,
                              output_transient=True,
                              output_transient_flow=("fw", "bw", "disocc"))
            return compute_losses(res, batch, lcfg, epoch=EPOCH,
                                  output_transient_flow=("fw", "bw"),
                                  Ks=Ks_j, Ps=Ps_j)

        return loss_terms

    params = import_pl_checkpoint(ckpt)
    failures = []
    grads = {}
    backends = [("xla-f32", 2e-3), ("planar-bf16", 6e-2)]
    for tag, tol in backends:
        loss_terms = make_loss(tag)
        terms = {k: float(v) for k, v in
                 jax.jit(loss_terms)(params).items()}
        terms["total"] = sum(terms.values())
        print(f"[{tag}] " + " ".join(f"{k}={v:.6f}"
                                     for k, v in sorted(terms.items())),
              flush=True)
        for k, want in ref.items():
            if k == "total":
                continue
            got = terms[k]
            err = abs(got - want)
            ok = err <= tol * max(abs(want), 0.01)
            if not ok:
                failures.append((tag, k, got, want))
            print(f"[{tag}] {k:16s} got {got:.6f} want {want:.6f} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
        g = jax.jit(jax.grad(lambda p: total_loss(loss_terms(p))))(params)
        grads[tag] = jax.tree.map(lambda x: np.asarray(x, np.float64), g)

    # ---- finite-difference gradient golden ----------------------------
    def fd_grad(key_name, rc):
        base = sd[key_name][rc]
        out = []
        for sign in (+1, -1):
            sd[key_name][rc] = base + sign * fd_h
            out.append(ref_train_loss(sd, rays_o, rays_d, ts_np, gt,
                                      disps, uv_fw_t, uv_bw_t, K, Ps,
                                      s)["total"])
        sd[key_name][rc] = base
        return (out[0] - out[1]) / (2 * fd_h)

    print("finite-difference gradient checks "
          f"(h={fd_h:g}):", flush=True)
    fd_vals, ad_vals = {}, {}
    for key_name, (r, c), ours in FD_ENTRIES:
        t0 = time.time()
        fd = fd_grad(key_name, (r, c))
        for tag, _ in backends:
            g = grads[tag]
            if ours is None:
                ad = g["embedding_t"][r, c]
            else:
                ad = g["nerf_fine"][ours]["w"][c, r]  # (in,out) layout
            fd_vals.setdefault(tag, []).append(fd)
            ad_vals.setdefault(tag, []).append(ad)
            print(f"  {key_name}[{r},{c}] fd={fd:+.6e} "
                  f"{tag}-autodiff={ad:+.6e} ({time.time() - t0:.1f}s)",
                  flush=True)

    # tolerances calibrated on the measured worst cases (quick/CPU:
    # xla 6.9e-3, planar 2.7e-2): f32 accumulation through the 8-layer
    # towers + warp-composite cancellations carries ~1e-2-relative noise
    # vs the f64 FD; an equation error (sign/scale/term mixup) lands
    # orders of magnitude above these bounds
    for tag, tol in (("xla-f32", 2e-2), ("planar-bf16", 1e-1)):
        fd = np.asarray(fd_vals[tag])
        ad = np.asarray(ad_vals[tag])
        scale = max(np.abs(fd).max(), 1e-6)
        rel = np.abs(fd - ad) / scale
        worst = float(rel.max())
        ok = worst <= tol
        print(f"[{tag}] gradient golden: worst rel err {worst:.2e} "
              f"(tol {tol:g}, scale {scale:.2e}) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append((tag, "grad", worst))

    if failures:
        raise SystemExit(f"training-gradient golden FAILED: {failures}")
    print("training-gradient golden: ALL OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="batch 64, S=16 (CPU smoke / CI)")
    ap.add_argument("--fd_h", type=float, default=2e-5)
    args = ap.parse_args()
    run(quick=args.quick, fd_h=args.fd_h)
