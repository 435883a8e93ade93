"""Planar fused train-path renderer.

Train-only counterpart of `models/rendering.py::render_rays` built on the
dense-boundary kernels of `ops/raymarch_kernel.py`. Semantics are the
reference's training forward — stratified sampling, dual-field additive
compositing, 3-frame scene-flow warping, disocclusion
(`/root/reference/models/rendering.py:52-300`) — but every per-sample
quantity lives as dense (N, S) planes (S = N_samples fills the TPU lane
width exactly) instead of lane-padded (N, S, 3)/(N, S, 16) arrays, and
sample positions never materialize: the kernels assemble xyz = o + d*z
(+ flow) internally.

Scope: the flagship training recipe (README.md:227-234) — transient
branch with fw+bw flows — plus coarse-to-fine when the fine pass stays
lane-aligned ((N_samples + 2*N_importance) % 128 == 0; the coarse pass
runs a second planar evaluation and PDF-resampled zs feed the fine pass
as an external (N, S_fine) plane). Everything outside the envelope
(`planar_unapplicable_reasons`) uses `render_rays`, which remains the
reference-shaped implementation. Equivalence of the two paths is
asserted in tests/test_planar_path.py and tests/test_planar_c2f.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.rendering import RenderConfig, Z_FAR
from nsff_pl_tpu.ops import compositing as cp
from nsff_pl_tpu.ops.compositing_planar_kernel import make_planar_compositor
from nsff_pl_tpu.ops.posenc import posenc
from nsff_pl_tpu.ops.raymarch_kernel import (comp_map_cols,
                                             make_planar_nerf_eval_comp,
                                             make_planar_nerf_train)
from nsff_pl_tpu.ops.sampling import sample_pdf, stratified_zs


LANE_REASON = "N_samples not a multiple of the 128 TPU lane width"


def comp_eval_keys(output_transient: bool, flow) -> frozenset:
    """Result keys the composited no-grad kernel can serve per-ray
    (`ops/raymarch_kernel.py::make_planar_nerf_eval_comp`). A caller key
    filter that is a SUBSET of this set routes through the in-kernel
    compositor — one (N, M<=21) maps write instead of 8-14 (N, S) planes
    + the XLA compositing epilogue (round-5 render-floor work)."""
    ks = {"rgb_fine", "depth_fine"}
    if output_transient:
        ks |= {"transient_rgb_fine", "transient_alpha_fine",
               "_static_rgb_fine", "_static_depth_fine"}
        if "fw" in flow and "bw" in flow:
            ks |= {"xyz_fine", "transient_flow_fw", "transient_flow_bw",
                   "xyz_fw", "xyz_bw"}
    return frozenset(ks)


def planar_unapplicable_reasons(cfg: RenderConfig, output_transient: bool,
                                output_transient_flow) -> list:
    """Why the planar path does NOT cover this configuration (empty list
    = applicable). One implementation owns both the decision and the
    user-facing explanation (the trainer's loud-fallback message)."""
    flow = tuple(output_transient_flow)
    reasons = []
    if not (cfg.encode_t and output_transient):
        reasons.append("no transient branch")
    if not ("fw" in flow and "bw" in flow):
        reasons.append("fw+bw flows not both requested")
    if jax.default_backend() != "cpu":
        if cfg.N_samples % 128 != 0:
            reasons.append(f"N_samples={cfg.N_samples}: {LANE_REASON}")
        if cfg.N_importance > 0:
            # fine pass renders N_samples + 2*N_importance sorted samples
            # (static + transient importance draws, `rendering.py:326-348`)
            s_fine = cfg.N_samples + 2 * cfg.N_importance
            if s_fine % 128 != 0:
                reasons.append(
                    f"coarse-to-fine fine pass S={s_fine}: {LANE_REASON} "
                    f"(needs (N_samples + 2*N_importance) % 128 == 0)")
    return reasons


def planar_applicable(cfg: RenderConfig, output_transient: bool,
                      output_transient_flow) -> bool:
    """The planar path covers the flagship train configuration (and its
    coarse-to-fine variant when the fine pass stays lane-aligned).

    On real TPU the plane layout additionally needs S = N_samples to be a
    multiple of the 128-lane width: the kernels' (C, R, S) plane reshapes
    only lower in Mosaic when the minor dim stays lane-aligned (S=32
    fails with an unsupported tpu.reshape). Other sample counts fall back
    to the packed-boundary kernels."""
    return not planar_unapplicable_reasons(cfg, output_transient,
                                           output_transient_flow)


def test_planar_unapplicable_reasons(cfg: RenderConfig,
                                     output_transient: bool) -> list:
    """Why the planar TEST path does not cover this configuration (empty
    = applicable). Unlike the train gate, flows are optional here: the
    test path never warps (`/root/reference/models/rendering.py:217`
    gate), so fw/bw only add head outputs. `output_transient=False`
    (the eval CLI's default test protocol, `/root/reference/eval.py:61`)
    renders the static tower only — covered with a single-field
    composite and one importance draw."""
    reasons = []
    if jax.default_backend() != "cpu":
        if cfg.N_samples % 128 != 0:
            reasons.append(f"N_samples={cfg.N_samples}: {LANE_REASON}")
        if cfg.N_importance > 0:
            # the fine pass renders the sorted union of the stratified
            # zs + one importance draw per rendered field: static +
            # transient when output_transient, static-only otherwise
            # (`rendering.py:326-348`)
            n_draws = 2 if output_transient else 1
            s_fine = cfg.N_samples + n_draws * cfg.N_importance
            if s_fine % 128 != 0:
                reasons.append(
                    f"coarse-to-fine fine pass S={s_fine}: {LANE_REASON} "
                    f"(needs (N_samples + {n_draws}*N_importance) % 128"
                    " == 0)")
    return reasons


def _visibility_planes(o, d, zs, K, img_wh, c2ws):
    """`ops.rays.compute_world_visibility` of every sample point, on
    (N, S) component planes (no (N*S, 3) point list materializes; the
    minor-dim-3 layout lane-pads 3->128 in HBM). Reproduces
    `ray_utils.py:154-181` + the `ndc2world` pre-step the test path
    applies (`models/rendering.py:191-200`)."""
    w_img, h_img = img_wh
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    X = o[:, 0:1] + d[:, 0:1] * zs
    Y = o[:, 1:2] + d[:, 1:2] * zs
    Z = o[:, 2:3] + d[:, 2:3] * zs
    # ndc2world, componentwise (ops/rays.py:89-105)
    rz = 2.0 / (Z - 1 - 1e-6)
    wx, wy, wz = -rz * X * cx / fx, -rz * Y * cy / fy, rz

    c2ws = jnp.asarray(c2ws)
    C = c2ws.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (C, 4, 4))
    w2c = jnp.linalg.inv(eye.at[:, :3].set(c2ws))
    R, t = w2c[:, :3, :3], w2c[:, :3, 3]
    vis = jnp.zeros_like(zs)
    for c in range(C):  # C is 1 in the eval CLI (current frame's camera)
        px = R[c, 0, 0] * wx + R[c, 0, 1] * wy + R[c, 0, 2] * wz + t[c, 0]
        py = R[c, 1, 0] * wx + R[c, 1, 1] * wy + R[c, 1, 2] * wz + t[c, 1]
        pz = R[c, 2, 0] * wx + R[c, 2, 1] * wy + R[c, 2, 2] * wz + t[c, 2]
        in_front = pz < 0
        # flip to "right down front" (ray_utils.py:176): (px, -py, -pz)
        uu = fx * px + cx * -pz
        vv = fy * -py + cy * -pz
        dd = -pz
        denom = jnp.where(jnp.abs(dd) < 1e-8,
                          jnp.sign(dd) * 1e-8 + 1e-12, dd)
        u, v = uu / denom, vv / denom
        inside = ((u >= 0) & (u < w_img) & (v >= 0) & (v < h_img)
                  & in_front)
        vis = vis + inside.astype(jnp.float32)
    return vis


def render_test_planar(
    params_fine: nerf_m.Params,
    embeddings: Dict[str, jnp.ndarray],
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    rng: jax.Array,
    cfg: RenderConfig,
    *,
    params_coarse: nerf_m.Params = None,
    output_transient: bool = True,
    output_transient_flow=(),
    vis_poses=None,
    vis_K=None,
    view_dir=None,
    mesh=None,
    keys=None,
) -> Dict[str, jnp.ndarray]:
    """Test-time (no-grad) renderer on the planar fused kernel.

    `keys`, when given (the caller's result filter,
    `training/step.py::make_render_fn`), enables the composited kernel
    route when every requested key is per-ray (`comp_eval_keys`): the
    volume compositing runs INSIDE the evaluation kernel and only an
    (N, M<=21) maps tile crosses to HBM. Gated off by
    `cfg.planar_compositing == 'off'`.

    Same semantics and result keys as `render_rays(test_time=True)` over
    the planar envelope (`test_planar_unapplicable_reasons`): ONE
    dual-tower evaluation per sample — the reference's test path skips
    the warped renders (`/root/reference/models/rendering.py:217`) but
    keeps the flow heads — plus visibility culling (`rendering.py:191-200`)
    and all composite maps (`rendering.py:256-295`). With
    `output_transient=False` (the eval CLI's default test protocol,
    `/root/reference/eval.py:61,140`) only the static tower evaluates and
    composites, exactly like the packed path's single-field branch
    (`models/rendering.py` inference with output_transient=False). Every
    per-sample quantity is a dense (N, S) plane; the (N, S, 3) result
    keys are assembled at the end and DCE'd by XLA when the caller's key
    filter drops them (`training/step.py::make_render_fn` filters inside
    jit).

    Vs the packed eval path this avoids materializing xyz (N, S, 3) and
    the packed (rows, 16) kernel output — both lane-pad their minor dim
    to 128 in HBM (a 42x/8x physical blowup read and written once per
    chunk)."""
    n = rays.shape[0]
    S = cfg.N_samples
    o, d = rays[:, 0:3], rays[:, 3:6]
    flow = (tuple(f for f in output_transient_flow if f in ("fw", "bw"))
            if output_transient else ())
    use_viewdir = cfg.use_viewdir
    dir_src = view_dir if view_dir is not None else d
    dir_emb = (posenc(dir_src, cfg.S_emb_dir, cfg.N_emb_dir)
               if use_viewdir else None)
    # same key-split structure as `render_rays` (the pdf keys are unused
    # at test time — perturb=0 makes the draws det — but kept symmetric)
    k_perturb, k_pdf_s, k_pdf_t, _k_rest = jax.random.split(rng, 4)
    zs, zs_mid = stratified_zs(k_perturb, n, S, 0.0)  # test time: perturb=0
    t_emb = (nerf_m.embedding_lookup(embeddings["t"], ts)
             if output_transient else None)
    encode_a = cfg.encode_a and "a" in embeddings and ts is not None
    a_emb = nerf_m.embedding_lookup(embeddings["a"], ts) if encode_a else None
    kker = dict(n_emb_xyz=cfg.N_emb_xyz, s_emb_xyz=cfg.S_emb_xyz,
                n_emb_dir=cfg.N_emb_dir, n_a=cfg.N_a, n_tau=cfg.N_tau,
                flow_scale=cfg.flow_scale,
                # round-5 v5e sweeps of the no-grad fwd at 8192-ray
                # chunks (tools/probe_render_floor.py): the DUAL-tower op
                # wants 2048-row blocks (17.4 vs 19.3 ms at 4096) like
                # the train main op; the single-tower static-only op has
                # half the MXU work per row and wants the 4096 the warp
                # fwd prefers (static frames regressed 0.184->0.193 s on
                # 2048)
                block_rows=2048 if output_transient else 4096)

    res: Dict[str, jnp.ndarray] = {}
    if cfg.N_importance > 0:
        # coarse-to-fine at test time (`rendering.py:151-162,326-348`):
        # a planar evaluation of the COARSE model at the stratified zs
        # (the packed path computes sigma-only; the planar kernel's rgb
        # heads are one extra layer and its output stays dense), its own
        # noise-free composite, then DETERMINISTIC static + transient PDF
        # draws feed the fine pass as an external sorted zs plane. Result
        # keys mirror the packed test path's coarse set exactly (no
        # *_rgbs_coarse — the packed coarse pass is sigma-only).
        if params_coarse is None:
            raise ValueError(
                "N_importance > 0 needs params_coarse (the coarse model)")
        coarse_op = make_planar_nerf_train(
            S, use_viewdir=use_viewdir, encode_a=False,
            encode_t=output_transient, output_flow=(), **kker)
        if mesh is not None:
            coarse_op = _shard_planar(coarse_op, mesh)
        cout = coarse_op(params_coarse, o, d, zs, None, dir_emb, None, t_emb)
        d_s_c, d_t_c = cp.deltas_from_zs(zs)
        tau_s_c = d_s_c * cp.softplus(cout["ssig"])
        res["zs_coarse"] = zs
        res["xyzs_coarse"] = jnp.stack(
            [o[:, c:c + 1] + d[:, c:c + 1] * zs for c in range(3)], -1)
        res["static_sigmas_coarse"] = cp.softplus(cout["ssig"])
        zs_list = [zs]
        if output_transient:
            tsig_c = cout["tsig"]
            if vis_poses is not None:
                vis_c = _visibility_planes(o, d, zs, jnp.asarray(vis_K),
                                           cfg.img_wh, vis_poses)
                tsig_c = jnp.where(vis_c == 0, -10.0, tsig_c)
            tau_t_c = d_t_c * cp.softplus(tsig_c)
            trans_c = cp.transmittance_from_taus(tau_s_c + tau_t_c)
            sw_c = (1.0 - jnp.exp(-tau_s_c)) * trans_c
            tw_c = (1.0 - jnp.exp(-tau_t_c)) * trans_c
            res["transient_sigmas_coarse"] = cp.softplus(tsig_c)
            res["static_alphas_coarse"] = 1.0 - jnp.exp(-tau_s_c)
            res["transient_alphas_coarse"] = 1.0 - jnp.exp(-tau_t_c)
            res["static_weights_coarse"] = sw_c
            res["transient_weights_coarse"] = tw_c
            res["weights_coarse"] = (
                1.0 - jnp.exp(-(tau_s_c + tau_t_c))) * trans_c
        else:
            # single-field composite (`models/rendering.py` inference,
            # output_transient=False: static_weights_coarse = weights)
            trans_c = cp.transmittance_from_taus(tau_s_c)
            sw_c = (1.0 - jnp.exp(-tau_s_c)) * trans_c
            res["static_weights_coarse"] = sw_c
        zs_static = sample_pdf(k_pdf_s, zs_mid, sw_c[:, 1:-1],
                               cfg.N_importance, det=True)
        res["static_zs_fine"] = zs_static
        zs_list.append(zs_static)
        if output_transient:
            zs_transient = sample_pdf(k_pdf_t, zs_mid, tw_c[:, 1:-1],
                                      cfg.N_importance, det=True)
            res["transient_zs_fine"] = zs_transient
            zs_list.append(zs_transient)
        zs = jnp.sort(jnp.concatenate(zs_list, -1), -1)
    Sf = zs.shape[1]  # fine-pass sample count (= S when N_importance == 0)

    use_comp = (keys is not None and cfg.planar_compositing != "off"
                and set(keys) <= comp_eval_keys(output_transient, flow))
    if use_comp:
        vis_pl = None
        if output_transient and vis_poses is not None:
            vis_pl = _visibility_planes(o, d, zs, jnp.asarray(vis_K),
                                        cfg.img_wh, vis_poses)
        comp_op = make_planar_nerf_eval_comp(
            Sf, use_viewdir=use_viewdir, encode_a=encode_a,
            encode_t=output_transient, output_flow=flow,
            vis_in=vis_pl is not None, z_far=Z_FAR, **kker)
        if mesh is not None:
            comp_op = _shard_planar(comp_op, mesh)
        maps = comp_op(params_fine, o, d, zs, vis_pl, dir_emb, a_emb, t_emb)
        cols, _ = comp_map_cols(encode_t=output_transient,
                                flow=("fw" in flow and "bw" in flow))

        def col(name):
            s, w_ = cols[name]
            return maps[:, s] if w_ == 1 else maps[:, s:s + w_]

        res["rgb_fine"] = col("rgb_fine")
        res["depth_fine"] = col("depth_fine")
        if output_transient:
            t_alpha = col("transient_alpha")
            res["transient_alpha_fine"] = t_alpha
            # gray background for the transient-only view
            # (`rendering.py:264-265`)
            res["transient_rgb_fine"] = (col("transient_rgb_map")
                                         + 0.8 * (1.0 - t_alpha[:, None]))
            res["_static_rgb_fine"] = col("_static_rgb_fine")
            res["_static_depth_fine"] = col("_static_depth_fine")
            if "fw" in flow and "bw" in flow:
                res["xyz_fine"] = col("xyz_fine")
                res["transient_flow_fw"] = col("transient_flow_fw")
                res["transient_flow_bw"] = col("transient_flow_bw")
                res["xyz_fw"] = res["xyz_fine"] + res["transient_flow_fw"]
                res["xyz_bw"] = res["xyz_fine"] + res["transient_flow_bw"]
        return res

    op = make_planar_nerf_train(
        Sf, use_viewdir=use_viewdir, encode_a=encode_a,
        encode_t=output_transient, output_flow=flow, **kker)
    if mesh is not None:
        op = _shard_planar(op, mesh)
    out = op(params_fine, o, d, zs, None, dir_emb, a_emb, t_emb)

    res["zs_fine"] = zs
    xyz = tuple(o[:, c:c + 1] + d[:, c:c + 1] * zs for c in range(3))
    srgb = (out["srgb_r"], out["srgb_g"], out["srgb_b"])

    if not output_transient:
        # single-field composite (`models/rendering.py` inference,
        # output_transient=False path: static_weights_fine = weights,
        # rgb = sum(w * static_rgbs))
        d_s, _d_t = cp.deltas_from_zs(zs)
        tau_s = d_s * cp.softplus(out["ssig"])
        w = (1.0 - jnp.exp(-tau_s)) * cp.transmittance_from_taus(tau_s)
        res["rgb_fine"] = jnp.stack([jnp.sum(w * c, -1) for c in srgb], -1)
        res["depth_fine"] = jnp.sum(w * zs, -1)
        res["xyzs_fine"] = jnp.stack(xyz, -1)
        res["static_rgbs_fine"] = jnp.stack(srgb, -1)
        res["static_sigmas_fine"] = cp.softplus(out["ssig"])
        res["static_weights_fine"] = w
        return res

    tsig_raw = out["tsig"]
    if vis_poses is not None:
        vis = _visibility_planes(o, d, zs, jnp.asarray(vis_K), cfg.img_wh,
                                 vis_poses)
        tsig_raw = jnp.where(vis == 0, -10.0, tsig_raw)

    d_s, d_t = cp.deltas_from_zs(zs)
    tau_s = d_s * cp.softplus(out["ssig"])
    tau_t = d_t * cp.softplus(tsig_raw)
    static_sigmas = cp.softplus(out["ssig"])
    transient_sigmas = cp.softplus(tsig_raw)
    static_alphas = 1.0 - jnp.exp(-tau_s)
    transient_alphas = 1.0 - jnp.exp(-tau_t)

    trgb = (out["trgb_r"], out["trgb_g"], out["trgb_b"])
    use_ck = (cfg.planar_compositing == "on"
              or (cfg.planar_compositing == "auto"
                  and jax.default_backend() != "cpu"))
    if use_ck:
        # fused compositor (one read/write per plane instead of ~15 XLA
        # elementwise fusions — the same kernel the train path uses,
        # ops/compositing_planar_kernel.py). The warp slots carry the
        # main planes (their outputs are unused; no grad at test time),
        # noises are zero (test-time semantics, `rendering.py:202-248`).
        zero = jnp.zeros_like(zs)
        comp_in = {"zs": zs, "ssig": out["ssig"], "tsig": tsig_raw,
                   "tsig_w1": tsig_raw, "tsig_w2": tsig_raw,
                   "ns": zero, "nt": zero, "nw1": zero, "nw2": zero}
        for i, c in enumerate("rgb"):
            comp_in[f"srgb_{c}"] = srgb[i]
            comp_in[f"trgb_{c}"] = trgb[i]
            comp_in[f"trgb_w1_{c}"] = trgb[i]
            comp_in[f"trgb_w2_{c}"] = trgb[i]
        ck = make_planar_compositor(Sf)(comp_in)
        sw, tw, w = (ck["static_weights"], ck["transient_weights"],
                     ck["weights"])
        res["rgb_fine"] = ck["maps"][:, 0:3]
        res["depth_fine"] = ck["maps"][:, 3]
    else:
        alphas = 1.0 - jnp.exp(-(tau_s + tau_t))
        trans = cp.transmittance_from_taus(tau_s + tau_t)
        sw = static_alphas * trans
        tw = transient_alphas * trans
        w = alphas * trans
        res["rgb_fine"] = jnp.stack(
            [jnp.sum(sw * sc + tw * tc, -1)
             for sc, tc in zip(srgb, trgb)], -1)
        res["depth_fine"] = jnp.sum(w * zs, -1)
    transient_rgb_map = jnp.stack([jnp.sum(tw * c, -1) for c in trgb], -1)
    transient_alpha = jnp.sum(tw, -1)
    res["transient_alpha_fine"] = transient_alpha
    # gray background for the transient-only view (`rendering.py:264-265`)
    res["transient_rgb_fine"] = (transient_rgb_map
                                 + 0.8 * (1.0 - transient_alpha[:, None]))
    # static-only compositing with its own transmittance
    # (`rendering.py:270-278`)
    _sw = static_alphas * cp.transmittance_from_taus(tau_s)
    res["_static_rgb_fine"] = jnp.stack(
        [jnp.sum(_sw * c, -1) for c in srgb], -1)
    res["_static_depth_fine"] = jnp.sum(_sw * zs, -1)

    if flow:
        far = zs > Z_FAR  # flow zeroed beyond z_far (`rendering.py:316`)
        ffw = tuple(jnp.where(far, 0.0, out[f"ffw_{c}"]) for c in "xyz")
        fbw = tuple(jnp.where(far, 0.0, out[f"fbw_{c}"]) for c in "xyz")
        res["xyz_fine"] = jnp.stack([jnp.sum(w * x, -1) for x in xyz], -1)
        res["transient_flow_fw"] = jnp.stack(
            [jnp.sum(w * f, -1) for f in ffw], -1)
        res["xyz_fw"] = res["xyz_fine"] + res["transient_flow_fw"]
        res["transient_flow_bw"] = jnp.stack(
            [jnp.sum(w * f, -1) for f in fbw], -1)
        res["xyz_bw"] = res["xyz_fine"] + res["transient_flow_bw"]
        res["transient_flows_fw"] = jnp.stack(ffw, -1)
        res["transient_flows_bw"] = jnp.stack(fbw, -1)

    # per-sample (N, S[, 3]) result keys of the packed path (DCE'd by
    # XLA unless requested by the caller's key filter)
    res["xyzs_fine"] = jnp.stack(xyz, -1)
    res["static_rgbs_fine"] = jnp.stack(srgb, -1)
    res["transient_rgbs_fine"] = jnp.stack(trgb, -1)
    res["static_sigmas_fine"] = static_sigmas
    res["transient_sigmas_fine"] = transient_sigmas
    res["static_alphas_fine"] = static_alphas
    res["transient_alphas_fine"] = transient_alphas
    res["static_weights_fine"] = sw
    res["transient_weights_fine"] = tw
    res["weights_fine"] = w
    return res


def _shard_planar(fn, mesh):
    """shard_map a planar fused op over the data mesh: rays (and all their
    planes) shard on the leading axis, weights replicate. Mirrors
    `rendering._shard_over_rays` (pallas custom calls don't auto-partition
    under GSPMD)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from nsff_pl_tpu.parallel.mesh import DATA_AXIS

    ray = PS(DATA_AXIS)
    return shard_map(fn, mesh=mesh,
                     in_specs=(PS(), ray, ray, ray, ray, ray, ray, ray),
                     out_specs=ray, check_vma=False)


def _importance_select(scores, K: int, key):
    """Horvitz-Thompson ray selection for the importance-concentrated
    warp estimator (RenderConfig.warp_importance).

    Draws exactly K ray slots by SYSTEMATIC sampling over inclusion
    intensities pi_i ~ K * scores_i / sum(scores), redistributed so
    pi <= 1 where possible (a ray with pi > 1 after redistribution is
    simply drawn multiple times — still unbiased). Returns (idx, v) with
    E[sum_k v_k f(idx_k)] = sum_i f(i) for any per-ray f, because the
    systematic draw over the cumulative pi mass hits ray i with expected
    multiplicity pi_i and v = scale / pi[idx].

    All outputs are selection constants (no gradient path; callers pass
    stop-gradient scores)."""
    n = scores.shape[0]
    if K >= n:
        # full capacity: the capped fixpoint is pi = 1 everywhere —
        # identity selection with unit weights (the exact estimator)
        return jnp.arange(n), jnp.ones((n,), jnp.float32)
    s = jnp.maximum(jax.lax.stop_gradient(scores), 1e-12)
    pi = K * s / jnp.sum(s)
    for _ in range(4):
        # redistribute the capped mass onto the free rays; converges in
        # a few rounds (the capped set only grows), and any residual
        # pi > 1 is handled by multiplicity, so early exit is unbiased
        capped = (pi >= 1.0).astype(jnp.float32)
        free_K = K - jnp.sum(capped)
        denom = jnp.maximum(jnp.sum(s * (1.0 - capped)), 1e-12)
        pi = jnp.where(capped > 0, 1.0, s * free_K / denom)
    pi = jnp.maximum(pi, 0.5 / n)  # keep every ray reachable (HT support)
    cum = jnp.cumsum(pi)
    scale = cum[-1] / K  # = 1 up to the support floor
    u = jax.random.uniform(key, ())
    pos = (jnp.arange(K, dtype=jnp.float32) + u) * scale
    idx = jnp.clip(jnp.searchsorted(cum, pos, side="right"), 0, n - 1)
    v = scale / pi[idx]
    return idx, v


def render_train_planar(
    params_fine: nerf_m.Params,
    embeddings: Dict[str, jnp.ndarray],
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    rng: jax.Array,
    cfg: RenderConfig,
    *,
    params_coarse: nerf_m.Params = None,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Render a training batch with planar layouts.

    Returns a dict of:
      - per-ray maps: rgb_fine (N,3), depth_fine (N,), rgb_fw/rgb_bw (N,3),
        xyz_fine/xyz_fw/xyz_bw (N,3), disocc_fw/disocc_bw (N,1)
        (+ rgb_coarse (N,3) / depth_coarse (N,) when N_importance > 0)
      - dense planes (N,S): zs, static_weights/transient_weights/weights,
        disoccs_fw/disoccs_bw
      - component-plane 3-tuples of (N,S): xyzs, xyzs_fw, xyzs_bw,
        xyzs_fw_bw, xyzs_bw_fw
    consumed by `training.loss.compute_losses_planar`. S is N_samples, or
    N_samples + 2*N_importance for the fine planes under coarse-to-fine
    (`rendering.py:326-348`: the sorted union of stratified + static-pdf
    + transient-pdf draws). The RNG key-split structure matches
    `render_rays` so both paths draw identical perturb/noise/pdf values.
    """
    n = rays.shape[0]
    S = cfg.N_samples
    o, d = rays[:, 0:3], rays[:, 3:6]
    use_viewdir = cfg.use_viewdir
    dir_emb = posenc(d, cfg.S_emb_dir, cfg.N_emb_dir) if use_viewdir else None

    k_perturb, k_pdf_s, k_pdf_t, k_rest = jax.random.split(rng, 4)
    zs, zs_mid = stratified_zs(k_perturb, n, S, cfg.perturb)
    t_emb = nerf_m.embedding_lookup(embeddings["t"], ts)
    encode_a = cfg.encode_a and "a" in embeddings
    a_emb = nerf_m.embedding_lookup(embeddings["a"], ts) if encode_a else None

    k_coarse, k_fine = jax.random.split(k_rest)
    k_noise_s, k_noise_t, k_fw, k_bw = jax.random.split(k_fine, 4)
    noise_std = cfg.noise_std

    def noise(k, s_count, rows=None):
        rows = n if rows is None else rows
        if noise_std <= 0:
            return jnp.zeros((rows, s_count))
        return jax.random.normal(k, (rows, s_count)) * noise_std

    kker = dict(n_emb_xyz=cfg.N_emb_xyz, s_emb_xyz=cfg.S_emb_xyz,
                n_emb_dir=cfg.N_emb_dir, n_a=cfg.N_a, n_tau=cfg.N_tau,
                flow_scale=cfg.flow_scale)
    # block sizes from the v5e sweep at S=128 (docs/ROADMAP.md): at large
    # batches whole-ray backward blocks of 16 rays beat 8 for both ops
    # and the transient-only warp forward prefers 4096-row blocks; small
    # batches (<= 1024 rays) measured faster with the smaller blocks
    big = n > 1024

    res: Dict[str, jnp.ndarray] = {}
    if cfg.N_importance > 0:
        # coarse-to-fine (`rendering.py:326-348`) staying planar: a second
        # dual-tower evaluation of the COARSE model (no appearance/flow
        # heads — `nerf.py:67,112`) at the stratified zs, its own
        # composite (noisy sigmas, shared transmittance), then PDF
        # importance draws from the stop-gradient'ed static + transient
        # weights feed the fine pass as an external sorted (N, S_fine)
        # zs plane. sample_pdf/sort are XLA (tiny next to the MLPs).
        if params_coarse is None:
            raise ValueError(
                "N_importance > 0 needs params_coarse (the coarse model)")
        coarse_op = make_planar_nerf_train(
            S, use_viewdir=use_viewdir, encode_a=False, encode_t=True,
            output_flow=(), block_rows=4096 if big else 2048,
            bwd_block_rows=2048 if big else 1024, **kker)
        if mesh is not None:
            coarse_op = _shard_planar(coarse_op, mesh)
        kc_noise_s, kc_noise_t, _kc_fw, _kc_bw = jax.random.split(k_coarse, 4)
        cout = coarse_op(params_coarse, o, d, zs, None, dir_emb, None, t_emb)
        d_s_c, d_t_c = cp.deltas_from_zs(zs)
        tau_s_c = d_s_c * cp.softplus(cout["ssig"] + noise(kc_noise_s, S))
        tau_t_c = d_t_c * cp.softplus(cout["tsig"] + noise(kc_noise_t, S))
        trans_c = cp.transmittance_from_taus(tau_s_c + tau_t_c)
        sw_c = (1.0 - jnp.exp(-tau_s_c)) * trans_c
        tw_c = (1.0 - jnp.exp(-tau_t_c)) * trans_c
        w_c = (1.0 - jnp.exp(-(tau_s_c + tau_t_c))) * trans_c
        res["rgb_coarse"] = jnp.stack(
            [jnp.sum(sw_c * cout[f"srgb_{c}"] + tw_c * cout[f"trgb_{c}"],
                     -1) for c in "rgb"], -1)
        res["depth_coarse"] = jnp.sum(w_c * zs, -1)
        det = cfg.perturb == 0
        zs_static = sample_pdf(
            k_pdf_s, zs_mid, jax.lax.stop_gradient(sw_c[:, 1:-1]),
            cfg.N_importance, det=det)
        zs_transient = sample_pdf(
            k_pdf_t, zs_mid, jax.lax.stop_gradient(tw_c[:, 1:-1]),
            cfg.N_importance, det=det)
        zs = jnp.sort(
            jnp.concatenate([zs, zs_static, zs_transient], -1), -1)
    Sf = zs.shape[1]  # fine-pass sample count (= S when N_importance == 0)

    ws = cfg.warp_subsample
    wi = float(cfg.warp_importance)
    if ws not in (1, 2):
        raise ValueError(f"warp_subsample must be 1 or 2, got {ws}")
    if ws == 2 and n % 2:
        raise ValueError("warp_subsample=2 needs an even ray batch")
    if wi and ws != 1:
        raise ValueError(
            "warp_importance and warp_subsample=2 are mutually exclusive")
    if not 0.0 <= wi <= 1.0:
        raise ValueError(f"warp_importance must be in [0, 1], got {wi}")
    K_imp = max(int(round(wi * n)), 1) if wi else 0
    if wi and mesh is not None and K_imp % mesh.size:
        raise ValueError(
            f"warp_importance={wi}: K = {K_imp} selected rays must "
            f"divide the {mesh.size}-device mesh")
    main_op = make_planar_nerf_train(
        Sf, use_viewdir=use_viewdir, encode_a=encode_a, encode_t=True,
        output_flow=("fw", "bw"),
        bwd_block_rows=2048 if big else 1024, **kker)
    warp_kw = dict(static_branch=False, flow_in=True, encode_t=True,
                   block_rows=4096 if big else 2048,
                   bwd_block_rows=2048 if big else 1024, **kker)
    if ws == 2 or wi:
        # ONE stacked warp evaluation (see RenderConfig.warp_subsample /
        # .warp_importance): both flow heads so every row can read the
        # opposite direction for cycle consistency
        warp_ops = {"both": make_planar_nerf_train(
            Sf, output_flow=("fw", "bw"), **warp_kw)}
    else:
        warp_ops = {w: make_planar_nerf_train(Sf, output_flow=(w,),
                                              **warp_kw)
                    for w in ("fw", "bw")}
    if mesh is not None:
        main_op = _shard_planar(main_op, mesh)
        warp_ops = {w: _shard_planar(op, mesh)
                    for w, op in warp_ops.items()}

    main = main_op(params_fine, o, d, zs, None, dir_emb, a_emb, t_emb)

    far = zs > Z_FAR  # flow zeroed beyond z_far (`rendering.py:316`)
    ffw = tuple(jnp.where(far, 0.0, main[k])
                for k in ("ffw_x", "ffw_y", "ffw_z"))
    fbw = tuple(jnp.where(far, 0.0, main[k])
                for k in ("fbw_x", "fbw_y", "fbw_z"))
    srgb = (main["srgb_r"], main["srgb_g"], main["srgb_b"])
    trgb = (main["trgb_r"], main["trgb_g"], main["trgb_b"])

    res["zs"] = zs
    xyz = tuple(o[:, c:c + 1] + d[:, c:c + 1] * zs for c in range(3))
    res["xyzs"] = xyz
    res["xyzs_fw"] = tuple(x + f for x, f in zip(xyz, ffw))
    res["xyzs_bw"] = tuple(x + f for x, f in zip(xyz, fbw))

    def warp_eval(flows, t_shift, which):
        """`render_transient_warping` (`rendering.py:98-140`), MLP part:
        evaluate the transient field at xyz+flow / t+shift."""
        ts_shift = jnp.clip(ts + t_shift, 0, cfg.max_t)
        t_emb_w = nerf_m.embedding_lookup(embeddings["t"], ts_shift)
        out = warp_ops[which](params_fine, o, d, zs, flows, None, None,
                              t_emb_w)
        flow_back = tuple(jnp.where(far, 0.0, out[f"f{which}_{c}"])
                          for c in ("x", "y", "z"))
        return out, flow_back

    n2 = n // 2
    if ws == 2:
        # rows [0, n/2): fw warp (xyz+flow_fw @ t+1); rows [n/2, n): bw
        # warp (xyz+flow_bw @ t-1). Batch rows are i.i.d. draws, so the
        # halves are unbiased samples of each direction.
        flows_w = tuple(jnp.concatenate([f[:n2], b[n2:]], 0)
                        for f, b in zip(ffw, fbw))
        ts_w = jnp.concatenate([jnp.clip(ts[:n2] + 1, 0, cfg.max_t),
                                jnp.clip(ts[n2:] - 1, 0, cfg.max_t)], 0)
        t_emb_w = nerf_m.embedding_lookup(embeddings["t"], ts_w)
        out_w = warp_ops["both"](params_fine, o, d, zs, flows_w, None,
                                 None, t_emb_w)
        # cycle consistency needs the OPPOSITE-direction flow at the
        # warped position: bw for the fw-warped half, fw for the other
        flow_back = tuple(jnp.where(far, 0.0, jnp.concatenate(
            [out_w[f"fbw_{c}"][:n2], out_w[f"ffw_{c}"][n2:]], 0))
            for c in ("x", "y", "z"))
    elif not wi:
        out_w1, flowb_fw = warp_eval(ffw, +1, "bw")
        out_w2, flowb_bw = warp_eval(fbw, -1, "fw")
    # wi > 0: the warp evaluation happens AFTER the main composite — the
    # selection scores are the composited transient weights

    use_ck = (cfg.planar_compositing == "on"
              or (cfg.planar_compositing == "auto"
                  and jax.default_backend() != "cpu"))
    if use_ck:
        # one fused kernel composites all three evaluations (shared
        # tau_s); ~25 XLA glue fusions collapse into one read/write of
        # each plane (ops/compositing_planar_kernel.py)
        comp_in = {"zs": zs, "ssig": main["ssig"], "tsig": main["tsig"],
                   "ns": noise(k_noise_s, Sf), "nt": noise(k_noise_t, Sf)}
        for c in "rgb":
            comp_in[f"srgb_{c}"] = main[f"srgb_{c}"]
            comp_in[f"trgb_{c}"] = main[f"trgb_{c}"]
        if wi:
            # importance mode: the warps are composited separately on the
            # selected ray set (below); here the w1/w2 slots carry the
            # main planes and their outputs are discarded (zero
            # cotangents, so no gradient doubling — same trick as ws2)
            comp_in.update(tsig_w1=main["tsig"], tsig_w2=main["tsig"],
                           nw1=comp_in["nt"], nw2=comp_in["nt"])
            for c in "rgb":
                comp_in[f"trgb_w1_{c}"] = main[f"trgb_{c}"]
                comp_in[f"trgb_w2_{c}"] = main[f"trgb_{c}"]
        elif ws == 2:
            # the single warp evaluation rides the w1 slot; w2 gets the
            # same planes and its outputs are discarded (their cotangents
            # are zero, so no gradient doubling). The duplicate composite
            # costs ~0.1 ms of a 0.34 ms kernel — not worth a variant.
            nw = noise(k_fw, Sf)
            comp_in.update(tsig_w1=out_w["tsig"], tsig_w2=out_w["tsig"],
                           nw1=nw, nw2=nw)
            for c in "rgb":
                comp_in[f"trgb_w1_{c}"] = out_w[f"trgb_{c}"]
                comp_in[f"trgb_w2_{c}"] = out_w[f"trgb_{c}"]
        else:
            comp_in.update(tsig_w1=out_w1["tsig"], tsig_w2=out_w2["tsig"],
                           nw1=noise(k_fw, Sf), nw2=noise(k_bw, Sf))
            for c in "rgb":
                comp_in[f"trgb_w1_{c}"] = out_w1[f"trgb_{c}"]
                comp_in[f"trgb_w2_{c}"] = out_w2[f"trgb_{c}"]
        compositor = make_planar_compositor(Sf)
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as PS

            from nsff_pl_tpu.parallel.mesh import DATA_AXIS

            compositor = shard_map(
                compositor, mesh=mesh, in_specs=(PS(DATA_AXIS),),
                out_specs=PS(DATA_AXIS), check_vma=False)
        comp = compositor(comp_in)
        sw = comp["static_weights"]
        tw = comp["transient_weights"]
        w = comp["weights"]
        maps = comp["maps"]
        res["rgb_fine"] = maps[:, 0:3]
        res["depth_fine"] = maps[:, 3]
        if wi:
            pass  # warp maps come from the gathered composite below
        elif ws == 2:
            res["rgb_w"] = maps[:, 4:7]
            tw_w = comp["tw_w1"]
        else:
            tw_fw, tw_bw = comp["tw_w1"], comp["tw_w2"]
            res["rgb_fw"] = maps[:, 4:7]
            res["rgb_bw"] = maps[:, 7:10]
    else:
        d_s, d_t = cp.deltas_from_zs(zs)
        ns = noise(k_noise_s, Sf)
        nt = noise(k_noise_t, Sf)
        tau_s = d_s * cp.softplus(main["ssig"] + ns)
        tau_t = d_t * cp.softplus(main["tsig"] + nt)
        static_alphas = 1.0 - jnp.exp(-tau_s)
        transient_alphas = 1.0 - jnp.exp(-tau_t)
        # alpha = 1-(1-a_s)(1-a_t) = 1-exp(-(tau_s+tau_t)); T via the
        # matmul cumsum identity (no cumprod scans)
        alphas = 1.0 - jnp.exp(-(tau_s + tau_t))
        trans = cp.transmittance_from_taus(tau_s + tau_t)
        sw = static_alphas * trans
        tw = transient_alphas * trans
        w = alphas * trans
        res["rgb_fine"] = jnp.stack(
            [jnp.sum(sw * sc + tw * tc, -1)
             for sc, tc in zip(srgb, trgb)], -1)
        res["depth_fine"] = jnp.sum(w * zs, -1)

        def warp_composite(out, k_w):
            """Composite a warped evaluation against the CURRENT static
            field (`rendering.py:98-140`)."""
            tau_w = d_t * cp.softplus(out["tsig"] + noise(k_w, Sf))
            ta_w = 1.0 - jnp.exp(-tau_w)
            trans_w = cp.transmittance_from_taus(tau_s + tau_w)
            sw_w = static_alphas * trans_w
            tw_w = ta_w * trans_w
            rgb_w = jnp.stack(
                [jnp.sum(sw_w * sc + tw_w * out[f"trgb_{c}"], -1)
                 for sc, c in zip(srgb, "rgb")], -1)
            return rgb_w, tw_w

        if wi:
            pass  # warps composite on the gathered ray set below
        elif ws == 2:
            res["rgb_w"], tw_w = warp_composite(out_w, k_fw)
        else:
            res["rgb_fw"], tw_fw = warp_composite(out_w1, k_fw)
            res["rgb_bw"], tw_bw = warp_composite(out_w2, k_bw)

    res["static_weights"] = sw
    res["transient_weights"] = tw
    res["weights"] = w

    if wi:
        # ---- importance-concentrated warp evaluation ----
        # (RenderConfig.warp_importance). Scores: composited transient
        # weight mass per ray (stop-grad) + a floor keeping static rays
        # in the HT support — the pho/cyc integrands
        # (`/root/reference/losses.py:126-141`) vanish where the
        # transient field is empty, so concentrating the warp FLOPs on
        # transient-heavy rays cuts estimator variance at equal cost vs
        # the uniform half split (warp_subsample=2), and every selected
        # ray keeps BOTH directions (the fw/bw pairing the cycle term
        # wants, `rendering.py:217-232`).
        K = K_imp
        scores = jax.lax.stop_gradient(jnp.sum(tw, -1)) + 0.05
        idx, v = _importance_select(scores, K,
                                    jax.random.fold_in(k_rest, 7))
        res["warp_idx"], res["warp_v"] = idx, v

        o_g, d_g, zs_g = o[idx], d[idx], zs[idx]
        ffw_g = tuple(f[idx] for f in ffw)
        fbw_g = tuple(f[idx] for f in fbw)
        far_g = zs_g > Z_FAR
        ts_g = ts[idx]

        # stacked both-direction warp rows: [0, K) = fw @ t+1,
        # [K, 2K) = bw @ t-1 (`render_transient_warping`,
        # `/root/reference/models/rendering.py:98-140`)
        def two(a):
            return jnp.concatenate([a, a], 0)

        flows2 = tuple(jnp.concatenate([f, b], 0)
                       for f, b in zip(ffw_g, fbw_g))
        ts2 = jnp.concatenate([jnp.clip(ts_g + 1, 0, cfg.max_t),
                               jnp.clip(ts_g - 1, 0, cfg.max_t)], 0)
        t_emb2 = nerf_m.embedding_lookup(embeddings["t"], ts2)
        out_w = warp_ops["both"](params_fine, two(o_g), two(d_g),
                                 two(zs_g), flows2, None, None, t_emb2)
        # cycle consistency reads the OPPOSITE-direction flow at the
        # warped position (`rendering.py:135-140`)
        flowb_fw_g = tuple(jnp.where(far_g, 0.0, out_w[f"fbw_{c}"][:K])
                           for c in ("x", "y", "z"))
        flowb_bw_g = tuple(jnp.where(far_g, 0.0, out_w[f"ffw_{c}"][K:])
                           for c in ("x", "y", "z"))

        nw1 = noise(k_fw, Sf, K)
        nw2 = noise(k_bw, Sf, K)
        ns_f = comp_in["ns"] if use_ck else ns
        nt_f = comp_in["nt"] if use_ck else nt
        ssig_g, tsig_g = main["ssig"][idx], main["tsig"][idx]
        ns_g, nt_g = ns_f[idx], nt_f[idx]
        srgb_g = tuple(p[idx] for p in srgb)
        if use_ck:
            comp_in_g = {"zs": zs_g, "ssig": ssig_g, "tsig": tsig_g,
                         "ns": ns_g, "nt": nt_g, "nw1": nw1, "nw2": nw2,
                         "tsig_w1": out_w["tsig"][:K],
                         "tsig_w2": out_w["tsig"][K:]}
            for ci, c in enumerate("rgb"):
                comp_in_g[f"srgb_{c}"] = srgb_g[ci]
                comp_in_g[f"trgb_{c}"] = main[f"trgb_{c}"][idx]
                comp_in_g[f"trgb_w1_{c}"] = out_w[f"trgb_{c}"][:K]
                comp_in_g[f"trgb_w2_{c}"] = out_w[f"trgb_{c}"][K:]
            comp_g = compositor(comp_in_g)
            tw_g = comp_g["transient_weights"]
            tw_fw_g, tw_bw_g = comp_g["tw_w1"], comp_g["tw_w2"]
            res["rgb_fw_g"] = comp_g["maps"][:, 4:7]
            res["rgb_bw_g"] = comp_g["maps"][:, 7:10]
        else:
            d_s_g, d_t_g = cp.deltas_from_zs(zs_g)
            tau_s_g = d_s_g * cp.softplus(ssig_g + ns_g)
            tau_t_g = d_t_g * cp.softplus(tsig_g + nt_g)
            sa_g = 1.0 - jnp.exp(-tau_s_g)
            tw_g = ((1.0 - jnp.exp(-tau_t_g))
                    * cp.transmittance_from_taus(tau_s_g + tau_t_g))

            def warp_composite_g(tsig_w, trgb_w, nw):
                """`warp_composite` on the gathered rays (shared static
                field, `rendering.py:98-140`)."""
                tau_w = d_t_g * cp.softplus(tsig_w + nw)
                ta_w = 1.0 - jnp.exp(-tau_w)
                trans_w = cp.transmittance_from_taus(tau_s_g + tau_w)
                sw_w = sa_g * trans_w
                tw_w = ta_w * trans_w
                rgb_w = jnp.stack(
                    [jnp.sum(sw_w * sc + tw_w * tc, -1)
                     for sc, tc in zip(srgb_g, trgb_w)], -1)
                return rgb_w, tw_w

            res["rgb_fw_g"], tw_fw_g = warp_composite_g(
                out_w["tsig"][:K],
                tuple(out_w[f"trgb_{c}"][:K] for c in "rgb"), nw1)
            res["rgb_bw_g"], tw_bw_g = warp_composite_g(
                out_w["tsig"][K:],
                tuple(out_w[f"trgb_{c}"][K:] for c in "rgb"), nw2)

        occ_fw_g = jax.lax.stop_gradient(tw_fw_g - tw_g)
        occ_bw_g = jax.lax.stop_gradient(tw_bw_g - tw_g)
        res["disocc_fw_g"] = 1.0 - jnp.abs(
            jnp.sum(occ_fw_g, -1, keepdims=True))
        res["disocc_bw_g"] = 1.0 - jnp.abs(
            jnp.sum(occ_bw_g, -1, keepdims=True))
        res["disoccs_fw_g"] = 1.0 - jnp.abs(occ_fw_g)
        res["disoccs_bw_g"] = 1.0 - jnp.abs(occ_bw_g)

        xyzs_g = tuple(x[idx] for x in xyz)
        res["xyzs_g"] = xyzs_g
        res["xyzs_fw_bw_g"] = tuple(x + f + fb for x, f, fb
                                    in zip(xyzs_g, ffw_g, flowb_fw_g))
        res["xyzs_bw_fw_g"] = tuple(x + b + fb for x, b, fb
                                    in zip(xyzs_g, fbw_g, flowb_bw_g))

    if ws == 2:
        # per-ray single-warp cycle planes: the warped-position base is
        # xyz+flow_fw for the first half, xyz+flow_bw for the second
        xyz_warp = tuple(jnp.concatenate([f[:n2], b[n2:]], 0)
                         for f, b in zip(res["xyzs_fw"], res["xyzs_bw"]))
        res["xyzs_wb"] = tuple(x + fb for x, fb in zip(xyz_warp,
                                                       flow_back))
    elif not wi:
        res["xyzs_fw_bw"] = tuple(x + f for x, f in zip(res["xyzs_fw"],
                                                        flowb_fw))
        res["xyzs_bw_fw"] = tuple(x + f for x, f in zip(res["xyzs_bw"],
                                                        flowb_bw))

    # composited flow expectations (`rendering.py:280-287`)
    res["xyz_fine"] = jnp.stack([jnp.sum(w * x, -1) for x in xyz], -1)
    flow_fw_map = jnp.stack([jnp.sum(w * f, -1) for f in ffw], -1)
    flow_bw_map = jnp.stack([jnp.sum(w * f, -1) for f in fbw], -1)
    res["xyz_fw"] = res["xyz_fine"] + flow_fw_map
    res["xyz_bw"] = res["xyz_fine"] + flow_bw_map

    # disocclusion = 1 - |sum(warped_w - w)|, stop-grad (`rendering.py:289-295`)
    if wi:
        pass  # gathered-set disocclusion already set above
    elif ws == 2:
        occ_w = jax.lax.stop_gradient(tw_w - tw)
        res["disocc_w"] = 1.0 - jnp.abs(jnp.sum(occ_w, -1, keepdims=True))
        res["disoccs_w"] = 1.0 - jnp.abs(occ_w)
    else:
        occ_fw = jax.lax.stop_gradient(tw_fw - tw)
        occ_bw = jax.lax.stop_gradient(tw_bw - tw)
        res["disocc_fw"] = 1.0 - jnp.abs(jnp.sum(occ_fw, -1, keepdims=True))
        res["disocc_bw"] = 1.0 - jnp.abs(jnp.sum(occ_bw, -1, keepdims=True))
        res["disoccs_fw"] = 1.0 - jnp.abs(occ_fw)
        res["disoccs_bw"] = 1.0 - jnp.abs(occ_bw)
    return res
