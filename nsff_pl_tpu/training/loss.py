"""The NSFF loss suite — eight terms with epoch schedules.

Functional JAX re-implementation of the reference `losses.py:31-171`
(`NeRFWLoss`). Differences forced by XLA's static-shape model, each noted
inline:

- the reference's boolean indexing for the flow-consistency terms
  (`losses.py:117-124`) becomes fixed-shape masked means
- batch-global statistics (median/MAD in the depth loss, disocclusion
  means, top-k) are computed over the full batch; under pjit sharding XLA
  inserts the cross-chip collectives automatically, keeping multi-chip
  numerics identical to single-chip (SURVEY.md §5 caution)

Loss weights/schedules (`losses.py:54-65`, `train.py:174-176`):
    lambda_geo_d = lambda_geo_f = lambda_geo_init * 0.1**(epoch//10)
    lambda_reg = 0.1, lambda_ent = 1e-3
    cross_entropy weight ramps 0 -> lambda_ent/5 over 10 epochs
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nsff_pl_tpu.ops import rays as ray_ops

Z_FAR = 0.95  # losses.py:62


@dataclass(frozen=True)
class LossConfig:
    lambda_geo_init: float = 0.04  # opt.py:47
    lambda_reg: float = 0.1  # losses.py:55
    lambda_ent: float = 1e-3  # losses.py:61
    thickness: int = 1  # opt.py:49
    topk: float = 1.0  # opt.py:80
    max_t: int = 29  # N_frames - 1 (train.py:138)


def shiftscale_invariant_depthloss(depth, disp):
    """Median/MAD-normalized depth loss (`losses.py:8-28`,
    https://arxiv.org/pdf/1907.01341.pdf).

    depth: (N,) NDC depth; disp: (N,) image-space disparity.
    Median and mean-abs-deviation are *batch-global* statistics.
    """
    t_pred = jnp.median(depth)
    s_pred = jnp.mean(jnp.abs(depth - t_pred))
    t_gt = jnp.median(-disp)
    s_gt = jnp.mean(jnp.abs(-disp - t_gt))
    pred_n = (depth - t_pred) / s_pred
    gt_n = (-disp - t_gt) / s_gt
    return (pred_n - gt_n) ** 2


def _dilate_along_samples(w, thickness: int):
    """Dilate (N, S) weights with a length-`thickness` ones window along the
    sample axis, zero padding — the reference's kornia
    `filter2d(ones(1,1,T), 'constant')` (`losses.py:63,92-95`)."""
    t = max(thickness, 1)
    if t == 1:
        return w
    # 'same' correlation with a ones kernel; kornia's _compute_padding
    # pads front=(t-1)//2, rear=(t-1)-(t-1)//2 = t//2, for odd AND even t
    # — this matches it exactly (golden-tested for t=2..5 in test_loss.py)
    pad_l = (t - 1) // 2
    pad_r = t - 1 - pad_l
    wp = jnp.pad(w, ((0, 0), (pad_l, pad_r)))
    windows = jnp.stack([wp[:, i:i + w.shape[1]] for i in range(t)], 0)
    return jnp.sum(windows, 0)


def _masked_mean(x, mask, axis=None):
    """Mean of x over elements where mask, 0 if mask is empty."""
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return num / den


def _flow_uv_terms(ret, masks, xyz_fw, xyz_bw, batch, cfg, lambda_geo,
                   Ks, Ps):
    """2D flow-consistency terms: project the composited flowed points
    with the t±1 camera matrices and L1 against the RAFT targets
    (`losses.py:99-124`). Shared by both loss layouts."""
    cam_ids = batch["cam_ids"]
    ts = batch["ts"]
    Ks_r = Ks[cam_ids]  # (N, 3, 3)
    xyz_fw_w = ray_ops.ndc2world(xyz_fw, Ks_r)
    xyz_bw_w = ray_ops.ndc2world(xyz_bw, Ks_r)

    ts_fw = jnp.clip(ts + 1, None, cfg.max_t)
    Ps_fw = Ps[cam_ids, ts_fw]  # (N, 3, 4)
    uvd_fw = jnp.einsum("nij,nj->ni", Ps_fw[:, :, :3], xyz_fw_w) \
        + Ps_fw[:, :, 3]
    uv_fw = uvd_fw[:, :2] / (jnp.abs(uvd_fw[:, 2:]) + 1e-8)

    ts_bw = jnp.clip(ts - 1, 0, None)
    Ps_bw = Ps[cam_ids, ts_bw]
    uvd_bw = jnp.einsum("nij,nj->ni", Ps_bw[:, :, :3], xyz_bw_w) \
        + Ps_bw[:, :, 3]
    uv_bw = uvd_bw[:, :2] / (jnp.abs(uvd_bw[:, 2:]) + 1e-8)

    # the reference drops invalid rays by boolean indexing
    # (losses.py:115-124); here: fixed-shape masked means
    valid_fw = ((uvd_fw[:, 2] > 0) & (ts < cfg.max_t)).astype(jnp.float32)
    valid_bw = ((uvd_bw[:, 2] > 0) & (ts > 0)).astype(jnp.float32)
    ret["flow_fw_l"] = (lambda_geo / 2) * jnp.mean(
        jnp.abs(uv_fw - batch["uv_fw"]), -1)
    masks["flow_fw_l"] = valid_fw
    ret["flow_bw_l"] = (lambda_geo / 2) * jnp.mean(
        jnp.abs(uv_bw - batch["uv_bw"]), -1)
    masks["flow_bw_l"] = valid_bw
    return Ks_r


def _finalize_terms(ret, masks, weights, cfg):
    """Final reduction: optional priority weights, optional top-k hard
    mining, then mean (losses.py:162-169)."""
    out: Dict[str, jnp.ndarray] = {}
    for k, per_ray in ret.items():
        if weights is not None:
            per_ray = per_ray * weights
        mask = masks.get(k)
        if cfg.topk < 1.0:
            num_hard = max(int(cfg.topk * per_ray.shape[0]), 1)
            if mask is not None:
                per_ray = jnp.where(mask > 0, per_ray, -jnp.inf)
            vals, _ = jax.lax.top_k(per_ray, num_hard)
            finite = jnp.isfinite(vals).astype(vals.dtype)
            out[k] = _masked_mean(jnp.where(jnp.isfinite(vals), vals, 0.0),
                                  finite)
        elif mask is not None:
            out[k] = _masked_mean(per_ray, mask)
        else:
            out[k] = jnp.mean(per_ray)
    return out


def compute_losses(
    results: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    *,
    epoch,
    output_transient_flow: Tuple[str, ...],
    Ks: Optional[jnp.ndarray] = None,  # (N_cams, 3, 3) — train.py:136
    Ps: Optional[jnp.ndarray] = None,  # (N_cams, N_frames, 3, 4) — train.py:137
    weights: Optional[jnp.ndarray] = None,  # per-ray priority (losses.py:163)
) -> Dict[str, jnp.ndarray]:
    """Compute all loss terms as scalars (dict), mirroring
    `NeRFWLoss.forward` (`losses.py:72-171`). Sum the dict values for the
    total loss. `epoch` may be a traced scalar."""
    epoch = jnp.asarray(epoch, jnp.float32)
    lambda_geo = cfg.lambda_geo_init * 0.1 ** jnp.floor(epoch / 10.0)

    ret: Dict[str, jnp.ndarray] = {}
    masks: Dict[str, jnp.ndarray] = {}

    rgbs = batch["rgbs"]
    col_l = jnp.mean((results["rgb_fine"] - rgbs) ** 2, -1)
    if "rgb_coarse" in results:
        col_l = col_l + 0.1 * jnp.mean((results["rgb_coarse"] - rgbs) ** 2, -1)
    ret["col_l"] = col_l

    disp_l = lambda_geo * shiftscale_invariant_depthloss(
        results["depth_fine"], batch["disps"])
    if "depth_coarse" in results:
        disp_l = disp_l + lambda_geo * shiftscale_invariant_depthloss(
            results["depth_coarse"], batch["disps"])
    ret["disp_l"] = disp_l

    if output_transient_flow:
        tw = results["transient_weights_fine"]  # (N, S)
        ret["entropy_l"] = cfg.lambda_ent * jnp.sum(
            -tw * jnp.log(tw + 1e-8), -1)

        cross_entropy_w = cfg.lambda_ent / 5 * jnp.minimum(epoch / 10.0, 1.0)
        tr_w = _dilate_along_samples(jax.lax.stop_gradient(tw), cfg.thickness)
        ret["cross_entropy_l"] = cross_entropy_w * jnp.sum(
            tr_w * jnp.log(results["static_weights_fine"] + 1e-8), -1)

        Ks_r = _flow_uv_terms(ret, masks, results["xyz_fw"],
                              results["xyz_bw"], batch, cfg, lambda_geo,
                              Ks, Ps)

        # photometric warping loss, normalized by the batch-mean
        # disocclusion weight (losses.py:126-133)
        pho_l = (results["disocc_fw"] * (results["rgb_fw"] - rgbs) ** 2
                 / jnp.mean(results["disocc_fw"]))
        pho_l = pho_l + (results["disocc_bw"] * (results["rgb_bw"] - rgbs) ** 2
                         / jnp.mean(results["disocc_bw"]))
        ret["pho_l"] = jnp.mean(pho_l, -1)

        cyc_l = (results["disoccs_fw"]
                 * jnp.abs(results["xyzs_fw_bw"] - results["xyzs_fine"])
                 / jnp.mean(results["disoccs_fw"]))
        cyc_l = cyc_l + (results["disoccs_bw"]
                         * jnp.abs(results["xyzs_bw_fw"] - results["xyzs_fine"])
                         / jnp.mean(results["disoccs_bw"]))
        ret["cyc_l"] = jnp.mean(cyc_l, (-2, -1))

        N = results["xyzs_fine"].shape[1]
        n_near = int(N * Z_FAR)  # static slice (losses.py:143-146)
        xyzs_w = ray_ops.ndc2world(results["xyzs_fine"][:, :n_near], Ks_r)
        xyzs_fw_w = ray_ops.ndc2world(results["xyzs_fw"][:, :n_near], Ks_r)
        xyzs_bw_w = ray_ops.ndc2world(results["xyzs_bw"][:, :n_near], Ks_r)

        ret["reg_temp_sm_l"] = cfg.lambda_reg * jnp.mean(
            jnp.abs(xyzs_fw_w + xyzs_bw_w - 2 * xyzs_w), (-2, -1))
        ret["reg_min_l"] = cfg.lambda_reg * jnp.mean(
            jnp.abs(xyzs_fw_w - xyzs_w) + jnp.abs(xyzs_bw_w - xyzs_w), (-2, -1))

        d = jnp.linalg.norm(xyzs_w[:, 1:] - xyzs_w[:, :-1], axis=-1,
                            keepdims=True)
        sp_w = jnp.exp(-2 * d)
        sf_fw = xyzs_fw_w - xyzs_w
        sf_bw = xyzs_bw_w - xyzs_w
        ret["reg_sp_sm_l"] = cfg.lambda_reg * jnp.mean(
            jnp.abs(sf_fw[:, 1:] - sf_fw[:, :-1]) * sp_w
            + jnp.abs(sf_bw[:, 1:] - sf_bw[:, :-1]) * sp_w, (-2, -1))

    return _finalize_terms(ret, masks, weights, cfg)


def compute_losses_planar(
    results: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    *,
    epoch,
    Ks: jnp.ndarray,
    Ps: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """`compute_losses` for the planar train path
    (`models/raymarch.py::render_train_planar`): per-sample vectors arrive
    as 3-tuples of dense (N, S) component planes instead of (N, S, 3)
    arrays, so nothing here touches a lane-padded layout. Term-for-term
    identical to `compute_losses` (asserted in tests/test_planar_path.py
    and tests/test_planar_c2f.py), including the coarse rgb/depth terms
    when the renderer ran coarse-to-fine (`losses.py:76-83`)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    lambda_geo = cfg.lambda_geo_init * 0.1 ** jnp.floor(epoch / 10.0)

    ret: Dict[str, jnp.ndarray] = {}
    masks: Dict[str, jnp.ndarray] = {}

    rgbs = batch["rgbs"]
    col_l = jnp.mean((results["rgb_fine"] - rgbs) ** 2, -1)
    if "rgb_coarse" in results:
        col_l = col_l + 0.1 * jnp.mean(
            (results["rgb_coarse"] - rgbs) ** 2, -1)
    ret["col_l"] = col_l
    disp_l = lambda_geo * shiftscale_invariant_depthloss(
        results["depth_fine"], batch["disps"])
    if "depth_coarse" in results:
        disp_l = disp_l + lambda_geo * shiftscale_invariant_depthloss(
            results["depth_coarse"], batch["disps"])
    ret["disp_l"] = disp_l

    tw = results["transient_weights"]  # (N, S)
    ret["entropy_l"] = cfg.lambda_ent * jnp.sum(
        -tw * jnp.log(tw + 1e-8), -1)

    cross_entropy_w = cfg.lambda_ent / 5 * jnp.minimum(epoch / 10.0, 1.0)
    tr_w = _dilate_along_samples(jax.lax.stop_gradient(tw), cfg.thickness)
    ret["cross_entropy_l"] = cross_entropy_w * jnp.sum(
        tr_w * jnp.log(results["static_weights"] + 1e-8), -1)

    Ks_r = _flow_uv_terms(ret, masks, results["xyz_fw"],
                          results["xyz_bw"], batch, cfg, lambda_geo,
                          Ks, Ps)

    S = tw.shape[1]
    if "rgb_fw_g" in results:
        # importance-concentrated warp estimator
        # (RenderConfig.warp_importance): the renderer evaluated BOTH
        # warp directions on K Horvitz-Thompson-selected rays
        # (models/raymarch.py::_importance_select). Scattering each
        # selected ray's pho/cyc contribution back with its 1/pi weight
        # v makes every per-ray vector an unbiased estimate of the exact
        # path's (losses.py:126-141); the disocc normalizers are the
        # matching HT estimates of the batch means (self-normalized
        # ratio, same approximation class as the ws2 per-half means).
        # With warp_importance=1.0 this reduces EXACTLY to the exact
        # terms (pi = 1, idx = identity; tests/test_warp_importance.py).
        idx = results["warp_idx"]
        v = results["warp_v"]
        n_rays = rgbs.shape[0]
        rgbs_g = rgbs[idx]

        def ht_scatter(contrib):  # (K,) -> unbiased per-ray (N,) vector
            return jnp.zeros((n_rays,), contrib.dtype).at[idx].add(
                v * contrib)

        d_fw = results["disocc_fw_g"][:, 0]
        d_bw = results["disocc_bw_g"][:, 0]
        r_fw = jnp.mean((results["rgb_fw_g"] - rgbs_g) ** 2, -1)
        r_bw = jnp.mean((results["rgb_bw_g"] - rgbs_g) ** 2, -1)
        den_fw = jnp.sum(v * d_fw) / n_rays
        den_bw = jnp.sum(v * d_bw) / n_rays
        ret["pho_l"] = (ht_scatter(d_fw * r_fw) / den_fw
                        + ht_scatter(d_bw * r_bw) / den_bw)

        cyc_abs_fw = sum(jnp.abs(a - b)
                         for a, b in zip(results["xyzs_fw_bw_g"],
                                         results["xyzs_g"]))
        cyc_abs_bw = sum(jnp.abs(a - b)
                         for a, b in zip(results["xyzs_bw_fw_g"],
                                         results["xyzs_g"]))
        dfs = results["disoccs_fw_g"]
        dbs = results["disoccs_bw_g"]
        den_fws = jnp.sum(v * jnp.mean(dfs, -1)) / n_rays
        den_bws = jnp.sum(v * jnp.mean(dbs, -1)) / n_rays
        ret["cyc_l"] = (
            ht_scatter(jnp.sum(dfs * cyc_abs_fw, -1)) / den_fws
            + ht_scatter(jnp.sum(dbs * cyc_abs_bw, -1)) / den_bws
        ) / (3 * S)
    elif "rgb_w" in results:
        # warp-subsampled path (RenderConfig.warp_subsample=2): each ray
        # carries ONE warp direction (first half fw, second half bw), so
        # the fw statistics come from the first half and the bw from the
        # second, each term at 2x weight — the batch-expectation equals
        # the exact fw+bw loss (rows are i.i.d. draws). The per-direction
        # disocc normalizers (losses.py:129-140) are per-half means.
        n2 = rgbs.shape[0] // 2
        dw = results["disocc_w"]  # (N, 1)
        pho = dw * (results["rgb_w"] - rgbs) ** 2
        pho = jnp.concatenate([pho[:n2] / jnp.mean(dw[:n2]),
                               pho[n2:] / jnp.mean(dw[n2:])], 0)
        ret["pho_l"] = 2.0 * jnp.mean(pho, -1)

        cyc_abs = sum(jnp.abs(a - b) for a, b in zip(results["xyzs_wb"],
                                                     results["xyzs"]))
        dws = results["disoccs_w"]  # (N, S)
        cyc = dws * cyc_abs
        cyc = jnp.concatenate([cyc[:n2] / jnp.mean(dws[:n2]),
                               cyc[n2:] / jnp.mean(dws[n2:])], 0)
        ret["cyc_l"] = 2.0 * jnp.sum(cyc, -1) / (3 * S)
    else:
        # photometric warping loss (losses.py:126-133)
        pho_l = (results["disocc_fw"] * (results["rgb_fw"] - rgbs) ** 2
                 / jnp.mean(results["disocc_fw"]))
        pho_l = pho_l + (results["disocc_bw"]
                         * (results["rgb_bw"] - rgbs) ** 2
                         / jnp.mean(results["disocc_bw"]))
        ret["pho_l"] = jnp.mean(pho_l, -1)

        # cycle consistency (losses.py:135-141): mean over (S, 3) of
        # disoccs * |xyz_fw_bw - xyz| == sum_c of plane products / (3*S)
        cyc_abs_fw = sum(jnp.abs(a - b)
                         for a, b in zip(results["xyzs_fw_bw"],
                                         results["xyzs"]))
        cyc_abs_bw = sum(jnp.abs(a - b)
                         for a, b in zip(results["xyzs_bw_fw"],
                                         results["xyzs"]))
        cyc_l = (results["disoccs_fw"] * cyc_abs_fw
                 / jnp.mean(results["disoccs_fw"])
                 + results["disoccs_bw"] * cyc_abs_bw
                 / jnp.mean(results["disoccs_bw"]))
        ret["cyc_l"] = jnp.sum(cyc_l, -1) / (3 * S)

    n_near = int(S * Z_FAR)  # static slice (losses.py:143-146)
    # minor-dim (lane) slices of dense (N, S) planes force XLA layout
    # copies (~0.13 ms each at batch 8192, ~8 ms/step total with their
    # pad adjoints); instead keep every op full-width and restrict via
    # reduction masks, with adjacent-sample differences as one matmul by
    # a bidiagonal difference matrix (dense, MXU-trivial, dense adjoint)
    col = jnp.arange(S)
    m_near = (col < n_near).astype(jnp.float32)[None]  # (1, S)
    m_diff = (col < n_near - 1).astype(jnp.float32)[None]
    diff_m = (jnp.eye(S, S, -1) - jnp.eye(S)).at[:, S - 1].set(0.0)

    def ndc2world_planes(planes):
        """Component-planar `ray_ops.ndc2world`, full width."""
        fx, fy = Ks_r[:, 0:1, 0], Ks_r[:, 1:2, 1]
        cx, cy = Ks_r[:, 0:1, 2], Ks_r[:, 1:2, 2]
        x, y, z = planes
        rz = 2.0 / (z - 1 - 1e-6)
        return (-rz * x * cx / fx, -rz * y * cy / fy, rz)

    xyzs_w = ndc2world_planes(results["xyzs"])
    xyzs_fw_w = ndc2world_planes(results["xyzs_fw"])
    xyzs_bw_w = ndc2world_planes(results["xyzs_bw"])

    ret["reg_temp_sm_l"] = cfg.lambda_reg * sum(
        jnp.sum(jnp.abs(f + b - 2 * x) * m_near, -1)
        for f, b, x in zip(xyzs_fw_w, xyzs_bw_w, xyzs_w)) / (3 * n_near)
    ret["reg_min_l"] = cfg.lambda_reg * sum(
        jnp.sum((jnp.abs(f - x) + jnp.abs(b - x)) * m_near, -1)
        for f, b, x in zip(xyzs_fw_w, xyzs_bw_w, xyzs_w)) / (3 * n_near)

    def adiff(p):  # adiff(p)[:, s] = p[:, s+1] - p[:, s]
        # HIGHEST precision: adjacent-sample differences of world
        # coordinates cancel catastrophically under the TPU default's
        # bf16 operand rounding (ADVICE r2); the (S, S) dot is cheap
        return jnp.dot(p, diff_m, precision=jax.lax.Precision.HIGHEST)

    dist = jnp.sqrt(sum(adiff(x) ** 2 for x in xyzs_w) + 1e-20)
    sp_w = jnp.exp(-2 * dist) * m_diff
    ret["reg_sp_sm_l"] = cfg.lambda_reg * sum(
        jnp.sum((jnp.abs(adiff(f - x)) + jnp.abs(adiff(b - x))) * sp_w, -1)
        for f, b, x in zip(xyzs_fw_w, xyzs_bw_w, xyzs_w)) / (3 * (n_near - 1))

    return _finalize_terms(ret, masks, weights, cfg)


def total_loss(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum of all terms (`train.py:188`)."""
    return sum(loss_dict.values())
