"""Planar fused NeRF train kernels — dense (N, S) boundaries.

Round-2 profiling (docs/ARCHITECTURE.md, docs/RAYMARCH_KERNEL.md) showed
the (rows, 16)/(rows, 3) pallas boundaries of `ops/mlp_train_kernel.py`
cost ~8 ms/step in XLA layout copies at batch 8192: any f32 array with a
minor dim < 128 is physically lane-padded 8-42x in HBM, so every packed
output, xyz input, and cotangent hand-off moves half a gigabyte. This
module is the same trainable fused evaluation with the boundary layout
redesigned so that NOTHING padded crosses the kernel edge:

- per-sample quantities cross as dense (N, S) "planes" — S = N_samples =
  128 exactly fills the TPU lane width (4 MB instead of 512 MB at batch
  8192);
- the (rows, 3) xyz input disappears entirely: because the positional
  encoding is a selector matmul (ops/mlp_kernel.py), posenc(o + d*z) =
  bcast(o @ sel) + bcast(d @ sel) * z, so the kernel assembles the
  encoding from tiny per-ray (R, 3) origin/direction tiles and the dense
  (R, S) z block (per-ray slice+transpose bridge, measured ~0.3 ms/1M
  rows in round 2);
- warped evaluations take the scene flow as three dense (N, S) planes
  and add `flow @ sel` to the encoding in-kernel; their flow cotangent
  leaves as dense planes the same way.

The tower math is identical to `ops/mlp_train_kernel.py` (recompute-in-
VMEM backward, dW accumulated across the sequential grid, per-ray
embedding-grad reduction in-kernel); reference semantics cites live
there and in `ops/mlp_kernel.py`.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsff_pl_tpu.ops.mlp_kernel import (SEG, _mm, _posenc_tables, _sin_poly)
from nsff_pl_tpu.ops.mlp_train_kernel import (branch_weight_names,
                                              pack_padded_weights,
                                              unpad_padded_grads)
from nsff_pl_tpu.ops.posenc import posenc_freqs

F32 = jnp.float32
BF16 = jnp.bfloat16


def planar_out_keys(*, static_branch: bool, encode_t: bool,
                    output_flow: Tuple[str, ...]):
    """Ordered output-plane names of the fused evaluator."""
    keys = []
    if static_branch:
        keys += ["srgb_r", "srgb_g", "srgb_b", "ssig"]
    if encode_t:
        keys += ["trgb_r", "trgb_g", "trgb_b", "tsig"]
        if "fw" in output_flow:
            keys += ["ffw_x", "ffw_y", "ffw_z"]
        if "bw" in output_flow:
            keys += ["fbw_x", "fbw_y", "fbw_z"]
    return keys


def make_planar_nerf_train(
    n_samples: int,
    *,
    static_branch: bool = True,
    flow_in: bool = False,
    use_viewdir: bool = False,
    encode_a: bool = False,
    encode_t: bool = True,
    output_flow: Tuple[str, ...] = (),
    n_emb_xyz: int = 10,
    s_emb_xyz: float = 9.0,
    n_emb_dir: int = 4,
    n_a: int = 48,
    n_tau: int = 48,
    flow_scale: float = 0.2,
    D: int = 8,
    skips=(4,),
    block_rows: int = 2048,
    bwd_block_rows: int = 1024,
):
    """Build the planar fused trainable evaluator.

    Returns fn(params, o, d, zs, flows, dir_emb, a_emb, t_emb) -> dict of
    dense (N, S) planes (see `planar_out_keys`), where o/d are (N, 3) ray
    origins/directions, zs is (N, S) sample depths (xyz = o + d*z is
    formed in-kernel), and flows (when `flow_in`) is a 3-tuple of (N, S)
    planes added to xyz (the warped evaluation's xyz + flow,
    reference `rendering.py:217-232`).

    Differentiable in params, flows, and the per-ray embeddings; o/d/zs
    are data (their cotangents are structurally zero on this path: the
    main evaluation's sample positions carry no parameter dependence).
    Flow output planes are RAW (flow_scale * tanh(head)); the caller
    applies the z > z_far mask in XLA (`rendering.py:316` semantics) so
    its gradient is handled by autodiff.
    """
    freqs = tuple(float(f) for f in posenc_freqs(s_emb_xyz, n_emb_xyz))
    xyz_w = 3 + 6 * n_emb_xyz
    dir_w = 3 + 6 * n_emb_dir
    use_viewdir = use_viewdir and static_branch
    encode_a = encode_a and static_branch
    if block_rows % n_samples != 0:
        block_rows = max(n_samples, (block_rows // n_samples) * n_samples)
    R_F = block_rows // n_samples  # forward rays/block
    BLK_F = R_F * n_samples
    BWD_BLK = bwd_block_rows
    if BWD_BLK % n_samples != 0:
        BWD_BLK = max(n_samples, (BWD_BLK // n_samples) * n_samples)
    R_B = BWD_BLK // n_samples
    if R_B % 8 != 0:  # per-ray (R, C) tiles need sublane alignment
        R_B = max(8, ((R_B + 7) // 8) * 8)
        BWD_BLK = R_B * n_samples

    static_names, transient_names = branch_weight_names(
        D=D, skips=skips, use_viewdir=use_viewdir,
        static_branch=static_branch, encode_t=encode_t)
    weight_names = static_names + transient_names
    out_keys = planar_out_keys(static_branch=static_branch,
                               encode_t=encode_t, output_flow=output_flow)
    n_out = len(out_keys)
    # cotangent plane orders per backward branch
    g_static_keys = ["srgb_r", "srgb_g", "srgb_b", "ssig"]
    g_trans_keys = (["trgb_r", "trgb_g", "trgb_b", "tsig"]
                    + [k for k in out_keys if k[0] == "f"])

    pack_kw = dict(encode_t=encode_t, output_flow=output_flow, skips=skips,
                   xyz_w=xyz_w, n_tau=n_tau, dir_w=dir_w, n_a=n_a,
                   encode_a=encode_a)

    # ------------------------------------------------------------------
    # in-kernel helpers
    # ------------------------------------------------------------------
    def _xs_from_rays(o, d, zs, pe_sel, n_rays, fl_rows=None):
        """Assemble the posenc pre-activation for xyz = o + d*z (+ flow)
        without a (rows, 3) xyz array: xs = (o @ sel) + (d @ sel)*z
        [+ flow @ sel], built per-ray via the slice+transpose bridge."""
        o_sel = jnp.dot(o, pe_sel, preferred_element_type=F32)  # (R, SEG)
        d_sel = jnp.dot(d, pe_sel, preferred_element_type=F32)
        rows = []
        for r in range(n_rays):
            z_col = zs[r:r + 1, :].T  # (S, 1)
            rows.append(o_sel[r:r + 1, :] + d_sel[r:r + 1, :] * z_col)
        xs = jnp.concatenate(rows, 0)  # (BLK, SEG)
        if fl_rows is not None:
            xs = xs + jnp.dot(fl_rows, pe_sel, preferred_element_type=F32)
        return xs

    def _planes_to_rows(planes, n_rays):
        """k dense (R, S) planes -> (R*S, k) ray-major rows."""
        st = jnp.stack(planes, 0)  # (k, R, S)
        return st.reshape(len(planes), n_rays * n_samples).T

    def _tower_fwd(wb, prefix, inp, keep_acts):
        """Tower with skip layers as split dots on the padded layout."""
        acts = [inp]
        h = inp
        for i in range(D):
            w, b = wb[f"{prefix}_{i}"]
            if i in skips:
                z = (jnp.dot(inp, w[:SEG], preferred_element_type=F32)
                     + jnp.dot(h, w[SEG:SEG + 256],
                               preferred_element_type=F32) + b)
            else:
                z = _mm(h, w, b)
            h = jnp.maximum(z, 0.0).astype(BF16)
            if keep_acts:
                acts.append(h)
        return acts if keep_acts else h

    def _bcast(v, n_rays, blk):
        """(R, C) per-ray -> (BLK, C) per-sample."""
        v = jnp.broadcast_to(v[:, None, :], (n_rays, n_samples, v.shape[-1]))
        return v.reshape(blk, v.shape[-1])

    # ------------------------------------------------------------------
    # forward kernel
    # ------------------------------------------------------------------
    def fwd_kernel(*refs):
        it = iter(refs)
        pe_sel = next(it)[...]
        pe_id = next(it)[...]
        pe_phase = next(it)[...]
        pe_valid = next(it)[...]
        t_sel = next(it)[...] if encode_t else None
        o = next(it)[...]
        dvec = next(it)[...]
        zs = next(it)[...]
        fl = [next(it)[...] for _ in range(3)] if flow_in else None
        dir_t = next(it)[...] if use_viewdir else None
        a_t = next(it)[...] if encode_a else None
        t_t = next(it)[...] if encode_t else None
        wb = {}
        for name in weight_names:
            w = next(it)
            b = next(it)
            wb[name] = (w[...], b[...][0])
        out_refs = [next(it) for _ in range(n_out)]

        fl_rows = _planes_to_rows(fl, R_F) if flow_in else None
        xs = _xs_from_rays(o, dvec, zs, pe_sel, R_F, fl_rows)
        pe = jnp.where(pe_id > 0, xs, _sin_poly(xs + pe_phase)) * pe_valid

        cols = []
        if static_branch:
            h = _tower_fwd(wb, "static_xyz", pe.astype(BF16), False)
            w, b = wb["static_sigma"]
            static_sigma = _mm(h, w, b)
            w, b = wb["static_xyz_final"]
            feat0 = _mm(h, w, b)
            if use_viewdir:
                w, b = wb["static_dir"]
                ray_z = jnp.dot(dir_t.astype(BF16), w[256:256 + dir_w],
                                preferred_element_type=F32) + b
                if encode_a:
                    ray_z = ray_z + jnp.dot(
                        a_t.astype(BF16), w[256 + SEG:256 + SEG + n_a],
                        preferred_element_type=F32)
                z = jnp.dot(feat0.astype(BF16), w[:256],
                            preferred_element_type=F32) \
                    + _bcast(ray_z, R_F, BLK_F)
                feat = jnp.maximum(z, 0.0).astype(BF16)
            else:
                feat = feat0.astype(BF16)
            w, b = wb["static_rgb"]
            static_rgb = jax.nn.sigmoid(_mm(feat, w, b))
            cols += [static_rgb, static_sigma]
        if encode_t:
            t_part = jnp.dot(t_t.astype(F32), t_sel,
                             preferred_element_type=F32)
            tx = (pe + _bcast(t_part, R_F, BLK_F)).astype(BF16)
            h = _tower_fwd(wb, "transient_xyz", tx, False)
            w, b = wb["transient_xyz_final"]
            featb = _mm(h, w, b).astype(BF16)
            w, b = wb["transient_heads"]
            th = _mm(featb, w, b)
            cols += [jax.nn.sigmoid(th[:, 1:4]), th[:, 0:1]]
            c = 4
            for f in ("fw", "bw"):
                if f in output_flow:
                    cols.append(flow_scale * jnp.tanh(th[:, c:c + 3]))
                    c += 3
        packed = jnp.concatenate(cols, -1)  # (BLK, n_out)
        planes = packed.T.reshape(n_out, R_F, n_samples)
        for i, ref in enumerate(out_refs):
            ref[...] = planes[i]

    # ------------------------------------------------------------------
    # backward kernels (one per branch; tower recompute in VMEM)
    # ------------------------------------------------------------------
    def make_branch_bwd(branch: str):
        names = static_names if branch == "static" else transient_names
        g_keys = g_static_keys if branch == "static" else g_trans_keys
        emit_dflow = flow_in and branch == "transient"

        def bwd_kernel(*refs):
            it = iter(refs)
            pe_sel = next(it)[...]
            pe_id = next(it)[...]
            pe_phase = next(it)[...]
            pe_valid = next(it)[...]
            t_sel = next(it)[...] if branch == "transient" else None
            o = next(it)[...]
            dvec = next(it)[...]
            zs = next(it)[...]
            fl = [next(it)[...] for _ in range(3)] if flow_in else None
            dir_t = next(it)[...] if (use_viewdir and branch == "static") \
                else None
            a_t = next(it)[...] if (encode_a and branch == "static") \
                else None
            t_t = next(it)[...] if branch == "transient" else None
            wb = {}
            for name in names:
                w = next(it)
                b = next(it)
                wb[name] = (w[...], b[...][0])
            g_planes = [next(it)[...] for _ in range(len(g_keys))]
            dW = {}
            for name in names:
                dW[name] = (next(it), next(it))
            ddir_ref = next(it) if (use_viewdir and branch == "static") \
                else None
            da_ref = next(it) if (encode_a and branch == "static") else None
            dt_ref = next(it) if branch == "transient" else None
            dfl_refs = [next(it) for _ in range(3)] if emit_dflow else None

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for name in names:
                    dW[name][0][...] = jnp.zeros_like(dW[name][0])
                    dW[name][1][...] = jnp.zeros_like(dW[name][1])

            fl_rows = _planes_to_rows(fl, R_B) if flow_in else None
            xs = _xs_from_rays(o, dvec, zs, pe_sel, R_B, fl_rows)
            pe = jnp.where(pe_id > 0, xs, _sin_poly(xs + pe_phase)) * pe_valid
            g = _planes_to_rows(g_planes, R_B)  # (BWD_BLK, len(g_keys))

            def ray_sum(v):
                return jnp.sum(
                    v.reshape(R_B, n_samples, v.shape[-1]), axis=1)

            def pad_to_seg(v):
                if v.shape[-1] == SEG:
                    return v
                return jnp.concatenate(
                    [v, jnp.zeros((v.shape[0], SEG - v.shape[-1]),
                                  v.dtype)], -1)

            def tower_bwd(prefix, acts, dh_last):
                inp = acts[0]
                dinp = jnp.zeros((BWD_BLK, SEG), F32)
                dh = dh_last
                for i in range(D - 1, -1, -1):
                    w, _ = wb[f"{prefix}_{i}"]
                    dz = dh * (acts[i + 1].astype(F32) > 0)
                    dzb = dz.astype(BF16)
                    if i in skips:
                        dW[f"{prefix}_{i}"][0][0:SEG, :] += jnp.dot(
                            inp.T, dzb, preferred_element_type=F32)
                        dW[f"{prefix}_{i}"][0][SEG:SEG + 256, :] += jnp.dot(
                            acts[i].T, dzb, preferred_element_type=F32)
                        dW[f"{prefix}_{i}"][1][...] += jnp.sum(
                            dz, 0, keepdims=True)
                        dinp = dinp + jnp.dot(dzb, w[:SEG].T,
                                              preferred_element_type=F32)
                        dh = jnp.dot(dzb, w[SEG:SEG + 256].T,
                                     preferred_element_type=F32)
                    else:
                        dW[f"{prefix}_{i}"][0][...] += jnp.dot(
                            acts[i].T, dzb, preferred_element_type=F32)
                        dW[f"{prefix}_{i}"][1][...] += jnp.sum(
                            dz, 0, keepdims=True)
                        dh = jnp.dot(dzb, w.T, preferred_element_type=F32)
                return dinp + dh

            if branch == "static":
                s_acts = _tower_fwd(wb, "static_xyz", pe.astype(BF16), True)
                h8 = s_acts[-1]
                w_sig, _ = wb["static_sigma"]
                w_fin, b_fin = wb["static_xyz_final"]
                feat0 = _mm(h8, w_fin, b_fin)
                if use_viewdir:
                    w_dir, b_dir = wb["static_dir"]
                    dir_tile = pad_to_seg(dir_t.astype(BF16))
                    ray_z = jnp.dot(dir_tile, w_dir[256:256 + SEG],
                                    preferred_element_type=F32) + b_dir
                    a_tile = None
                    if encode_a:
                        a_tile = pad_to_seg(a_t.astype(BF16))
                        ray_z = ray_z + jnp.dot(
                            a_tile, w_dir[256 + SEG:256 + 2 * SEG],
                            preferred_element_type=F32)
                    feat0b = feat0.astype(BF16)
                    zdir = jnp.dot(feat0b, w_dir[:256],
                                   preferred_element_type=F32) \
                        + _bcast(ray_z, R_B, BWD_BLK)
                    feat = jnp.maximum(zdir, 0.0)
                else:
                    feat = feat0
                featb = feat.astype(BF16)
                w_rgb, b_rgb = wb["static_rgb"]
                s_rgb = jax.nn.sigmoid(_mm(featb, w_rgb, b_rgb))

                g_srgb = g[:, 0:3] * s_rgb * (1.0 - s_rgb)
                g_ssig = g[:, 3:4]
                dW["static_rgb"][0][...] += jnp.dot(
                    featb.T, g_srgb.astype(BF16),
                    preferred_element_type=F32)
                dW["static_rgb"][1][...] += jnp.sum(g_srgb, 0,
                                                    keepdims=True)
                dfeat = jnp.dot(g_srgb.astype(BF16), w_rgb.T,
                                preferred_element_type=F32)
                if use_viewdir:
                    dz = dfeat * (feat > 0)
                    dzb = dz.astype(BF16)
                    dW["static_dir"][0][0:256, :] += jnp.dot(
                        feat0b.T, dzb, preferred_element_type=F32)
                    dW["static_dir"][1][...] += jnp.sum(dz, 0,
                                                        keepdims=True)
                    dzr = ray_sum(dz)
                    dzrb = dzr.astype(BF16)
                    dW["static_dir"][0][256:256 + SEG, :] += jnp.dot(
                        dir_tile.T, dzrb, preferred_element_type=F32)
                    ddir_ref[...] = jnp.dot(
                        dzrb, w_dir[256:256 + dir_w].T,
                        preferred_element_type=F32)
                    if encode_a:
                        dW["static_dir"][0][256 + SEG:256 + 2 * SEG, :] += \
                            jnp.dot(a_tile.T, dzrb,
                                    preferred_element_type=F32)
                        da_ref[...] = jnp.dot(
                            dzrb, w_dir[256 + SEG:256 + SEG + n_a].T,
                            preferred_element_type=F32)
                    dfeat0 = jnp.dot(dzb, w_dir[:256].T,
                                     preferred_element_type=F32)
                else:
                    dfeat0 = dfeat
                dW["static_xyz_final"][0][...] += jnp.dot(
                    h8.T, dfeat0.astype(BF16), preferred_element_type=F32)
                dW["static_xyz_final"][1][...] += jnp.sum(
                    dfeat0, 0, keepdims=True)
                dh8 = jnp.dot(dfeat0.astype(BF16), w_fin.T,
                              preferred_element_type=F32)
                g_ssigb = g_ssig.astype(BF16)
                dW["static_sigma"][0][...] += jnp.dot(
                    h8.T, g_ssigb, preferred_element_type=F32)
                dW["static_sigma"][1][...] += jnp.sum(g_ssig, 0,
                                                      keepdims=True)
                dh8 = dh8 + jnp.dot(g_ssigb, w_sig.T,
                                    preferred_element_type=F32)
                tower_bwd("static_xyz", s_acts, dh8)
                # no dxyz chain: o/d/zs carry no parameter dependence
            else:  # transient branch
                t_part = jnp.dot(t_t.astype(F32), t_sel,
                                 preferred_element_type=F32)
                tx = (pe + _bcast(t_part, R_B, BWD_BLK)).astype(BF16)
                t_acts = _tower_fwd(wb, "transient_xyz", tx, True)
                th8 = t_acts[-1]
                w_tfin, b_tfin = wb["transient_xyz_final"]
                tfeatb = _mm(th8, w_tfin, b_tfin).astype(BF16)
                w_th, b_th = wb["transient_heads"]
                th = _mm(tfeatb, w_th, b_th)
                t_rgb = jax.nn.sigmoid(th[:, 1:4])
                # g columns: [trgb(3), tsig(1), flows...]
                g_cols = [g[:, 3:4], g[:, 0:3] * t_rgb * (1.0 - t_rgb)]
                c_in, c_th = 4, 4
                for f in ("fw", "bw"):
                    if f in output_flow:
                        tf = jnp.tanh(th[:, c_th:c_th + 3])
                        g_cols.append(g[:, c_in:c_in + 3] * flow_scale
                                      * (1.0 - tf * tf))
                        c_in += 3
                        c_th += 3
                g_th = jnp.concatenate(g_cols, -1)
                dW["transient_heads"][0][...] += jnp.dot(
                    tfeatb.T, g_th.astype(BF16),
                    preferred_element_type=F32)
                dW["transient_heads"][1][...] += jnp.sum(g_th, 0,
                                                         keepdims=True)
                dtfeat = jnp.dot(g_th.astype(BF16), w_th.T,
                                 preferred_element_type=F32)
                dW["transient_xyz_final"][0][...] += jnp.dot(
                    th8.T, dtfeat.astype(BF16),
                    preferred_element_type=F32)
                dW["transient_xyz_final"][1][...] += jnp.sum(
                    dtfeat, 0, keepdims=True)
                dth8 = jnp.dot(dtfeat.astype(BF16), w_tfin.T,
                               preferred_element_type=F32)
                dtx = tower_bwd("transient_xyz", t_acts, dth8)
                dpe = dtx * pe_valid
                dtxr = ray_sum(dtx).astype(BF16)
                dt_ref[...] = jnp.dot(dtxr, t_sel.T.astype(BF16),
                                      preferred_element_type=F32)
                if emit_dflow:
                    dxs = jnp.where(
                        pe_id > 0, dpe,
                        dpe * _sin_poly(xs + pe_phase
                                        + 1.5707963267948966))
                    # f32 dot: the planar transpose that follows would
                    # otherwise fold into the dot as a transposed-
                    # contraction bf16 form XLA:CPU cannot execute; the
                    # (SEG, 3) contraction is tiny either way
                    dfl_rows = jnp.dot(dxs, pe_sel.T,
                                       preferred_element_type=F32)
                    dfl = dfl_rows.T.reshape(3, R_B, n_samples)
                    for i, ref in enumerate(dfl_refs):
                        ref[...] = dfl[i]

        return bwd_kernel

    bwd_kernels = {}
    if static_branch:
        bwd_kernels["static"] = make_branch_bwd("static")
    if encode_t:
        bwd_kernels["transient"] = make_branch_bwd("transient")

    # ------------------------------------------------------------------
    # host-side plumbing
    # ------------------------------------------------------------------
    def _const_specs_args():
        sel, is_id, phase, valid = _posenc_tables(freqs, SEG)
        const2 = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        specs = [const2((3, SEG)), const2((1, SEG)), const2((1, SEG)),
                 const2((1, SEG))]
        args = [jnp.asarray(sel), jnp.asarray(is_id), jnp.asarray(phase),
                jnp.asarray(valid)]
        return specs, args, const2

    def _t_sel():
        tsel = np.zeros((n_tau, SEG), np.float32)
        for j in range(n_tau):
            tsel[j, xyz_w + j] = 1.0
        return jnp.asarray(tsel)

    def _pad_rays(vs, n, n_pad):
        """Zero-pad a list of (N, ...) arrays to n_pad rays."""
        if n_pad == n:
            return vs
        out = []
        for v in vs:
            if v is None:
                out.append(None)
                continue
            out.append(jnp.concatenate(
                [v, jnp.zeros((n_pad - n,) + v.shape[1:], v.dtype)], 0))
        return out

    interpret = lambda: jax.default_backend() == "cpu"  # noqa: E731

    def _fwd_host(params, o, d, zs, flows, dir_emb, a_emb, t_emb):
        n = o.shape[0]
        n_pad = n + (-n) % R_F
        n_blocks = n_pad * n_samples // BLK_F
        o, d, zs, dir_emb, a_emb, t_emb = _pad_rays(
            [o, d, zs, dir_emb, a_emb, t_emb], n, n_pad)
        if flow_in:
            flows = tuple(_pad_rays(list(flows), n, n_pad))

        pw = pack_padded_weights(params, weight_names, **pack_kw)
        specs, args, const2 = _const_specs_args()
        plane = pl.BlockSpec((R_F, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        ray_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (R_F, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if encode_t:
            specs.append(const2((n_tau, SEG)))
            args.append(_t_sel())
        specs += [ray_spec(3), ray_spec(3), plane]
        args += [o, d, zs]
        if flow_in:
            specs += [plane] * 3
            args += list(flows)
        if use_viewdir:
            specs.append(ray_spec(dir_emb.shape[-1]))
            args.append(dir_emb)
        if encode_a:
            specs.append(ray_spec(a_emb.shape[-1]))
            args.append(a_emb)
        if encode_t:
            specs.append(ray_spec(t_emb.shape[-1]))
            args.append(t_emb)
        for name in weight_names:
            w, b = pw[name]["w"], pw[name]["b"]
            specs += [const2(w.shape), const2(b.shape)]
            args += [w, b]

        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        except TypeError:
            compiler_params = None
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=specs,
            out_specs=(plane,) * n_out,
            out_shape=tuple(jax.ShapeDtypeStruct((n_pad, n_samples), F32)
                            for _ in range(n_out)),
            interpret=interpret(),
            compiler_params=compiler_params,
        )(*args)
        return {k: v[:n] for k, v in zip(out_keys, outs)}

    def _branch_bwd_host(branch, pw, o, d, zs, flows, dir_emb, a_emb,
                         t_emb, g, n_pad, n_blocks):
        names = static_names if branch == "static" else transient_names
        g_keys = g_static_keys if branch == "static" else g_trans_keys
        emit_dflow = flow_in and branch == "transient"

        specs, args, const2 = _const_specs_args()
        plane = pl.BlockSpec((R_B, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        ray_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (R_B, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if branch == "transient":
            specs.append(const2((n_tau, SEG)))
            args.append(_t_sel())
        specs += [ray_spec(3), ray_spec(3), plane]
        args += [o, d, zs]
        if flow_in:
            specs += [plane] * 3
            args += list(flows)
        if use_viewdir and branch == "static":
            specs.append(ray_spec(dir_emb.shape[-1]))
            args.append(dir_emb)
        if encode_a and branch == "static":
            specs.append(ray_spec(a_emb.shape[-1]))
            args.append(a_emb)
        if branch == "transient":
            specs.append(ray_spec(t_emb.shape[-1]))
            args.append(t_emb)
        for name in names:
            w, b = pw[name]["w"], pw[name]["b"]
            specs += [const2(w.shape), const2(b.shape)]
            args += [w, b]
        for k in g_keys:
            specs.append(plane)
            args.append(g[k])

        out_shapes, out_specs = [], []
        for name in names:
            w, b = pw[name]["w"], pw[name]["b"]
            out_shapes += [jax.ShapeDtypeStruct(w.shape, F32),
                           jax.ShapeDtypeStruct(b.shape, F32)]
            out_specs += [const2(w.shape), const2(b.shape)]
        if use_viewdir and branch == "static":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_pad, dir_emb.shape[-1]), F32))
            out_specs.append(ray_spec(dir_emb.shape[-1]))
        if encode_a and branch == "static":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_pad, a_emb.shape[-1]), F32))
            out_specs.append(ray_spec(a_emb.shape[-1]))
        if branch == "transient":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_pad, t_emb.shape[-1]), F32))
            out_specs.append(ray_spec(t_emb.shape[-1]))
        if emit_dflow:
            out_shapes += [jax.ShapeDtypeStruct((n_pad, n_samples), F32)] * 3
            out_specs += [plane] * 3

        try:
            # whole-ray blocks push the working set past the default 16M
            # scoped-vmem cap; scale the cap with the block size
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=(24 + 26 * max(0, BWD_BLK // 1024 - 1))
                * 1024 * 1024)
        except TypeError:
            compiler_params = None
        return pl.pallas_call(
            bwd_kernels[branch],
            grid=(n_blocks,),
            in_specs=specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret(),
            compiler_params=compiler_params,
        )(*args)

    def _bwd_host(params, o, d, zs, flows, dir_emb, a_emb, t_emb, g):
        n = o.shape[0]
        n_pad = n + (-n) % R_B
        n_blocks = n_pad * n_samples // BWD_BLK
        o, d, zs, dir_emb, a_emb, t_emb = _pad_rays(
            [o, d, zs, dir_emb, a_emb, t_emb], n, n_pad)
        if flow_in:
            flows = tuple(_pad_rays(list(flows), n, n_pad))
        gp = {k: _pad_rays([g[k].astype(F32)], n, n_pad)[0]
              for k in out_keys}
        pw = pack_padded_weights(params, weight_names, **pack_kw)

        dws = {}
        ddir = da = dt = None
        dflows = None
        if static_branch:
            outs = _branch_bwd_host("static", pw, o, d, zs, flows,
                                    dir_emb, a_emb, t_emb, gp, n_pad,
                                    n_blocks)
            it = iter(outs)
            for name in static_names:
                dws[name] = {"w": next(it), "b": next(it)}
            ddir = next(it)[:n] if use_viewdir else None
            da = next(it)[:n] if encode_a else None
        if encode_t:
            outs = _branch_bwd_host("transient", pw, o, d, zs, flows,
                                    dir_emb, a_emb, t_emb, gp, n_pad,
                                    n_blocks)
            it = iter(outs)
            for name in transient_names:
                dws[name] = {"w": next(it), "b": next(it)}
            dt = next(it)[:n]
            if flow_in:
                dflows = tuple(next(it)[:n] for _ in range(3))
        kw = dict(pack_kw)
        kw.pop("encode_t")
        dparams = unpad_padded_grads(dws, weight_names, **kw)
        return dparams, dflows, ddir, da, dt

    # ------------------------------------------------------------------
    @jax.custom_vjp
    def fused(params, o, d, zs, flows, dir_emb, a_emb, t_emb):
        return _fwd_host(params, o, d, zs, flows, dir_emb, a_emb, t_emb)

    def fwd_rule(params, o, d, zs, flows, dir_emb, a_emb, t_emb):
        out = fused(params, o, d, zs, flows, dir_emb, a_emb, t_emb)
        return out, (params, o, d, zs, flows, dir_emb, a_emb, t_emb)

    def bwd_rule(res, g):
        params, o, d, zs, flows, dir_emb, a_emb, t_emb = res
        dparams, dflows, ddir, da, dt = _bwd_host(
            params, o, d, zs, flows, dir_emb, a_emb, t_emb, g)
        full_dparams = jax.tree.map(jnp.zeros_like, params)
        full_dparams.update(dparams)
        return (full_dparams, jnp.zeros_like(o), jnp.zeros_like(d),
                jnp.zeros_like(zs), dflows, ddir, da, dt)

    fused.defvjp(fwd_rule, bwd_rule)
    return fused


def comp_map_cols(*, encode_t: bool, flow: bool):
    """Column layout of the composited eval kernel's (N, M) maps output.

    Returns an ordered {name: (start, width)} over the packed minor dim.
    Base: rgb_fine + depth_fine (the eval CLI's default key set,
    `/root/reference/eval.py:81-110`); transient adds the composite maps
    of `rendering.py:256-295`; flow adds the weighted flow maps of
    `rendering.py:299-321`."""
    cols = {"rgb_fine": (0, 3), "depth_fine": (3, 1)}
    m = 4
    if encode_t:
        cols.update({"transient_rgb_map": (4, 3), "transient_alpha": (7, 1),
                     "_static_rgb_fine": (8, 3), "_static_depth_fine": (11, 1)})
        m = 12
        if flow:
            cols.update({"xyz_fine": (12, 3), "transient_flow_fw": (15, 3),
                         "transient_flow_bw": (18, 3)})
            m = 21
    # pad the packed width to a sublane multiple (cf. the train
    # compositor's 16-wide maps tile)
    return cols, (m + 7) // 8 * 8


def make_planar_nerf_eval_comp(
    n_samples: int,
    *,
    use_viewdir: bool = False,
    encode_a: bool = False,
    encode_t: bool = True,
    output_flow: Tuple[str, ...] = (),
    vis_in: bool = False,
    z_far: float = 0.95,
    n_emb_xyz: int = 10,
    s_emb_xyz: float = 9.0,
    n_emb_dir: int = 4,
    n_a: int = 48,
    n_tau: int = 48,
    flow_scale: float = 0.2,
    D: int = 8,
    skips=(4,),
    block_rows: int = 2048,
    bwd_block_rows: int = 1024,  # unused (no-grad); kept signature-compatible
):
    """No-grad fused evaluator WITH in-kernel volume compositing.

    Same tower forward as `make_planar_nerf_train` (one dual-tower
    evaluation per sample — the reference test path,
    `rendering.py:169-175,217` without the warped renders) but instead of
    writing 8-14 dense (N, S) sigma/rgb/flow planes to HBM and
    compositing in XLA, the transmittance compositing
    (`rendering.py:202-295`) runs in-register on the block's planes and
    the kernel emits ONE per-ray (N, M) maps tile (M <= 21, see
    `comp_map_cols`) — rgb/depth (+ transient/static-only composites and
    weighted flow maps). Round-5 render-floor work: the plane writes +
    XLA compositing epilogue were the measured 82.2%-vs-86.2%-of-floor
    gap (BENCH_r04 `render_floor`, tools/probe_render_floor.py).

    fn(params, o, d, zs, vis, dir_emb, a_emb, t_emb) -> (N, M) f32.
    `vis` (when `vis_in`) is an (N, S) visibility-count plane; samples
    with vis == 0 get transient sigma clamped to -10 pre-softplus
    (test-time culling, `rendering.py:191-200`). `zs` may be an external
    sorted plane (the coarse-to-fine fine pass). Flow maps mask samples
    beyond `z_far` (`rendering.py:316`). Not differentiable (test-time
    only)."""
    from nsff_pl_tpu.ops.compositing_planar_kernel import (
        _deltas, _lane_cumsum_excl, _softplus)

    freqs = tuple(float(f) for f in posenc_freqs(s_emb_xyz, n_emb_xyz))
    xyz_w = 3 + 6 * n_emb_xyz
    dir_w = 3 + 6 * n_emb_dir
    flow = tuple(f for f in output_flow if f in ("fw", "bw")) \
        if encode_t else ()
    emit_flow_maps = bool(flow)
    # flow maps need BOTH directions' planes (xyz_fw = xyz + fw etc.);
    # the heads are two matmul columns — evaluate both when any is asked
    head_flow = ("fw", "bw") if emit_flow_maps else ()
    use_viewdir = bool(use_viewdir)
    encode_a = bool(encode_a)
    if block_rows % n_samples != 0:
        block_rows = max(n_samples, (block_rows // n_samples) * n_samples)
    R_F = block_rows // n_samples
    BLK_F = R_F * n_samples

    static_names, transient_names = branch_weight_names(
        D=D, skips=skips, use_viewdir=use_viewdir,
        static_branch=True, encode_t=encode_t)
    weight_names = static_names + transient_names
    plane_keys = planar_out_keys(static_branch=True, encode_t=encode_t,
                                 output_flow=head_flow)
    n_planes = len(plane_keys)
    cols_map, n_map = comp_map_cols(encode_t=encode_t, flow=emit_flow_maps)

    pack_kw = dict(encode_t=encode_t, output_flow=head_flow, skips=skips,
                   xyz_w=xyz_w, n_tau=n_tau, dir_w=dir_w, n_a=n_a,
                   encode_a=encode_a)

    def _xs_from_rays(o, d, zs, pe_sel):
        o_sel = jnp.dot(o, pe_sel, preferred_element_type=F32)
        d_sel = jnp.dot(d, pe_sel, preferred_element_type=F32)
        rows = []
        for r in range(R_F):
            z_col = zs[r:r + 1, :].T
            rows.append(o_sel[r:r + 1, :] + d_sel[r:r + 1, :] * z_col)
        return jnp.concatenate(rows, 0)

    def _tower_fwd(wb, prefix, inp):
        h = inp
        for i in range(D):
            w, b = wb[f"{prefix}_{i}"]
            if i in skips:
                z = (jnp.dot(inp, w[:SEG], preferred_element_type=F32)
                     + jnp.dot(h, w[SEG:SEG + 256],
                               preferred_element_type=F32) + b)
            else:
                z = _mm(h, w, b)
            h = jnp.maximum(z, 0.0).astype(BF16)
        return h

    def _bcast(v):
        v = jnp.broadcast_to(v[:, None, :], (R_F, n_samples, v.shape[-1]))
        return v.reshape(BLK_F, v.shape[-1])

    def kernel(*refs):
        it = iter(refs)
        pe_sel = next(it)[...]
        pe_id = next(it)[...]
        pe_phase = next(it)[...]
        pe_valid = next(it)[...]
        t_sel = next(it)[...] if encode_t else None
        o = next(it)[...]
        dvec = next(it)[...]
        zs = next(it)[...]
        vis = next(it)[...] if vis_in else None
        dir_t = next(it)[...] if use_viewdir else None
        a_t = next(it)[...] if encode_a else None
        t_t = next(it)[...] if encode_t else None
        wb = {}
        for name in weight_names:
            w = next(it)
            b = next(it)
            wb[name] = (w[...], b[...][0])
        out_ref = next(it)

        xs = _xs_from_rays(o, dvec, zs, pe_sel)
        pe = jnp.where(pe_id > 0, xs, _sin_poly(xs + pe_phase)) * pe_valid

        # ---- towers (identical math to `fwd_kernel` above) ----
        cols = []
        h = _tower_fwd(wb, "static_xyz", pe.astype(BF16))
        w, b = wb["static_sigma"]
        static_sigma = _mm(h, w, b)
        w, b = wb["static_xyz_final"]
        feat0 = _mm(h, w, b)
        if use_viewdir:
            w, b = wb["static_dir"]
            ray_z = jnp.dot(dir_t.astype(BF16), w[256:256 + dir_w],
                            preferred_element_type=F32) + b
            if encode_a:
                ray_z = ray_z + jnp.dot(
                    a_t.astype(BF16), w[256 + SEG:256 + SEG + n_a],
                    preferred_element_type=F32)
            z = jnp.dot(feat0.astype(BF16), w[:256],
                        preferred_element_type=F32) + _bcast(ray_z)
            feat = jnp.maximum(z, 0.0).astype(BF16)
        else:
            feat = feat0.astype(BF16)
        w, b = wb["static_rgb"]
        static_rgb = jax.nn.sigmoid(_mm(feat, w, b))
        cols += [static_rgb, static_sigma]
        if encode_t:
            t_part = jnp.dot(t_t.astype(F32), t_sel,
                             preferred_element_type=F32)
            tx = (pe + _bcast(t_part)).astype(BF16)
            h = _tower_fwd(wb, "transient_xyz", tx)
            w, b = wb["transient_xyz_final"]
            featb = _mm(h, w, b).astype(BF16)
            w, b = wb["transient_heads"]
            th = _mm(featb, w, b)
            cols += [jax.nn.sigmoid(th[:, 1:4]), th[:, 0:1]]
            c = 4
            for f in ("fw", "bw"):
                if f in head_flow:
                    cols.append(flow_scale * jnp.tanh(th[:, c:c + 3]))
                    c += 3
        packed = jnp.concatenate(cols, -1)  # (BLK, n_planes)
        p = packed.T.reshape(n_planes, R_F, n_samples)
        pk = {k: p[i] for i, k in enumerate(plane_keys)}

        # ---- in-kernel compositing (`rendering.py:202-295` test-time:
        # zero noise; vis culling on transient sigma) ----
        d_s, d_t = _deltas(zs)
        tau_s = d_s * _softplus(pk["ssig"])
        a_srgb = (pk["srgb_r"], pk["srgb_g"], pk["srgb_b"])
        maps = []
        if not encode_t:
            # single-field composite (`models/rendering.py` inference with
            # output_transient=False: weights from the static field alone)
            w_ = (1.0 - jnp.exp(-tau_s)) * jnp.exp(-_lane_cumsum_excl(tau_s))
            for cplane in a_srgb:
                maps.append(jnp.sum(w_ * cplane, -1, keepdims=True))
            maps.append(jnp.sum(w_ * zs, -1, keepdims=True))
        else:
            tsig = pk["tsig"]
            if vis_in:
                tsig = jnp.where(vis == 0, -10.0, tsig)
            tau_t = d_t * _softplus(tsig)
            u = tau_s + tau_t
            T = jnp.exp(-_lane_cumsum_excl(u))
            sw = (1.0 - jnp.exp(-tau_s)) * T
            tw = (1.0 - jnp.exp(-tau_t)) * T
            w_ = (1.0 - jnp.exp(-u)) * T
            a_trgb = (pk["trgb_r"], pk["trgb_g"], pk["trgb_b"])
            for sc, tc in zip(a_srgb, a_trgb):
                maps.append(jnp.sum(sw * sc + tw * tc, -1, keepdims=True))
            maps.append(jnp.sum(w_ * zs, -1, keepdims=True))
            for tc in a_trgb:
                maps.append(jnp.sum(tw * tc, -1, keepdims=True))
            maps.append(jnp.sum(tw, -1, keepdims=True))
            # static-only composite with its own transmittance
            # (`rendering.py:270-278`)
            _sw = ((1.0 - jnp.exp(-tau_s))
                   * jnp.exp(-_lane_cumsum_excl(tau_s)))
            for sc in a_srgb:
                maps.append(jnp.sum(_sw * sc, -1, keepdims=True))
            maps.append(jnp.sum(_sw * zs, -1, keepdims=True))
            if emit_flow_maps:
                far = zs > z_far  # flow zeroed beyond z_far
                for c in range(3):
                    xyz_c = o[:, c:c + 1] + dvec[:, c:c + 1] * zs
                    maps.append(jnp.sum(w_ * xyz_c, -1, keepdims=True))
                for tag in ("ffw", "fbw"):
                    for c in "xyz":
                        fpl = jnp.where(far, 0.0, pk[f"{tag}_{c}"])
                        maps.append(jnp.sum(w_ * fpl, -1, keepdims=True))
        n_used = sum(m.shape[-1] for m in maps)
        if n_used < n_map:
            maps.append(jnp.zeros((R_F, n_map - n_used), F32))
        out_ref[...] = jnp.concatenate(maps, -1)

    interpret = lambda: jax.default_backend() == "cpu"  # noqa: E731

    def _pad_rays(vs, n, n_pad):
        if n_pad == n:
            return vs
        out = []
        for v in vs:
            if v is None:
                out.append(None)
                continue
            out.append(jnp.concatenate(
                [v, jnp.zeros((n_pad - n,) + v.shape[1:], v.dtype)], 0))
        return out

    def _t_sel():
        tsel = np.zeros((n_tau, SEG), np.float32)
        for j in range(n_tau):
            tsel[j, xyz_w + j] = 1.0
        return jnp.asarray(tsel)

    def host(params, o, d, zs, vis, dir_emb, a_emb, t_emb):
        n = o.shape[0]
        n_pad = n + (-n) % R_F
        n_blocks = n_pad * n_samples // BLK_F
        o, d, zs, vis, dir_emb, a_emb, t_emb = _pad_rays(
            [o, d, zs, vis, dir_emb, a_emb, t_emb], n, n_pad)
        pw = pack_padded_weights(params, weight_names, **pack_kw)
        sel, is_id, phase, valid = _posenc_tables(freqs, SEG)
        const2 = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        specs = [const2((3, SEG)), const2((1, SEG)), const2((1, SEG)),
                 const2((1, SEG))]
        args = [jnp.asarray(sel), jnp.asarray(is_id), jnp.asarray(phase),
                jnp.asarray(valid)]
        plane = pl.BlockSpec((R_F, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        ray_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (R_F, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if encode_t:
            specs.append(const2((n_tau, SEG)))
            args.append(_t_sel())
        specs += [ray_spec(3), ray_spec(3), plane]
        args += [o, d, zs]
        if vis_in:
            specs.append(plane)
            args.append(vis)
        if use_viewdir:
            specs.append(ray_spec(dir_emb.shape[-1]))
            args.append(dir_emb)
        if encode_a:
            specs.append(ray_spec(a_emb.shape[-1]))
            args.append(a_emb)
        if encode_t:
            specs.append(ray_spec(t_emb.shape[-1]))
            args.append(t_emb)
        for name in weight_names:
            w, b = pw[name]["w"], pw[name]["b"]
            specs += [const2(w.shape), const2(b.shape)]
            args += [w, b]
        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        except TypeError:
            compiler_params = None
        maps = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=specs,
            out_specs=pl.BlockSpec((R_F, n_map), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, n_map), F32),
            interpret=interpret(),
            compiler_params=compiler_params,
        )(*args)
        return maps[:n]

    host.cols_map = cols_map
    host.n_map = n_map
    return host
