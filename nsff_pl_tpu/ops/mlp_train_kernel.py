"""Trainable fused NeRF evaluation: Pallas forward + Pallas backward.

Profiling (docs/ARCHITECTURE.md) shows the NSFF train step is dominated by
XLA's backward through the tower evaluations (~9.4 of 13.2 ms at batch
512). This module provides `make_fused_nerf_train`: the same fused
dual-tower evaluation as `ops/mlp_kernel.py` but with a custom VJP whose
backward is itself one Pallas kernel per grid block:

  - recompute the forward for the block with every layer's post-ReLU
    activation held in VMEM (rematerialization inside the kernel — no
    HBM activation traffic at all),
  - backpropagate through heads and towers with aligned matmuls,
  - accumulate dW/db into VMEM-resident output blocks across the
    (sequential) grid, and emit per-row dxyz plus per-ray
    d(dir/appearance/time) embedding gradients.

Gradients flow to: all tower/head weights, xyz (needed because warped
points are xyz + flow(params)), and the trainable per-frame embeddings.

Layout notes follow ops/mlp_kernel.py: selector-matmul positional
encoding (one (rows,3)@(3,128) matmul; its VJP is a matmul by the
transposed selector), 128-aligned segments, packed transient heads.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsff_pl_tpu.ops.mlp_kernel import (SEG, _mm, _pad_rows,
                                        _posenc_tables, _sin_poly,
                                        make_fused_nerf_eval)
from nsff_pl_tpu.ops.posenc import posenc_freqs

F32 = jnp.float32
BF16 = jnp.bfloat16


def branch_weight_names(*, D, skips, use_viewdir, static_branch, encode_t):
    """The kernel-side weight list (packed heads, see pack_padded_weights)."""
    static_names = ([f"static_xyz_{i}" for i in range(D)]
                    + ["static_xyz_final"]
                    + (["static_dir"] if use_viewdir else [])
                    + ["static_sigma", "static_rgb"]) if static_branch else []
    transient_names = ([f"transient_xyz_{i}" for i in range(D)]
                       + ["transient_xyz_final", "transient_heads"]
                       ) if encode_t else []
    return static_names, transient_names


def pack_padded_weights(params, weight_names, *, encode_t, output_flow,
                        skips, xyz_w, n_tau, dir_w, n_a, encode_a):
    """Params pytree -> kernel weight dict: transient heads concatenated
    into one matmul, every input segment re-laid at a 128-aligned row
    offset (mirrors the eval kernel's layout, ops/mlp_kernel.py)."""
    packed = dict(params)
    if encode_t:
        hw = [params["transient_sigma"]["w"], params["transient_rgb"]["w"]]
        hb = [params["transient_sigma"]["b"], params["transient_rgb"]["b"]]
        if "fw" in output_flow:
            hw.append(params["transient_flow_fw"]["w"])
            hb.append(params["transient_flow_fw"]["b"])
        if "bw" in output_flow:
            hw.append(params["transient_flow_bw"]["w"])
            hb.append(params["transient_flow_bw"]["b"])
        packed["transient_heads"] = {"w": jnp.concatenate(hw, -1),
                                     "b": jnp.concatenate(hb, -1)}
    out = {}
    for name in weight_names:
        w = packed[name]["w"]
        k = w.shape[0]
        if name == "static_xyz_0":
            w = _pad_rows(w, [((0, xyz_w), 0)], SEG)
        elif name in [f"static_xyz_{i}" for i in skips]:
            w = _pad_rows(w, [((0, xyz_w), 0), ((xyz_w, k), SEG)],
                          SEG + 256)
        elif name == "transient_xyz_0":
            w = _pad_rows(w, [((0, k), 0)], SEG)
        elif name in [f"transient_xyz_{i}" for i in skips]:
            inw = xyz_w + n_tau
            w = _pad_rows(w, [((0, inw), 0), ((inw, k), SEG)], SEG + 256)
        elif name == "static_dir":
            layout = [((0, 256), 0), ((256, 256 + dir_w), 256)]
            total = 256 + SEG
            if encode_a:
                layout.append(((256 + dir_w, 256 + dir_w + n_a),
                               256 + SEG))
                total += SEG
            w = _pad_rows(w, layout, total)
        out[name] = {"w": w.astype(BF16),
                     "b": packed[name]["b"].astype(F32)[None]}
    return out


def unpad_padded_grads(dws, weight_names, *, output_flow, skips, xyz_w,
                       n_tau, dir_w, n_a, encode_a):
    """Map padded/packed dW/db back onto the original params pytree."""
    g = {}

    def unpad(name, w):
        if name == "static_xyz_0":
            return w[:xyz_w]
        if name in [f"static_xyz_{i}" for i in skips]:
            return jnp.concatenate([w[:xyz_w], w[SEG:SEG + 256]], 0)
        if name == "transient_xyz_0":
            return w[:xyz_w + n_tau]
        if name in [f"transient_xyz_{i}" for i in skips]:
            return jnp.concatenate([w[:xyz_w + n_tau],
                                    w[SEG:SEG + 256]], 0)
        if name == "static_dir":
            parts = [w[:256], w[256:256 + dir_w]]
            if encode_a:
                parts.append(w[256 + SEG:256 + SEG + n_a])
            return jnp.concatenate(parts, 0)
        return w

    for name in weight_names:
        dw = unpad(name, dws[name]["w"]).astype(F32)
        db = dws[name]["b"][0].astype(F32)
        if name == "transient_heads":
            # split back into sigma/rgb/flow params
            g["transient_sigma"] = {"w": dw[:, 0:1], "b": db[0:1]}
            g["transient_rgb"] = {"w": dw[:, 1:4], "b": db[1:4]}
            c = 4
            if "fw" in output_flow:
                g["transient_flow_fw"] = {"w": dw[:, c:c + 3],
                                          "b": db[c:c + 3]}
                c += 3
            if "bw" in output_flow:
                g["transient_flow_bw"] = {"w": dw[:, c:c + 3],
                                          "b": db[c:c + 3]}
        else:
            g[name] = {"w": dw, "b": db}
    return g


def make_fused_nerf_train(
    n_samples: int,
    *,
    use_viewdir: bool,
    encode_a: bool,
    encode_t: bool,
    output_flow: Tuple[str, ...],
    n_emb_xyz: int = 10,
    s_emb_xyz: float = 9.0,
    n_emb_dir: int = 4,
    n_a: int = 48,
    n_tau: int = 48,
    flow_scale: float = 0.2,
    D: int = 8,
    skips=(4,),
    block_rows: int = 1024,
    bwd_block_rows: int = 512,
    static_branch: bool = True,
    need_dxyz: bool = True,
):
    """Build the trainable fused evaluator with a Pallas backward.

    Returns fn(params, xyz, dir_emb, a_emb, t_emb) -> (N, S, 16) packed
    exactly like `make_fused_nerf_eval`; differentiable in params, xyz and
    the per-ray embeddings.

    need_dxyz=False skips the in-kernel dxs/dxyz chain and returns zeros
    for the xyz cotangent — correct ONLY when the caller's xyz does not
    depend on trainable parameters (the main evaluation at ray-derived
    points; the reference analog is that `xyz` there is pure data). The
    warped evaluations (xyz + flow(params)) must keep the default.
    """
    freqs = tuple(float(f) for f in posenc_freqs(s_emb_xyz, n_emb_xyz))
    xyz_w = 3 + 6 * n_emb_xyz
    dir_w = 3 + 6 * n_emb_dir
    if block_rows % n_samples != 0:
        block_rows = max(n_samples, (block_rows // n_samples) * n_samples)
    rays_per_blk = block_rows // n_samples
    if rays_per_blk % 8 != 0:
        # sublane-align the per-ray tile height (see make_fused_nerf_eval)
        rays_per_blk = ((rays_per_blk + 7) // 8) * 8
        block_rows = rays_per_blk * n_samples
    # backward blocks cover WHOLE rays so per-ray conditioning loads as a
    # small tile and the embedding gradients reduce over samples in-kernel
    BWD_BLK = bwd_block_rows
    if BWD_BLK % n_samples != 0:
        BWD_BLK = max(n_samples, (BWD_BLK // n_samples) * n_samples)
    bwd_rays = BWD_BLK // n_samples
    if bwd_rays % 8 != 0:
        # per-ray (bwd_rays, C) tiles need a sublane-aligned ray count
        bwd_rays = max(8, ((bwd_rays + 7) // 8) * 8)
        BWD_BLK = bwd_rays * n_samples

    # weight list (packed heads, padded layouts — mirrors the eval kernel)
    static_names, transient_names = branch_weight_names(
        D=D, skips=skips, use_viewdir=use_viewdir,
        static_branch=static_branch, encode_t=encode_t)
    weight_names = static_names + transient_names

    fwd_eval = make_fused_nerf_eval(
        n_samples, use_viewdir=use_viewdir, encode_a=encode_a,
        encode_t=encode_t, output_flow=output_flow, n_emb_xyz=n_emb_xyz,
        s_emb_xyz=s_emb_xyz, n_emb_dir=n_emb_dir, n_a=n_a, n_tau=n_tau,
        flow_scale=flow_scale, D=D, skips=skips, block_rows=block_rows,
        static_branch=static_branch)

    # padded weight prep shared by fwd (already in eval) and bwd
    _pack_kw = dict(encode_t=encode_t, output_flow=output_flow, skips=skips,
                    xyz_w=xyz_w, n_tau=n_tau, dir_w=dir_w, n_a=n_a,
                    encode_a=encode_a)

    def _packed_padded_weights(params):
        return pack_padded_weights(params, weight_names, **_pack_kw)

    def _unpad_grads(dws):
        kw = dict(_pack_kw)
        kw.pop("encode_t")
        return unpad_padded_grads(dws, weight_names, **kw)

    # ------------------------------------------------------------------
    # backward kernels — one per branch so a single kernel's VMEM holds
    # only ONE tower's activations + dW (both at once OOMs scoped vmem)
    # ------------------------------------------------------------------
    def make_branch_bwd(branch: str):
        names = static_names if branch == "static" else transient_names

        def bwd_kernel(*refs):
            it = iter(refs)
            pe_sel = next(it)[...]
            pe_id = next(it)[...]
            pe_phase = next(it)[...]
            pe_valid = next(it)[...]
            t_sel = next(it)[...] if (encode_t and branch == "transient") \
                else None
            xyz_ref = next(it)
            dir_ref = next(it) if (use_viewdir and branch == "static") \
                else None
            a_ref = next(it) if (encode_a and branch == "static") else None
            t_ref = next(it) if (encode_t and branch == "transient") \
                else None
            wb = {}
            for name in names:
                w = next(it)
                b = next(it)
                wb[name] = (w[...], b[...][0])
            g_ref = next(it)  # (BLK, 16) cotangent
            dW = {}
            for name in names:
                dW[name] = (next(it), next(it))
            dxyz_ref = next(it) if need_dxyz else None
            ddir_ref = next(it) if (use_viewdir and branch == "static") \
                else None
            da_ref = next(it) if (encode_a and branch == "static") else None
            dt_ref = next(it) if (encode_t and branch == "transient") \
                else None

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for name in names:
                    dW[name][0][...] = jnp.zeros_like(dW[name][0])
                    dW[name][1][...] = jnp.zeros_like(dW[name][1])

            # ---- shared: positional encoding recompute (poly sin) ----
            x = xyz_ref[...]
            xs = jnp.dot(x, pe_sel, preferred_element_type=F32)
            pe = jnp.where(pe_id > 0, xs,
                           _sin_poly(xs + pe_phase)) * pe_valid

            def bcast(v):
                """(bwd_rays, C) per-ray -> (BWD_BLK, C) per-sample."""
                v = jnp.broadcast_to(v[:, None, :],
                                     (bwd_rays, n_samples, v.shape[-1]))
                return v.reshape(BWD_BLK, v.shape[-1])

            def ray_sum(v):
                """(BWD_BLK, C) -> (bwd_rays, C): in-kernel reduction of
                per-sample grads to the per-ray embedding grads (blocks
                cover whole rays)."""
                return jnp.sum(
                    v.reshape(bwd_rays, n_samples, v.shape[-1]), axis=1)

            def pad_to_seg(v):
                if v.shape[-1] == SEG:
                    return v
                return jnp.concatenate(
                    [v, jnp.zeros((v.shape[0], SEG - v.shape[-1]),
                                  v.dtype)], -1)

            def tower_fwd(prefix, inp):
                """Recompute with skip layers as SPLIT dots on the padded
                layout (no (BLK, SEG+256) concat copies)."""
                acts = [inp]
                h = inp
                for i in range(D):
                    w, b = wb[f"{prefix}_{i}"]
                    if i in skips:
                        z = (jnp.dot(inp, w[:SEG],
                                     preferred_element_type=F32)
                             + jnp.dot(h, w[SEG:SEG + 256],
                                       preferred_element_type=F32) + b)
                    else:
                        z = _mm(h, w, b)
                    h = jnp.maximum(z, 0.0).astype(BF16)
                    acts.append(h)
                return acts

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

            g = g_ref[...]

            if branch == "static":
                xyz_pad = pe.astype(BF16)
                s_acts = tower_fwd("static_xyz", xyz_pad)
                h8 = s_acts[-1]
                w_sig, _ = wb["static_sigma"]
                w_fin, b_fin = wb["static_xyz_final"]
                feat0 = _mm(h8, w_fin, b_fin)
                if use_viewdir:
                    w_dir, b_dir = wb["static_dir"]
                    dir_tile = pad_to_seg(dir_ref[...].astype(BF16))
                    ray_z = jnp.dot(dir_tile, w_dir[256:256 + SEG],
                                    preferred_element_type=F32) + b_dir
                    a_tile = None
                    if encode_a:
                        a_tile = pad_to_seg(a_ref[...].astype(BF16))
                        ray_z = ray_z + jnp.dot(
                            a_tile, w_dir[256 + SEG:256 + 2 * SEG],
                            preferred_element_type=F32)
                    feat0b = feat0.astype(BF16)
                    zdir = jnp.dot(feat0b, w_dir[:256],
                                   preferred_element_type=F32) \
                        + bcast(ray_z)
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
                    # per-ray conditioning grads: reduce dz over samples
                    # in-kernel, then one small matmul per block
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
                dW["static_sigma"][0][...] += jnp.dot(
                    h8.T, g_ssig.astype(BF16), preferred_element_type=F32)
                dW["static_sigma"][1][...] += jnp.sum(g_ssig, 0,
                                                      keepdims=True)
                dh8 = dh8 + jnp.dot(g_ssig.astype(BF16), w_sig.T,
                                    preferred_element_type=F32)
                dpe = tower_bwd("static_xyz", s_acts, dh8)
            else:  # transient branch
                t_tile = t_ref[...].astype(F32)  # (bwd_rays, n_tau)
                t_part = jnp.dot(t_tile, t_sel,
                                 preferred_element_type=F32)
                # pe is already masked by pe_valid (t slots zero there)
                tx = (pe + bcast(t_part)).astype(BF16)
                t_acts = tower_fwd("transient_xyz", tx)
                th8 = t_acts[-1]
                w_tfin, b_tfin = wb["transient_xyz_final"]
                tfeatb = _mm(th8, w_tfin, b_tfin).astype(BF16)
                w_th, b_th = wb["transient_heads"]
                th = _mm(tfeatb, w_th, b_th)
                t_rgb = jax.nn.sigmoid(th[:, 1:4])
                g_cols = [g[:, 7:8], g[:, 4:7] * t_rgb * (1.0 - t_rgb)]
                c_in, c_th = 8, 4
                if "fw" in output_flow:
                    tf = jnp.tanh(th[:, c_th:c_th + 3])
                    g_cols.append(g[:, c_in:c_in + 3] * flow_scale
                                  * (1.0 - tf * tf))
                    c_in += 3
                    c_th += 3
                if "bw" in output_flow:
                    tb2 = jnp.tanh(th[:, c_th:c_th + 3])
                    g_cols.append(g[:, c_in:c_in + 3] * flow_scale
                                  * (1.0 - tb2 * tb2))
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

            if need_dxyz:
                # d sin(xs+phase)/dxs = cos = sin(xs+phase+pi/2)
                dxs = jnp.where(
                    pe_id > 0, dpe * pe_valid,
                    dpe * pe_valid
                    * _sin_poly(xs + pe_phase + 1.5707963267948966))
                dxyz_ref[...] = jnp.dot(dxs.astype(BF16),
                                        pe_sel.T.astype(BF16),
                                        preferred_element_type=F32)

        return bwd_kernel

    bwd_kernels = {}
    if static_branch:
        bwd_kernels["static"] = make_branch_bwd("static")
    if encode_t:
        bwd_kernels["transient"] = make_branch_bwd("transient")

    # ------------------------------------------------------------------
    # host-side plumbing
    # ------------------------------------------------------------------
    def _branch_bwd_host(branch, pw, xyz_flat, dir_emb, a_emb, t_emb, g,
                         rows, n_rays_pad, n_blocks):
        names = static_names if branch == "static" else transient_names
        sel, is_id, phase, valid = _posenc_tables(freqs, SEG)

        const2 = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        row_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (BWD_BLK, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ray_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (bwd_rays, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

        in_specs = [const2((3, SEG)), const2((1, SEG)), const2((1, SEG)),
                    const2((1, SEG))]
        args = [jnp.asarray(sel), jnp.asarray(is_id), jnp.asarray(phase),
                jnp.asarray(valid)]
        if encode_t and branch == "transient":
            tsel = np.zeros((n_tau, SEG), np.float32)
            for j in range(n_tau):
                tsel[j, xyz_w + j] = 1.0
            in_specs.append(const2((n_tau, SEG)))
            args.append(jnp.asarray(tsel))
        in_specs.append(row_spec(3))
        args.append(xyz_flat)
        if use_viewdir and branch == "static":
            in_specs.append(ray_spec(dir_emb.shape[-1]))
            args.append(dir_emb)
        if encode_a and branch == "static":
            in_specs.append(ray_spec(a_emb.shape[-1]))
            args.append(a_emb)
        if encode_t and branch == "transient":
            in_specs.append(ray_spec(t_emb.shape[-1]))
            args.append(t_emb)
        for name in names:
            w, b = pw[name]["w"], pw[name]["b"]
            in_specs += [const2(w.shape), const2(b.shape)]
            args += [w, b]
        in_specs.append(row_spec(16))
        args.append(g)

        out_shapes = []
        out_specs = []
        for name in names:
            w, b = pw[name]["w"], pw[name]["b"]
            out_shapes += [jax.ShapeDtypeStruct(w.shape, F32),
                           jax.ShapeDtypeStruct(b.shape, F32)]
            out_specs += [const2(w.shape), const2(b.shape)]
        if need_dxyz:
            out_shapes.append(jax.ShapeDtypeStruct((rows, 3), F32))
            out_specs.append(row_spec(3))
        if use_viewdir and branch == "static":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_rays_pad, dir_emb.shape[-1]), F32))
            out_specs.append(ray_spec(dir_emb.shape[-1]))
        if encode_a and branch == "static":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_rays_pad, a_emb.shape[-1]), F32))
            out_specs.append(ray_spec(a_emb.shape[-1]))
        if encode_t and branch == "transient":
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_rays_pad, t_emb.shape[-1]), F32))
            out_specs.append(ray_spec(t_emb.shape[-1]))

        interpret = jax.default_backend() == "cpu"
        try:
            # whole-ray blocks (bwd_rays aligned to 8) push the bwd
            # working set past the default 16M scoped-vmem cap; scale the
            # cap with the block size (8-ray blocks at S>128 — e.g. the
            # coarse-to-fine fine pass at S=256 — need BWD_BLK=8*S rows)
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=(24 + 26 * max(0, BWD_BLK // 1024 - 1))
                * 1024 * 1024)
        except TypeError:
            compiler_params = None
        return pl.pallas_call(
            bwd_kernels[branch],
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
            compiler_params=compiler_params,
        )(*args)

    def _bwd_host(params, xyz, dir_emb, a_emb, t_emb, g):
        n, s = xyz.shape[0], xyz.shape[1]
        pw = _packed_padded_weights(params)
        # pad to whole backward blocks of whole rays; conditioning stays
        # per-ray (the round-1 code expanded embeddings to per-ROW
        # (rows, C) arrays on the host and reduced the grads back with an
        # XLA reshape-sum — those broadcasts/reduces were ~9 ms of the
        # step profile at batch 8192)
        n_pad_rays = (-n) % bwd_rays
        n_rays_pad = n + n_pad_rays
        rows = n_rays_pad * s
        n_blocks = rows // BWD_BLK

        def pad_rays(v):
            if v is None:
                return None
            if n_pad_rays:
                v = jnp.concatenate(
                    [v, jnp.zeros((n_pad_rays, v.shape[-1]), v.dtype)], 0)
            return v

        dir_r = pad_rays(dir_emb)
        a_r = pad_rays(a_emb)
        t_r = pad_rays(t_emb)
        xyz_flat = xyz.reshape(n * s, 3)
        g_flat = g.reshape(n * s, 16).astype(F32)
        if n_pad_rays:
            xyz_flat = jnp.concatenate(
                [xyz_flat, jnp.zeros((n_pad_rays * s, 3),
                                     xyz_flat.dtype)], 0)
            g_flat = jnp.concatenate(
                [g_flat, jnp.zeros((n_pad_rays * s, 16), F32)], 0)

        dws = {}
        ddir = da = dt = None
        dxyz = None
        if static_branch:
            outs_s = _branch_bwd_host("static", pw, xyz_flat, dir_r,
                                      a_r, t_r, g_flat, rows, n_rays_pad,
                                      n_blocks)
            it = iter(outs_s)
            for name in static_names:
                dws[name] = {"w": next(it), "b": next(it)}
            if need_dxyz:
                dxyz = next(it)
            ddir = next(it)[:n] if use_viewdir else None
            da = next(it)[:n] if encode_a else None
        if encode_t:
            outs_t = _branch_bwd_host("transient", pw, xyz_flat, dir_r,
                                      a_r, t_r, g_flat, rows, n_rays_pad,
                                      n_blocks)
            it = iter(outs_t)
            for name in transient_names:
                dws[name] = {"w": next(it), "b": next(it)}
            if need_dxyz:
                d2 = next(it)
                dxyz = d2 if dxyz is None else dxyz + d2
            dt = next(it)[:n]
        dparams = _unpad_grads(dws)
        if need_dxyz:
            dxyz = dxyz[:n * s].reshape(n, n_samples, 3)
        else:
            dxyz = jnp.zeros((n, n_samples, 3), F32)
        return dparams, dxyz, ddir, da, dt

    # ------------------------------------------------------------------
    @jax.custom_vjp
    def fused_train(params, xyz, dir_emb, a_emb, t_emb):
        return fwd_eval(params, xyz, dir_emb=dir_emb, a_emb=a_emb,
                        t_emb=t_emb)

    def fwd_rule(params, xyz, dir_emb, a_emb, t_emb):
        out = fused_train(params, xyz, dir_emb, a_emb, t_emb)
        return out, (params, xyz, dir_emb, a_emb, t_emb)

    def bwd_rule(res, g):
        params, xyz, dir_emb, a_emb, t_emb = res
        dparams, dxyz, ddir, da, dt = _bwd_host(
            params, xyz, dir_emb, a_emb, t_emb, g)
        # fill zero grads for params the kernel does not touch
        full_dparams = jax.tree.map(jnp.zeros_like, params)
        full_dparams.update(dparams)
        return (full_dparams, dxyz, ddir, da, dt)

    fused_train.defvjp(fwd_rule, bwd_rule)
    return fused_train
