"""Fused NeRF evaluation as a Pallas TPU kernel.

One kernel evaluates, for a block of sample points held entirely in VMEM:
    positional encoding -> static 8x256 tower (+viewdir head) ->
    transient 8x256 tower -> sigma/rgb/flow heads
and writes one packed (rows, 16) output — the reference's packed layout
(`models/nerf.py:210-213`): [static_rgb(3), static_sigma(1),
transient_rgb(3), transient_sigma(1), flow_fw(3), flow_bw(3), pad(2)].

Why a kernel at all: the XLA path writes every layer's (R, 256)
activations to HBM between matmuls; here the whole tower runs out of VMEM
— only xyz (R, 3) and the per-ray conditioning vectors stream in, and 16
floats per row stream out. Weights (~1.2M params, bf16) are resident in
VMEM across the grid.

Used on the no-grad paths (test-time rendering / eval CLI). Training
keeps the XLA path (its backward is autodiff'd); a Pallas backward is the
planned follow-up.

Block geometry: rows are (ray, sample)-ordered; the block spans
`rays_per_blk = BLK // n_samples` whole rays so per-ray conditioning
(dir/appearance/time embeddings) loads as a small (rays_per_blk, C) tile
and broadcasts to samples inside VMEM.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsff_pl_tpu.ops.posenc import posenc_freqs

DEFAULT_BLOCK_ROWS = 2048

# lane-aligned segment widths: every contraction K is a multiple of 128
SEG = 128


def _posenc_block(x, freqs, pad_to: int = 0):
    """In-kernel positional encoding: (B, 3) -> (B, 3 + 6*n_freqs) with the
    reference channel order [x, sin(f0 x), cos(f0 x), ...]; zero-padded to
    `pad_to` columns for MXU lane alignment."""
    parts = [x]
    for f in freqs:  # unrolled: n_freqs is static
        xf = x * f
        parts.append(jnp.sin(xf))
        parts.append(jnp.cos(xf))
    out = jnp.concatenate(parts, axis=-1)
    if pad_to > out.shape[-1]:
        out = jnp.concatenate(
            [out, jnp.zeros((x.shape[0], pad_to - out.shape[-1]), x.dtype)],
            -1)
    return out


def _mm(x, w, b):
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


def _sin_poly(x):
    """bf16-grade sin for the posenc lanes: range-reduce to [-pi, pi] and
    evaluate a degree-9 odd minimax polynomial. Hardware sin costs ~2.9 ms
    per 1M-point pass on v5e and the fused kernels run 7+ such passes per
    train step; this is ~9 cheap VPU ops instead. Max abs error 8.7e-5 in
    f32 for |x| <= 1100 (posenc args reach 2^9 * |xyz|) — ~20x below bf16
    resolution, so downstream tower numerics are unchanged at the compute
    dtype. Coefficients: weighted-lstsq equioscillation fit of sin(r)/r in
    r^2 on [0, pi]."""
    n = jnp.round(x * 0.15915494309189535)
    r = x - n * 6.283185307179586
    u = r * r
    return r * (0.999979402976 + u * (-0.166624406237 + u * (
        0.00830899340721 + u * (-0.000192651216281 + u * 2.14793467522e-06))))


def _pad_rows(w: jnp.ndarray, layout, total: int) -> jnp.ndarray:
    """Re-lay a (K, N) weight so each logical input segment starts at an
    aligned row offset. `layout` = [((src0, src1), dst0), ...]."""
    out = jnp.zeros((total, w.shape[1]), w.dtype)
    for (s0, s1), d in layout:
        out = out.at[d:d + (s1 - s0)].set(w[s0:s1])
    return out


def _posenc_tables(freqs, width: int):
    """Selector-matmul positional encoding tables.

    Column j of the (3, width) selector holds freq_j at the source channel
    row, so `x @ sel` computes freq_j * x[c_j] for every output column in
    ONE aligned matmul; a single `sin(xs + phase)` pass then finishes the
    encoding: phase is 0 on sin lanes and pi/2 on cos lanes (cos(x) =
    sin(x + pi/2)), so only ONE transcendental sweep is needed — computing
    sin AND cos on all lanes and selecting measured ~2x the posenc cost
    (transcendentals dominate the VPU time of the fused kernels). The
    selector layout also avoids materializing 2*n_freqs+1 narrow (rows, 3)
    arrays in VMEM (each lane-padded to 128 — a 42x blowup).
    """
    n63 = 3 + 6 * len(freqs)
    sel = np.zeros((3, width), np.float32)
    is_id = np.zeros((width,), np.float32)
    phase = np.zeros((width,), np.float32)
    valid = np.zeros((width,), np.float32)
    for j in range(min(n63, width)):
        valid[j] = 1.0
        if j < 3:
            sel[j, j] = 1.0
            is_id[j] = 1.0
        else:
            k, r = (j - 3) // 6, (j - 3) % 6
            c = r % 3
            sel[c, j] = freqs[k]
            if r >= 3:  # cos lane
                phase[j] = np.pi / 2
    return sel, is_id[None], phase[None], valid[None]


def make_fused_nerf_eval(
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
    block_rows: int = DEFAULT_BLOCK_ROWS,
    padded: bool = True,
    static_branch: bool = True,
):
    """Build the fused evaluator.

    Returns fn(params, xyz, dir_emb, a_emb, t_emb) -> (N, S, 16) where
    xyz is (N, S, 3) and the conditioning embeddings are per-ray (N, C).
    """
    freqs = tuple(float(f) for f in posenc_freqs(s_emb_xyz, n_emb_xyz))
    xyz_w = 3 + 6 * n_emb_xyz  # 63
    dir_w = 3 + 6 * n_emb_dir  # 27
    # padded segment widths (lane-aligned contractions); fall back to the
    # unpadded layout when a segment would not fit its 128 slot
    if padded and (xyz_w > SEG or (encode_t and xyz_w + n_tau > SEG)):
        padded = False
    if block_rows % n_samples != 0:
        # block must cover whole rays
        block_rows = max(n_samples, (block_rows // n_samples) * n_samples)
    rays_per_blk = block_rows // n_samples
    if rays_per_blk % 8 != 0:
        # per-ray conditioning tiles are (rays_per_blk, C) blocks: the
        # TPU needs the second-minor block dim sublane-aligned (%8==0).
        # Hit e.g. at S=192 (coarse-to-fine fine pass, 64+2*64), where
        # 1024//192 = 5 rays/block
        rays_per_blk = ((rays_per_blk + 7) // 8) * 8
        block_rows = rays_per_blk * n_samples

    static_names = ([f"static_xyz_{i}" for i in range(D)]
                    + ["static_xyz_final"]
                    + (["static_dir"] if use_viewdir else [])
                    + ["static_sigma", "static_rgb"]) if static_branch else []
    transient_names = ([f"transient_xyz_{i}" for i in range(D)]
                       + ["transient_xyz_final", "transient_heads"]
                       ) if encode_t else []
    weight_names = static_names + transient_names

    def kernel(*refs):
        # refs: pe tables, xyz, dir_emb?, a_emb?, t_emb?, (w, b) x weights, out
        it = iter(refs)
        pe_sel_ref = next(it)
        pe_id_ref = next(it)
        pe_phase_ref = next(it)
        pe_valid_ref = next(it)
        t_sel_ref = next(it) if (encode_t and padded) else None
        xyz_ref = next(it)
        dir_ref = next(it) if (use_viewdir and static_branch) else None
        a_ref = next(it) if (encode_a and static_branch) else None
        t_ref = next(it) if encode_t else None
        wb = {}
        for name in weight_names:
            w = next(it)
            b = next(it)
            wb[name] = (w[...], b[...][0])  # b passed as (1, C)
        out_ref = next(it)

        x = xyz_ref[...]  # (BLK, 3) f32
        # one-matmul positional encoding (see _posenc_tables)
        xs = jnp.dot(x, pe_sel_ref[...],
                     preferred_element_type=jnp.float32)  # (BLK, W)
        ids = pe_id_ref[...]
        phase = pe_phase_ref[...]
        vals = pe_valid_ref[...]
        pe = jnp.where(ids > 0, xs, _sin_poly(xs + phase)) * vals
        xyz_pad = pe.astype(jnp.bfloat16)  # (BLK, 128) or (BLK, 63)
        xyz_emb = xyz_pad[:, :xyz_w] if not padded else xyz_pad

        def pad_seg(v):
            '''zero-pad a (BLK, C) activation segment to SEG columns.'''
            if not padded or v.shape[-1] == SEG:
                return v
            return jnp.concatenate(
                [v, jnp.zeros((block_rows, SEG - v.shape[-1]),
                              v.dtype)], -1)

        def bcast(v):
            """(rays_per_blk, C) -> (BLK, C) per-sample broadcast."""
            v = jnp.broadcast_to(v[:, None, :],
                                 (rays_per_blk, n_samples, v.shape[-1]))
            return v.reshape(block_rows, v.shape[-1])

        def tower(prefix, inp):
            """Tower with the skip layer as SPLIT matmuls on the padded
            layout — concatenating (BLK, 128+256) inputs materializes a
            VMEM copy every block; two dots into the same accumulator
            avoid it (the padded weight already separates the segments
            at row SEG)."""
            h = inp
            for i in range(D):
                w, b = wb[f"{prefix}_{i}"]
                if i in skips:
                    if padded:
                        z = (jnp.dot(inp, w[:SEG],
                                     preferred_element_type=jnp.float32)
                             + jnp.dot(h, w[SEG:SEG + 256],
                                       preferred_element_type=jnp.float32)
                             + b)
                    else:
                        z = _mm(jnp.concatenate([inp, h], -1), w, b)
                else:
                    z = _mm(h, w, b)
                h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            return h

        # ---- static branch ----
        if static_branch:
            h = tower("static_xyz", xyz_pad)
            w, b = wb["static_sigma"]
            static_sigma = _mm(h, w, b)  # (BLK, 1) f32
            w, b = wb["static_xyz_final"]
            feat0 = _mm(h, w, b)
            if use_viewdir:
                w, b = wb["static_dir"]
                if padded:
                    # dir/appearance conditioning is PER-RAY: evaluate its
                    # contribution on the (rays_per_blk, C) tile and
                    # broadcast-add the (rays_per_blk, 256) result — no
                    # (BLK, 384/512) concat, no padded bcast, and the
                    # matmul runs on rays_per_blk rows instead of BLK
                    ray_z = jnp.dot(
                        dir_ref[...].astype(jnp.bfloat16),
                        w[256:256 + dir_w],
                        preferred_element_type=jnp.float32) + b
                    if encode_a:
                        ray_z = ray_z + jnp.dot(
                            a_ref[...].astype(jnp.bfloat16),
                            w[256 + SEG:256 + SEG + n_a],
                            preferred_element_type=jnp.float32)
                    z = jnp.dot(feat0.astype(jnp.bfloat16), w[:256],
                                preferred_element_type=jnp.float32) \
                        + bcast(ray_z)
                else:
                    parts = [feat0.astype(jnp.bfloat16),
                             bcast(dir_ref[...]).astype(jnp.bfloat16)]
                    if encode_a:
                        parts.append(bcast(a_ref[...]).astype(jnp.bfloat16))
                    z = _mm(jnp.concatenate(parts, -1), w, b)
                feat = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            else:
                feat = feat0.astype(jnp.bfloat16)
            w, b = wb["static_rgb"]
            static_rgb = jax.nn.sigmoid(_mm(feat, w, b))  # (BLK, 3) f32
            cols = [static_rgb, static_sigma]
        else:
            # transient-only evaluation keeps the 16-wide packed layout
            # with the static slots zeroed
            cols = [jnp.zeros((block_rows, 4), jnp.float32)]

        # ---- transient branch ----
        if encode_t:
            if padded:
                # per-ray t embedding placed into cols [xyz_w, xyz_w+t) of
                # the 128-wide segment via a tiny (rays, n_tau)@(n_tau, W)
                # matmul, then broadcast-add (keeps lanes aligned without
                # a per-sample (BLK, n_tau) broadcast+matmul)
                t_part = jnp.dot(t_ref[...].astype(jnp.float32),
                                 t_sel_ref[...],
                                 preferred_element_type=jnp.float32)
                # pe is already masked by `vals` (t slots zero there)
                tx = (pe + bcast(t_part)).astype(jnp.bfloat16)
            else:
                t_emb = bcast(t_ref[...]).astype(jnp.float32)
                tx = jnp.concatenate([xyz_emb,
                                      t_emb.astype(jnp.bfloat16)], -1)
            h = tower("transient_xyz", tx)
            w, b = wb["transient_xyz_final"]
            featb = _mm(h, w, b).astype(jnp.bfloat16)
            # all transient heads in ONE matmul:
            # cols [sigma(1) | rgb(3) | fw(3) | bw(3)]
            w, b = wb["transient_heads"]
            th = _mm(featb, w, b)
            tr_sigma = th[:, 0:1]
            tr_rgb = jax.nn.sigmoid(th[:, 1:4])
            cols += [tr_rgb, tr_sigma]
            c = 4
            if "fw" in output_flow:
                cols.append(flow_scale * jnp.tanh(th[:, c:c + 3]))
                c += 3
            if "bw" in output_flow:
                cols.append(flow_scale * jnp.tanh(th[:, c:c + 3]))

        packed = jnp.concatenate(cols, -1)
        pad = 16 - packed.shape[-1]
        if pad > 0:
            packed = jnp.concatenate(
                [packed, jnp.zeros((block_rows, pad), jnp.float32)], -1)
        out_ref[...] = packed

    def fused(params, xyz, dir_emb=None, a_emb=None, t_emb=None):
        n, s = xyz.shape[0], xyz.shape[1]
        assert s == n_samples, f"kernel built for S={n_samples}, got {s}"
        rows = n * s
        n_pad_rays = (-n) % rays_per_blk
        if n_pad_rays:  # pad to whole blocks
            padr = lambda v: jnp.concatenate(  # noqa: E731
                [v, jnp.broadcast_to(v[-1:], (n_pad_rays,) + v.shape[1:])], 0)
            xyz = padr(xyz)
            dir_emb = padr(dir_emb) if dir_emb is not None else None
            a_emb = padr(a_emb) if a_emb is not None else None
            t_emb = padr(t_emb) if t_emb is not None else None
            rows = (n + n_pad_rays) * s
        n_blocks = rows // block_rows

        xyz_flat = xyz.reshape(rows, 3)

        pe_width = SEG if padded else xyz_w
        sel, is_id, phase, valid = _posenc_tables(freqs, pe_width)
        in_specs = [
            pl.BlockSpec((3, pe_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [jnp.asarray(sel), jnp.asarray(is_id), jnp.asarray(phase),
                jnp.asarray(valid)]
        if encode_t and padded:
            tsel = np.zeros((n_tau, SEG), np.float32)
            for j in range(n_tau):
                tsel[j, xyz_w + j] = 1.0
            in_specs.append(pl.BlockSpec((n_tau, SEG), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(jnp.asarray(tsel))
        in_specs.append(pl.BlockSpec((block_rows, 3), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xyz_flat)
        ray_spec = lambda c: pl.BlockSpec(  # noqa: E731
            (rays_per_blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if use_viewdir and static_branch:
            in_specs.append(ray_spec(dir_emb.shape[-1]))
            args.append(dir_emb)
        if encode_a and static_branch:
            in_specs.append(ray_spec(a_emb.shape[-1]))
            args.append(a_emb)
        if encode_t:
            in_specs.append(ray_spec(t_emb.shape[-1]))
            args.append(t_emb)

        t_w = (params["transient_xyz_0"]["w"].shape[0] - xyz_w
               if encode_t else 0)
        if encode_t:
            assert t_w == n_tau, (
                f"kernel built for n_tau={n_tau}, params have {t_w}")
        packed_params = dict(params)
        if encode_t:
            head_ws = [params["transient_sigma"]["w"],
                       params["transient_rgb"]["w"]]
            head_bs = [params["transient_sigma"]["b"],
                       params["transient_rgb"]["b"]]
            if "fw" in output_flow:
                head_ws.append(params["transient_flow_fw"]["w"])
                head_bs.append(params["transient_flow_fw"]["b"])
            if "bw" in output_flow:
                head_ws.append(params["transient_flow_bw"]["w"])
                head_bs.append(params["transient_flow_bw"]["b"])
            packed_params["transient_heads"] = {
                "w": jnp.concatenate(head_ws, -1),
                "b": jnp.concatenate(head_bs, -1)}
        for name in weight_names:
            w = packed_params[name]["w"]
            if padded:
                k = w.shape[0]
                if name == "static_xyz_0":
                    w = _pad_rows(w, [((0, xyz_w), 0)], SEG)
                elif name in [f"static_xyz_{i}" for i in skips]:
                    w = _pad_rows(w, [((0, xyz_w), 0), ((xyz_w, k), SEG)],
                                  SEG + 256)
                elif name == "transient_xyz_0":
                    w = _pad_rows(w, [((0, k), 0)], SEG)
                elif name in [f"transient_xyz_{i}" for i in skips]:
                    inw = xyz_w + t_w
                    w = _pad_rows(w, [((0, inw), 0), ((inw, k), SEG)],
                                  SEG + 256)
                elif name == "static_dir":
                    layout = [((0, 256), 0), ((256, 256 + dir_w), 256)]
                    total = 256 + SEG
                    if encode_a:
                        layout.append(((256 + dir_w, 256 + dir_w + n_a),
                                       256 + SEG))
                        total += SEG
                    w = _pad_rows(w, layout, total)
            w = w.astype(jnp.bfloat16)
            b = packed_params[name]["b"].astype(jnp.float32)[None]  # (1, C)
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args += [w, b]

        interpret = jax.default_backend() == "cpu"  # tests run interpreted
        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        except TypeError:  # older pallas without the field
            compiler_params = None
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, 16), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 16), jnp.float32),
            interpret=interpret,
            compiler_params=compiler_params,
        )(*args)
        out = out.reshape(-1, s, 16)
        return out[:n]

    return fused


def unpack_fused(out, *, encode_t: bool, output_flow: Tuple[str, ...]):
    """Split the packed (N, S, 16) kernel output into the renderer's
    quantities (mirrors `rendering.py:179-186`)."""
    res = {"static_rgbs": out[..., 0:3], "static_sigmas_raw": out[..., 3]}
    if encode_t:
        res["transient_rgbs"] = out[..., 4:7]
        res["transient_sigmas_raw"] = out[..., 7]
        c = 8
        if "fw" in output_flow:
            res["transient_flows_fw"] = out[..., c:c + 3]
            c += 3
        if "bw" in output_flow:
            res["transient_flows_bw"] = out[..., c:c + 3]
    return res
