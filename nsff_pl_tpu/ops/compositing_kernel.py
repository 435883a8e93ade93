"""Fused NeRF-W compositing as a Pallas kernel with a hand-written VJP.

First slice of the fused ray-march plan (docs/RAYMARCH_KERNEL.md): the
main evaluation's compositing — softplus sigma activation (+noise),
alpha conversion with the reference's far deltas, the SHARED
transmittance of NeRF-W additive compositing (`rendering.py:202-248`),
static/transient/total weights, and the rgb/depth maps — runs inside one
kernel that reads the MLP's packed (rows, 16) output directly. This
removes the XLA glue between the two Pallas stages AND the (N, S, 16)
layout transposes that the lane-sliced consumers forced (~0.8 ms each at
batch 8192; see docs/ARCHITECTURE.md profile).

Layout bridge (measured in round 2): the packed (BLK, 16) block
transposes to (16, R, S) planes in-VMEM (~0.1 ms per 1M rows), after
which all compositing math is lane-parallel over samples. The exclusive
transmittance cumprod uses a multiplicative Hillis-Steele lane scan
(jnp.cumprod is not lowered in Pallas TPU).

The backward kernel recomputes the forward (inputs are cheap) and
applies the hand-derived adjoints; the transmittance adjoint uses
  dL/d alpha_j = g_w_j T_j - (sum_{i>j} g_T_i T_i) / max(1-alpha_j, eps)
with the trailing sum formed by a DIRECT reverse lane scan — see
`_lane_rev_cumsum_excl` for why total-minus-prefix is numerically fatal
here. zs and the sigma noises carry no parameter dependence and are not
differentiated (like `need_dxyz=False` in the MLP kernels).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsff_pl_tpu.ops.compositing import STATIC_FAR_DELTA, TRANSIENT_FAR_DELTA

F32 = jnp.float32
TINY = 1e-37


def _lane_cumprod_excl(v):
    """Exclusive prefix product along lanes: multiplicative
    Hillis-Steele (log2(S) masked roll-multiplies)."""
    S = v.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    acc = v
    k = 1
    while k < S:
        acc = acc * jnp.where(col >= k, pltpu.roll(acc, k, 1), 1.0)
        k *= 2
    # exclusive: T_0 = 1, T_i = prod_{j<i} v_j = inclusive_{i-1}
    shifted = pltpu.roll(acc, 1, 1)
    return jnp.where(col >= 1, shifted, 1.0)


def _lane_rev_cumsum_excl(v):
    """out[j] = sum_{i > j} v[i] — a DIRECT reverse Hillis-Steele scan.
    Forming it as total - inclusive_prefix catastrophically cancels: at
    the far sample 1-alpha ~ 1e-31 (delta=100), and the ~1e-18 prefix
    cancellation residue divided by it exploded gradients to ~1e19."""
    S = v.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    acc = v
    k = 1
    while k < S:
        # roll by S-k brings v[i+k] to lane i (only non-negative shifts)
        acc = acc + jnp.where(col < S - k, pltpu.roll(acc, S - k, 1), 0.0)
        k *= 2
    return acc - v


def _deltas(zs):
    """(R, S) z values -> static & transient deltas along lanes
    (`rendering.py:202-204`)."""
    S = zs.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, zs.shape, dimension=1)
    nxt = pltpu.roll(zs, S - 1, 1)  # result[i] = zs[i+1] (shift >= 0 only)
    d = nxt - zs
    d_s = jnp.where(col == S - 1, STATIC_FAR_DELTA, d)
    d_t = jnp.where(col == S - 1, TRANSIENT_FAR_DELTA, d)
    return d_s, d_t


def _softplus(x):
    return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)


def _fwd_quantities(pt, zs, noise_s, noise_t):
    """Shared forward math on (R, S) planes. pt is (16, R, S)."""
    d_s, d_t = _deltas(zs)
    s_s = _softplus(pt[3] + noise_s)
    s_t = _softplus(pt[7] + noise_t)
    a_s = 1.0 - jnp.exp(-d_s * s_s)
    a_t = 1.0 - jnp.exp(-d_t * s_t)
    alpha = 1.0 - (1.0 - a_s) * (1.0 - a_t)
    T = _lane_cumprod_excl(1.0 - alpha)
    return d_s, d_t, s_s, s_t, a_s, a_t, alpha, T


def make_fused_compositing(n_samples: int, *, block_rays: int = 8):
    """Build the fused main-eval compositor.

    fn(packed, zs, noise_s, noise_t) with packed (N, S, 16) from the
    fused MLP kernel, zs/noises (N, S). Returns a dict of
        static_sigmas, transient_sigmas, static_alphas, transient_alphas,
        static_weights, transient_weights, weights   — each (N, S)
        rgb (N, 3), depth (N,)
    Differentiable in `packed` only (zs/noise are data).
    """
    S = n_samples
    R = block_rays
    BLK = R * S

    # ---------------- forward kernel ----------------
    def fwd_kernel(packed_ref, zs_ref, ns_ref, nt_ref, *outs):
        (ss_ref, st_ref, as_ref, at_ref, ws_ref, wt_ref, w_ref,
         map_ref) = outs
        pt = packed_ref[...].T.reshape(16, R, S)
        zs = zs_ref[...]
        _, _, s_s, s_t, a_s, a_t, alpha, T = _fwd_quantities(
            pt, zs, ns_ref[...], nt_ref[...])
        w_s = a_s * T
        w_t = a_t * T
        w = alpha * T
        ss_ref[...] = s_s
        st_ref[...] = s_t
        as_ref[...] = a_s
        at_ref[...] = a_t
        ws_ref[...] = w_s
        wt_ref[...] = w_t
        w_ref[...] = w
        # maps: rgb (R, 3) + depth (R, 1) packed into (R, 4)
        cols = [jnp.sum(w_s * pt[c] + w_t * pt[4 + c], -1, keepdims=True)
                for c in range(3)]
        cols.append(jnp.sum(w * zs, -1, keepdims=True))
        map_ref[...] = jnp.concatenate(cols, -1)

    # ---------------- backward kernel ----------------
    def bwd_kernel(packed_ref, zs_ref, ns_ref, nt_ref,
                   gss_ref, gst_ref, gas_ref, gat_ref, gws_ref, gwt_ref,
                   gw_ref, gmap_ref, dpacked_ref):
        pt = packed_ref[...].T.reshape(16, R, S)
        zs = zs_ref[...]
        noise_s = ns_ref[...]
        noise_t = nt_ref[...]
        d_s, d_t, s_s, s_t, a_s, a_t, alpha, T = _fwd_quantities(
            pt, zs, noise_s, noise_t)

        gmap = gmap_ref[...]  # (R, 4): d rgb(3) + d depth(1)
        g_ws = gws_ref[...]
        g_wt = gwt_ref[...]
        g_w = gw_ref[...]
        # rgb/depth map adjoints fold into the weight cotangents
        for c in range(3):
            g_ws = g_ws + gmap[:, c:c + 1] * pt[c]
            g_wt = g_wt + gmap[:, c:c + 1] * pt[4 + c]
        g_w = g_w + gmap[:, 3:4] * zs

        g_T = g_ws * a_s + g_wt * a_t + g_w * alpha
        trail = _lane_rev_cumsum_excl(g_T * T)
        g_alpha = g_w * T - trail / jnp.maximum(1.0 - alpha, TINY)

        g_as = g_ws * T + g_alpha * (1.0 - a_t) + gas_ref[...]
        g_at = g_wt * T + g_alpha * (1.0 - a_s) + gat_ref[...]
        g_ss = g_as * d_s * jnp.exp(-d_s * s_s) + gss_ref[...]
        g_st = g_at * d_t * jnp.exp(-d_t * s_t) + gst_ref[...]
        g_sraw = g_ss * jax.nn.sigmoid(pt[3] + noise_s)
        g_traw = g_st * jax.nn.sigmoid(pt[7] + noise_t)

        zero = jnp.zeros((R, S), F32)
        planes = []
        for c in range(16):
            if c < 3:
                planes.append(gmap[:, c:c + 1] * a_s * T)  # d static_rgb
            elif c == 3:
                planes.append(g_sraw)
            elif 4 <= c < 7:
                planes.append(gmap[:, c - 4:c - 3] * a_t * T)
            elif c == 7:
                planes.append(g_traw)
            else:
                planes.append(zero)
        dpt = jnp.stack(planes, 0)  # (16, R, S)
        dpacked_ref[...] = dpt.reshape(16, BLK).T

    # ---------------- host plumbing ----------------
    def _specs(n_blocks):
        row16 = pl.BlockSpec((BLK, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        rs = pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
        r4 = pl.BlockSpec((R, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return row16, rs, r4

    def _pad(packed, zs, noise_s, noise_t):
        n = packed.shape[0]
        pad = (-n) % R
        if pad:
            padr = lambda v: jnp.concatenate(  # noqa: E731
                [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], 0)
            packed, zs = padr(packed), padr(zs)
            noise_s, noise_t = padr(noise_s), padr(noise_t)
        return packed, zs, noise_s, noise_t, n, n + pad

    interpret = lambda: jax.default_backend() == "cpu"  # noqa: E731

    def _fwd(packed, zs, noise_s, noise_t):
        packed, zs, noise_s, noise_t, n, n_pad = _pad(
            packed, zs, noise_s, noise_t)
        n_blocks = n_pad // R
        row16, rs, r4 = _specs(n_blocks)
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=[row16, rs, rs, rs],
            out_specs=(rs,) * 7 + (r4,),
            out_shape=tuple([jax.ShapeDtypeStruct((n_pad, S), F32)] * 7
                            + [jax.ShapeDtypeStruct((n_pad, 4), F32)]),
            interpret=interpret(),
        )(packed.reshape(n_pad * S, 16), zs, noise_s, noise_t)
        outs = [o[:n] for o in outs]
        keys = ("static_sigmas", "transient_sigmas", "static_alphas",
                "transient_alphas", "static_weights", "transient_weights",
                "weights")
        res = dict(zip(keys, outs[:7]))
        res["rgb"] = outs[7][:, :3]
        res["depth"] = outs[7][:, 3]
        return res

    @jax.custom_vjp
    def fused(packed, zs, noise_s, noise_t):
        return _fwd(packed, zs, noise_s, noise_t)

    def fwd_rule(packed, zs, noise_s, noise_t):
        return fused(packed, zs, noise_s, noise_t), (packed, zs, noise_s,
                                                     noise_t)

    def bwd_rule(res, g):
        packed, zs, noise_s, noise_t = res
        n_orig = packed.shape[0]
        packedp, zsp, nsp, ntp, n, n_pad = _pad(packed, zs, noise_s,
                                                noise_t)
        n_blocks = n_pad // R

        def pad_g(v, cols):
            v = v.astype(F32)
            if v.shape[0] != n_pad:
                v = jnp.concatenate(
                    [v, jnp.zeros((n_pad - v.shape[0],) + v.shape[1:],
                                  F32)], 0)
            return v

        gmap = jnp.concatenate([g["rgb"], g["depth"][:, None]], -1)
        args = [packedp.reshape(n_pad * S, 16), zsp, nsp, ntp,
                pad_g(g["static_sigmas"], S), pad_g(g["transient_sigmas"], S),
                pad_g(g["static_alphas"], S), pad_g(g["transient_alphas"], S),
                pad_g(g["static_weights"], S),
                pad_g(g["transient_weights"], S),
                pad_g(g["weights"], S), pad_g(gmap, 4)]
        row16, rs, r4 = _specs(n_blocks)
        dpacked = pl.pallas_call(
            bwd_kernel,
            grid=(n_blocks,),
            in_specs=[row16, rs, rs, rs] + [rs] * 7 + [r4],
            out_specs=row16,
            out_shape=jax.ShapeDtypeStruct((n_pad * S, 16), F32),
            interpret=interpret(),
        )(*args)
        dpacked = dpacked.reshape(n_pad, S, 16)[:n_orig]
        return (dpacked, jnp.zeros_like(zs), jnp.zeros_like(noise_s),
                jnp.zeros_like(noise_t))

    fused.defvjp(fwd_rule, bwd_rule)
    return fused
