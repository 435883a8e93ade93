"""Fused planar compositing — one Pallas kernel for all three composites.

The planar train path (`models/raymarch.py`) composites the main
evaluation plus the two warped evaluations in XLA: softplus sigma
activation (+noise), the shared-transmittance additive NeRF-W weights
(reference `rendering.py:202-248`), and the rgb/depth/warped-rgb maps.
That is ~25 HBM-bound elementwise fusions re-reading the same (N, S)
planes (~1.5 ms of the ~3 ms step glue at batch 8192). This kernel reads
each input plane once and writes each output once, for all three
composites together (they share tau_s), with a hand-derived VJP.

Numerics: transmittance is exp(-excl_cumsum(tau)) — same identity the
XLA path uses (`ops/compositing.py::transmittance_from_taus`) — with the
exclusive cumsum as a direct Hillis-Steele lane scan. The adjoint of
this form needs NO 1/(1-alpha) division (unlike the cumprod form in
`ops/compositing_kernel.py`): dT_j/du_i = -T_j for i < j, so
g_u = alpha-terms - rev_cumsum_excl(g_T * T), all well-conditioned.

Used by `render_train_planar` when the Pallas train backend is active;
equivalence with the XLA compositing is asserted in
tests/test_planar_path.py (interpret mode on CPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsff_pl_tpu.ops.compositing import STATIC_FAR_DELTA, TRANSIENT_FAR_DELTA

F32 = jnp.float32

# input planes, in order: zs + 4 raw sigmas + 4 noises + 12 rgb planes
_IN_KEYS = ("zs", "ssig", "tsig", "tsig_w1", "tsig_w2",
            "ns", "nt", "nw1", "nw2",
            "srgb_r", "srgb_g", "srgb_b",
            "trgb_r", "trgb_g", "trgb_b",
            "trgb_w1_r", "trgb_w1_g", "trgb_w1_b",
            "trgb_w2_r", "trgb_w2_g", "trgb_w2_b")
# output planes; maps is a packed (N, 16) tile:
#   cols 0:3 rgb_fine, 3 depth_fine, 4:7 rgb_w1, 7:10 rgb_w2
_OUT_KEYS = ("static_weights", "transient_weights", "weights",
             "tw_w1", "tw_w2")
_N_MAP = 16


def _lane_cumsum_excl(v):
    """Exclusive prefix sum along lanes (Hillis-Steele, log2(S) steps)."""
    S = v.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    acc = v
    k = 1
    while k < S:
        acc = acc + jnp.where(col >= k, pltpu.roll(acc, k, 1), 0.0)
        k *= 2
    shifted = pltpu.roll(acc, 1, 1)
    return jnp.where(col >= 1, shifted, 0.0)


def _lane_rev_cumsum_excl(v):
    """out[j] = sum_{i > j} v[i] — direct reverse Hillis-Steele scan."""
    S = v.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    acc = v
    k = 1
    while k < S:
        acc = acc + jnp.where(col < S - k, pltpu.roll(acc, S - k, 1), 0.0)
        k *= 2
    return acc - v


def _deltas(zs):
    """(R, S) z samples -> static & transient deltas (`rendering.py:202-204`)."""
    S = zs.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, zs.shape, dimension=1)
    nxt = pltpu.roll(zs, S - 1, 1)  # nxt[i] = zs[i+1] (non-negative shift)
    d = nxt - zs
    d_s = jnp.where(col == S - 1, STATIC_FAR_DELTA, d)
    d_t = jnp.where(col == S - 1, TRANSIENT_FAR_DELTA, d)
    return d_s, d_t


def _softplus(x):
    return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)


def _fwd_core(ins):
    """Shared forward math on (R, S) planes. Returns every quantity the
    forward outputs + the backward reuses."""
    zs = ins["zs"]
    d_s, d_t = _deltas(zs)
    sp = {k: _softplus(ins[k] + ins[n])
          for k, n in (("ssig", "ns"), ("tsig", "nt"),
                       ("tsig_w1", "nw1"), ("tsig_w2", "nw2"))}
    tau_s = d_s * sp["ssig"]
    taus = {c: d_t * sp[f"tsig{c}"] for c in ("", "_w1", "_w2")}
    a_s = 1.0 - jnp.exp(-tau_s)
    out = {"d_s": d_s, "d_t": d_t, "tau_s": tau_s, "a_s": a_s, "sp": sp,
           "taus": taus}
    for c in ("", "_w1", "_w2"):
        u = tau_s + taus[c]
        T = jnp.exp(-_lane_cumsum_excl(u))
        out[f"T{c}"] = T
        out[f"a{c}"] = 1.0 - jnp.exp(-taus[c])
        out[f"alpha{c}"] = 1.0 - jnp.exp(-u)
    return out


def make_planar_compositor(n_samples: int, *, block_rays: int = 0):
    """Build the fused 3-composite compositor.

    fn(inputs: dict of the 21 `_IN_KEYS` (N, S) planes) -> dict of
        static_weights, transient_weights, weights  (main composite)
        tw_w1, tw_w2      (warped-transient weights, vs the shared static)
        maps (N, 16):     rgb_fine | depth_fine | rgb_w1 | rgb_w2 | 0-pad
    Differentiable in the sigma and rgb planes; zs and the noises are
    data (no parameter dependence on this path, like `raymarch_kernel`).
    Reference semantics: `rendering.py:202-248` (main),
    `render_transient_warping` `rendering.py:98-140` (warps).
    """
    S = n_samples
    # keep the per-block working set ~constant: the bwd kernel holds ~43
    # (R, S) f32 planes + scan temporaries in scoped VMEM; (256, 128)
    # blocks sit near the 16 MB cap, so shrink R as S grows (coarse-to-
    # fine fine passes run S = N_samples + 2*N_importance, e.g. 256)
    R = block_rays or max(8, min(256, 32768 // S))

    def fwd_kernel(*refs):
        ins = {k: r[...] for k, r in zip(_IN_KEYS, refs[:len(_IN_KEYS)])}
        outs = refs[len(_IN_KEYS):]
        q = _fwd_core(ins)
        sw = q["a_s"] * q["T"]
        tw = q["a"] * q["T"]
        w = q["alpha"] * q["T"]
        tw_w1 = q["a_w1"] * q["T_w1"]
        tw_w2 = q["a_w2"] * q["T_w2"]
        for ref, v in zip(outs[:5], (sw, tw, w, tw_w1, tw_w2)):
            ref[...] = v
        sw_w1 = q["a_s"] * q["T_w1"]
        sw_w2 = q["a_s"] * q["T_w2"]
        cols = []
        for c in "rgb":
            cols.append(jnp.sum(sw * ins[f"srgb_{c}"]
                                + tw * ins[f"trgb_{c}"], -1, keepdims=True))
        cols.append(jnp.sum(w * ins["zs"], -1, keepdims=True))
        for wc, swc, tag in ((tw_w1, sw_w1, "w1"), (tw_w2, sw_w2, "w2")):
            for c in "rgb":
                cols.append(jnp.sum(swc * ins[f"srgb_{c}"]
                                    + wc * ins[f"trgb_{tag}_{c}"], -1,
                                    keepdims=True))
        cols.append(jnp.zeros((R, _N_MAP - 10), F32))
        outs[5][...] = jnp.concatenate(cols, -1)

    def bwd_kernel(*refs):
        it = iter(refs)
        ins = {k: next(it)[...] for k in _IN_KEYS}
        g = {k: next(it)[...] for k in _OUT_KEYS}
        gmap = next(it)[...]  # (R, 16)
        douts = [next(it) for _ in range(16)]  # 4 sigma + 12 rgb planes

        q = _fwd_core(ins)
        zs = ins["zs"]
        a_s, T = q["a_s"], q["T"]
        sw = a_s * T
        tw = q["a"] * T
        w = q["alpha"] * T
        tw_w1 = q["a_w1"] * q["T_w1"]
        tw_w2 = q["a_w2"] * q["T_w2"]
        sw_w1 = a_s * q["T_w1"]
        sw_w2 = a_s * q["T_w2"]

        # ---- map adjoints fold into weight-plane cotangents + rgb grads
        g_sw = g["static_weights"]
        g_tw = g["transient_weights"]
        g_w = g["weights"] + gmap[:, 3:4] * zs
        g_tww1 = g["tw_w1"]
        g_tww2 = g["tw_w2"]
        g_sww1 = jnp.zeros_like(g_sw)
        g_sww2 = jnp.zeros_like(g_sw)
        d_rgb = {}
        for i, c in enumerate("rgb"):
            gm = gmap[:, i:i + 1]
            g1 = gmap[:, 4 + i:5 + i]
            g2 = gmap[:, 7 + i:8 + i]
            g_sw = g_sw + gm * ins[f"srgb_{c}"]
            g_tw = g_tw + gm * ins[f"trgb_{c}"]
            g_sww1 = g_sww1 + g1 * ins[f"srgb_{c}"]
            g_tww1 = g_tww1 + g1 * ins[f"trgb_w1_{c}"]
            g_sww2 = g_sww2 + g2 * ins[f"srgb_{c}"]
            g_tww2 = g_tww2 + g2 * ins[f"trgb_w2_{c}"]
            d_rgb[f"srgb_{c}"] = gm * sw + g1 * sw_w1 + g2 * sw_w2
            d_rgb[f"trgb_{c}"] = gm * tw
            d_rgb[f"trgb_w1_{c}"] = g1 * tw_w1
            d_rgb[f"trgb_w2_{c}"] = g2 * tw_w2

        # ---- per-composite transmittance adjoints (additive exp form)
        # u_c = tau_s + tau_c; T_c = exp(-cumsum_excl(u_c));
        # dT_j/du_i = -T_j (i<j)  =>  g_u = (direct terms)
        #   - rev_cumsum_excl(g_T * T)
        g_tau_s = jnp.zeros_like(a_s)
        g_tau = {}
        exp_ms = 1.0 - a_s  # exp(-tau_s)
        comps = (("", g_sw, g_tw, g_w),
                 ("_w1", g_sww1, g_tww1, None),
                 ("_w2", g_sww2, g_tww2, None))
        for c, gs, gt, gw in comps:
            T_c, a_c, alpha_c = q[f"T{c}"], q[f"a{c}"], q[f"alpha{c}"]
            g_T = gs * a_s + gt * a_c
            g_u = jnp.zeros_like(a_s)
            if gw is not None:
                g_T = g_T + gw * alpha_c
                g_u = gw * T_c * (1.0 - alpha_c)  # d alpha/du = exp(-u)
            g_u = g_u - _lane_rev_cumsum_excl(g_T * T_c)
            # a_s = 1 - exp(-tau_s); a_c = 1 - exp(-tau_c)
            g_tau_s = g_tau_s + g_u + gs * T_c * exp_ms
            g_tau[c] = g_u + gt * T_c * (1.0 - a_c)

        # tau_s = d_s * softplus(ssig + ns)  (and transient analogs)
        sig = lambda k, n: jax.nn.sigmoid(ins[k] + ins[n])  # noqa: E731
        d_sig = {
            "ssig": g_tau_s * q["d_s"] * sig("ssig", "ns"),
            "tsig": g_tau[""] * q["d_t"] * sig("tsig", "nt"),
            "tsig_w1": g_tau["_w1"] * q["d_t"] * sig("tsig_w1", "nw1"),
            "tsig_w2": g_tau["_w2"] * q["d_t"] * sig("tsig_w2", "nw2"),
        }
        order = (["ssig", "tsig", "tsig_w1", "tsig_w2"]
                 + [k for k in _IN_KEYS if "rgb" in k])
        for ref, k in zip(douts, order):
            ref[...] = d_sig[k] if k in d_sig else d_rgb[k]

    # ------------------------------------------------------------------
    interpret = lambda: jax.default_backend() == "cpu"  # noqa: E731
    plane = pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mapspec = pl.BlockSpec((R, _N_MAP), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    def _pad(planes, n):
        pad = (-n) % R
        if pad == 0:
            return planes, n
        return [jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], 0)
            for v in planes], n + pad

    def _fwd(ins):
        n = ins["zs"].shape[0]
        planes, n_pad = _pad([ins[k] for k in _IN_KEYS], n)
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_pad // R,),
            in_specs=[plane] * len(_IN_KEYS),
            out_specs=(plane,) * 5 + (mapspec,),
            out_shape=tuple([jax.ShapeDtypeStruct((n_pad, S), F32)] * 5
                            + [jax.ShapeDtypeStruct((n_pad, _N_MAP), F32)]),
            interpret=interpret(),
        )(*planes)
        res = {k: v[:n] for k, v in zip(_OUT_KEYS, outs[:5])}
        res["maps"] = outs[5][:n]
        return res

    @jax.custom_vjp
    def fused(ins):
        return _fwd(ins)

    def fwd_rule(ins):
        return fused(ins), ins

    def bwd_rule(ins, g):
        n = ins["zs"].shape[0]
        gz = lambda k, c: (g[k].astype(F32) if g.get(k) is not None  # noqa: E731
                           else jnp.zeros((n, c), F32))
        args = ([ins[k] for k in _IN_KEYS]
                + [gz(k, S) for k in _OUT_KEYS] + [gz("maps", _N_MAP)])
        args, n_pad = _pad(args, n)
        douts = pl.pallas_call(
            bwd_kernel,
            grid=(n_pad // R,),
            in_specs=[plane] * (len(_IN_KEYS) + 5) + [mapspec],
            out_specs=(plane,) * 16,
            out_shape=tuple([jax.ShapeDtypeStruct((n_pad, S), F32)] * 16),
            interpret=interpret(),
        )(*args)
        order = (["ssig", "tsig", "tsig_w1", "tsig_w2"]
                 + [k for k in _IN_KEYS if "rgb" in k])
        d = {k: v[:n] for k, v in zip(order, douts)}
        # zs / noises carry no parameter dependence
        return ({k: d.get(k, jnp.zeros_like(ins[k])) for k in _IN_KEYS},)

    fused.defvjp(fwd_rule, bwd_rule)
    return fused
