"""Softmax splatting (forward warping) as a deterministic XLA scatter-add.

TPU-native replacement for the reference's three raw CUDA kernels compiled
via CuPy NVRTC (`models/softsplat.py:6-146,208-301`):

- forward: bilinear scatter-add of each source pixel into the 4 integer
  neighbors of (x + flow_x, y + flow_y) — the reference's
  `kernel_Softsplat_updateOutput` (`softsplat.py:6-44`), expressed as 4
  `jnp.at[].add(mode='drop')` scatters. TPU has no atomicAdd; XLA lowers
  these to a deterministic sorted scatter, so results are bit-reproducible
  (the CUDA version's float accumulation order is not — SURVEY.md §5).
- gradients: the reference hand-writes the input gradient as a gather
  (`softsplat.py:46-88`) and the flow gradient via d(bilinear)/d(flow)
  (`softsplat.py:90-146`). Here both fall out of JAX autodiff: corner
  indices go through floor+stop_gradient, bilinear weights stay
  differentiable in flow, and the adjoint of scatter-add IS the weighted
  gather. Verified against finite differences in tests/test_softsplat.py.

Layout: (H, W, C) channels-last (the reference uses NCHW), batched via
vmap where needed.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def softsplat_sum(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Summation-mode splat: (H, W, C) image forward-warped by (H, W, 2)
    flow (flow[..., 0] = x/col displacement, flow[..., 1] = y/row — the
    reference's channel convention, `softsplat.py:19-20`)."""
    H, W, C = image.shape
    x = jnp.arange(W, dtype=flow.dtype)[None, :] + flow[..., 0]
    y = jnp.arange(H, dtype=flow.dtype)[:, None] + flow[..., 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    # integer corner indices are non-differentiable; weights below carry
    # the flow gradient
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1

    # bilinear weights (differentiable in flow) — softsplat.py:27-30
    wx1 = x - jax.lax.stop_gradient(x0f)  # fraction toward x1
    wy1 = y - jax.lax.stop_gradient(y0f)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = jnp.zeros((H * W, C), image.dtype)
    src = image.reshape(H * W, C)

    def scatter(out, yi, xi, w):
        idx = (yi * W + xi).reshape(H * W)
        # out-of-bounds corners -> mode='drop' (softsplat.py:32-41 bounds
        # checks); also force their index invalid so clipping can't alias
        inside = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).reshape(H * W)
        idx = jnp.where(inside, idx, H * W)  # one-past-end is dropped
        return out.at[idx].add(src * w.reshape(H * W, 1), mode="drop")

    out = scatter(out, y0, x0, wy0 * wx0)
    out = scatter(out, y0, x1, wy0 * wx1)
    out = scatter(out, y1, x0, wy1 * wx0)
    out = scatter(out, y1, x1, wy1 * wx1)
    return out.reshape(H, W, C)


def _shift2d(a, ky: int, kx: int):
    """Shift a (..., H, W, C) array by (ky, kx) with zero fill — moves the
    value at source pixel (y, x) to (y+ky, x+kx); values shifted past the
    border drop (the scatter's mode='drop' semantics)."""
    H, W = a.shape[-3], a.shape[-2]
    pad = [(0, 0)] * (a.ndim - 3) + [(max(ky, 0), max(-ky, 0)),
                                     (max(kx, 0), max(-kx, 0)), (0, 0)]
    a = jnp.pad(a, pad)
    ys = slice(max(-ky, 0), max(-ky, 0) + H)
    xs = slice(max(-kx, 0), max(-kx, 0) + W)
    return a[..., ys, xs, :]


def softsplat_sum_rolls(images: jnp.ndarray, flows: jnp.ndarray,
                        max_disp: Optional[int] = None, *,
                        kx_range=None, ky_range=None) -> jnp.ndarray:
    """Summation splat as a dense shift decomposition — EXACT equal to
    `softsplat_sum` whenever every reached integer offset lies in the
    term ranges.

    The XLA scatter-add runs serialized on TPU (~12M updates/s — an MPI
    interpolation frame spent 12.7 s in it); but each source pixel only
    reaches integer offsets k with floor(flow) in [k-1, k], so the
    scatter equals

        out = sum_{ky, kx} shift(v * wy(ky) * wx(kx), ky, kx)

    — dense elementwise+shift terms that batch over the plane axis
    (measured 3x faster end-to-end for MPI interpolation at D=4; see
    docs/ROADMAP.md for the alternatives measured slower: a channel-
    split variant and two pallas roll kernels).

    Term ranges: `max_disp=D` expands to the symmetric-contract ranges
    [-D, D+1] per axis (exact whenever |flow| <= D). `kx_range`/
    `ky_range` give per-axis inclusive (lo, hi) offset ranges instead —
    exact iff lo <= floor(f) and floor(f)+1 <= hi for every pixel's flow
    component f (the term count is the product of the range widths, so
    tighter measured ranges are quadratically cheaper; `softsplat_batched`
    measures them per plane). CALLER CONTRACT: out-of-range
    displacements match no shift term and silently drop splat mass.
    `softsplat_batched` validates this when the flows are concrete and
    measures/buckets ranges itself; under jit with explicit ranges the
    contract is the caller's to uphold.

    images: (..., H, W, C); flows: (..., H, W, 2). Differentiable in both
    (the same stop-gradient corner/weight structure as the scatter path).
    """
    if kx_range is None:
        kx_range = (-int(max_disp), int(max_disp) + 1)
    if ky_range is None:
        ky_range = (-int(max_disp), int(max_disp) + 1)
    H, W = images.shape[-3], images.shape[-2]
    fx, fy = flows[..., 0], flows[..., 1]
    x0f = jnp.floor(fx + jnp.arange(W, dtype=flows.dtype)[None, :])
    y0f = jnp.floor(fy + jnp.arange(H, dtype=flows.dtype)[:, None])
    wx1 = fx + jnp.arange(W, dtype=flows.dtype)[None, :] \
        - jax.lax.stop_gradient(x0f)
    wy1 = fy + jnp.arange(H, dtype=flows.dtype)[:, None] \
        - jax.lax.stop_gradient(y0f)
    # integer corner offsets relative to the source pixel
    ox = jax.lax.stop_gradient(x0f).astype(jnp.int32) \
        - jnp.arange(W, dtype=jnp.int32)[None, :]
    oy = jax.lax.stop_gradient(y0f).astype(jnp.int32) \
        - jnp.arange(H, dtype=jnp.int32)[:, None]

    def sel(off, w1, k):
        """Weight each source pixel sends to integer offset k (two
        bilinear corners: `off` with weight 1-w1, `off`+1 with w1)."""
        return jnp.where(off == k, 1.0 - w1, 0.0) \
            + jnp.where(off + 1 == k, w1, 0.0)

    # hoist the 1-channel per-axis select fields out of the quadratic
    # term loop: the inner iterations then cost one 1-ch multiply +
    # C-ch multiply-add each instead of recomputing the 4-op select per
    # term (the splat is VPU-compute-bound)
    sxs = {kx: sel(ox, wx1, kx)[..., None]
           for kx in range(kx_range[0], kx_range[1] + 1)}
    sys_ = {ky: sel(oy, wy1, ky)[..., None]
            for ky in range(ky_range[0], ky_range[1] + 1)}

    out = jnp.zeros(images.shape, images.dtype)
    for ky in range(ky_range[0], ky_range[1] + 1):
        sy = sys_[ky]
        row = jnp.zeros(images.shape, images.dtype)
        for kx in range(kx_range[0], kx_range[1] + 1):
            row = row + _shift2d(images * (sy * sxs[kx]), 0, kx)
        out = out + _shift2d(row, ky, 0)
    return out


def _shift2d_hw(a, ky: int, kx: int):
    """`_shift2d` for W-minor planar arrays (..., H, W)."""
    H, W = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [(max(ky, 0), max(-ky, 0)),
                                     (max(kx, 0), max(-kx, 0))]
    a = jnp.pad(a, pad)
    return a[..., max(-ky, 0):max(-ky, 0) + H,
             max(-kx, 0):max(-kx, 0) + W]


def softsplat_sum_rolls_planar(images: jnp.ndarray, fx: jnp.ndarray,
                               fy: jnp.ndarray, *, kx_range,
                               ky_range) -> jnp.ndarray:
    """`softsplat_sum_rolls` in PLANAR layout: images (..., C, H, W),
    flow components fx/fy (..., H, W) — same math, term for term.

    Layout is the whole point: channels-last puts C (2-5 for MPI planes)
    on the TPU's 128-wide lane dimension, so every elementwise op in the
    term loop runs at <4% lane utilization; W-minor planar tiles (H, W)
    = (288, 512) perfectly. Measured 6x end-to-end on MPI interpolation
    (see docs/ROADMAP.md round 3)."""
    H, W = images.shape[-2], images.shape[-1]
    x0f = jnp.floor(fx + jnp.arange(W, dtype=fx.dtype)[None, :])
    y0f = jnp.floor(fy + jnp.arange(H, dtype=fy.dtype)[:, None])
    wx1 = fx + jnp.arange(W, dtype=fx.dtype)[None, :] \
        - jax.lax.stop_gradient(x0f)
    wy1 = fy + jnp.arange(H, dtype=fy.dtype)[:, None] \
        - jax.lax.stop_gradient(y0f)
    ox = jax.lax.stop_gradient(x0f).astype(jnp.int32) \
        - jnp.arange(W, dtype=jnp.int32)[None, :]
    oy = jax.lax.stop_gradient(y0f).astype(jnp.int32) \
        - jnp.arange(H, dtype=jnp.int32)[:, None]

    def sel(off, w1, k):
        return jnp.where(off == k, 1.0 - w1, 0.0) \
            + jnp.where(off + 1 == k, w1, 0.0)

    # 1-channel select fields, hoisted out of the quadratic term loop;
    # [..., None, :, :] broadcasts them over the C axis
    sxs = {kx: sel(ox, wx1, kx)[..., None, :, :]
           for kx in range(kx_range[0], kx_range[1] + 1)}
    sys_ = {ky: sel(oy, wy1, ky)[..., None, :, :]
            for ky in range(ky_range[0], ky_range[1] + 1)}

    out = jnp.zeros(images.shape, images.dtype)
    for ky in range(ky_range[0], ky_range[1] + 1):
        sy = sys_[ky]
        row = jnp.zeros(images.shape, images.dtype)
        for kx in range(kx_range[0], kx_range[1] + 1):
            row = row + _shift2d_hw(images * (sy * sxs[kx]), 0, kx)
        out = out + _shift2d_hw(row, ky, 0)
    return out


def softsplat(image: jnp.ndarray, flow: jnp.ndarray,
              metric: Optional[jnp.ndarray] = None,
              mode: str = "average", eps: float = 0.0) -> jnp.ndarray:
    """Forward-warp `image` by `flow` — the reference's `FunctionSoftsplat`
    wrapper (`softsplat.py:303-329`).

    mode:
        'summation' — raw scatter-add
        'average'   — append a ones channel, divide by its splat
        'linear'    — weight by `metric` (H, W, 1)
        'softmax'   — weight by exp(metric) (Z-buffer style softmax splat)
    Zero-weight output pixels keep 0 (the reference sets the normalizer to
    1 where it is 0, `softsplat.py:320-322`).
    """
    if mode not in ("summation", "average", "linear", "softmax"):
        raise ValueError(f"unknown splat mode {mode!r}")
    if mode in ("linear", "softmax"):
        if metric is None or metric.shape[-1] != 1:
            raise ValueError("linear/softmax modes need a (H, W, 1) metric")

    if mode == "summation":
        return softsplat_sum(image, flow)

    if mode == "average":
        weighted = image
        norm_src = jnp.ones_like(image[..., :1])
    elif mode == "linear":
        weighted = image * metric
        norm_src = metric
    else:  # softmax
        m = jnp.exp(metric)
        weighted = image * m
        norm_src = m

    out = softsplat_sum(jnp.concatenate([weighted, norm_src], -1), flow)
    norm = out[..., -1:]
    norm = jnp.where(norm == 0.0, 1.0, norm)
    return out[..., :-1] / (norm + eps)


# per-axis inclusive offset-range buckets, tightest first: the
# odd symmetric [-D, D] forms serve flows with floor(f) in [-D, D-1]
# (i.e. -D <= f < D — the common case since measured maxima are rarely
# integers), the [-D, D+1] forms the exact-integer / asymmetric spill
_RANGE_BUCKETS = ((-1, 1), (-1, 2), (-2, 2), (-2, 3), (-3, 3), (-3, 4),
                  (-4, 4), (-4, 5), (-6, 6), (-6, 7), (-8, 8), (-8, 9),
                  (-12, 12), (-12, 13), (-16, 16), (-16, 17))


def _axis_range(lo_f: float, hi_f: float):
    """Smallest bucketed offset range covering flows in [lo_f, hi_f]
    (exactness: lo <= floor(lo_f) and floor(hi_f)+1 <= hi), or None."""
    import math

    lo_need = math.floor(lo_f)
    hi_need = math.floor(hi_f) + 1
    for r in _RANGE_BUCKETS:
        if r[0] <= lo_need and hi_need <= r[1]:
            return r
    return None


def _rolls_with_mode(images, flows, mode: str, max_disp=None, *,
                     kx_range=None, ky_range=None):
    """Shift-decomposition splat with 'summation'/'average' semantics."""
    kw = dict(kx_range=kx_range, ky_range=ky_range)
    if mode == "summation":
        return softsplat_sum_rolls(images, flows, max_disp, **kw)
    stacked = jnp.concatenate(
        [images, jnp.ones_like(images[..., :1])], -1)
    out = softsplat_sum_rolls(stacked, flows, max_disp, **kw)
    norm = out[..., -1:]
    norm = jnp.where(norm == 0.0, 1.0, norm)
    return out[..., :-1] / norm


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


_ROLL_CHUNK = 16  # planes per lax.map step inside the jitted splat


@functools.lru_cache(maxsize=None)
def _jit_rolls(mode: str, kx_range, ky_range):
    """Jitted shift-decomposition splat for the EAGER (concrete-flow)
    path: without this every one of the O(range^2) terms dispatches as a
    separate op over the device tunnel and round-trip latency dominates
    the millisecond-scale compute. One compile per (mode, ranges, shape)
    — the power-of-two group padding keeps that set small.

    The plane axis is chunked with lax.map: one fused whole-stack program
    lets XLA's scheduler keep many (S, H, W, C) term buffers live at once
    (measured 27 GB peak at MPI-interpolation scale — an HBM OOM);
    sequential 16-plane chunks bound the live set while keeping the
    single-dispatch property."""
    def chunk(args):
        im, fl = args
        return _rolls_with_mode(im, fl, mode,
                                kx_range=kx_range, ky_range=ky_range)

    def f(images, flows):
        S = images.shape[0]
        if S <= _ROLL_CHUNK:
            return chunk((images, flows))
        pad = -S % _ROLL_CHUNK
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:],
                                   images.dtype)])
            flows = jnp.concatenate(
                [flows, jnp.zeros((pad,) + flows.shape[1:], flows.dtype)])
        imr = images.reshape((-1, _ROLL_CHUNK) + images.shape[1:])
        flr = flows.reshape((-1, _ROLL_CHUNK) + flows.shape[1:])
        out = jax.lax.map(chunk, (imr, flr))
        return out.reshape((-1,) + images.shape[1:])[:S]

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_scatter(mode: str):
    """Jitted vmapped exact-scatter splat for the eager fallback group."""
    return jax.jit(jax.vmap(lambda im, fl: softsplat(im, fl, None, mode)))


@jax.jit
def _probe_planar(fx, fy):
    """Per-plane per-axis flow extrema, (S, 4) = [min_x, max_x, min_y,
    max_y] — jitted: the eager reductions over a (S, H*W)-reshaped stack
    measured ~750 ms at MPI-interpolation scale (bad eager layouts),
    the compiled program <2 ms."""
    S = fx.shape[0]
    fxr, fyr = fx.reshape(S, -1), fy.reshape(S, -1)
    return jnp.stack([jnp.min(fxr, 1), jnp.max(fxr, 1),
                      jnp.min(fyr, 1), jnp.max(fyr, 1)], 1)


@jax.jit
def _probe_cl(flows):
    """`_probe_planar` for channels-last (S, H, W, 2) flows."""
    return _probe_planar(flows[..., 0], flows[..., 1])


def _rolls_planar_with_mode(images, fx, fy, mode: str, kx_range, ky_range):
    """Planar-layout splat with 'summation'/'average' semantics
    (C rides axis -3; cf. `_rolls_with_mode`)."""
    if mode == "summation":
        return softsplat_sum_rolls_planar(images, fx, fy,
                                          kx_range=kx_range,
                                          ky_range=ky_range)
    stacked = jnp.concatenate(
        [images, jnp.ones_like(images[..., :1, :, :])], -3)
    out = softsplat_sum_rolls_planar(stacked, fx, fy, kx_range=kx_range,
                                     ky_range=ky_range)
    norm = out[..., -1:, :, :]
    norm = jnp.where(norm == 0.0, 1.0, norm)
    return out[..., :-1, :, :] / norm


@functools.lru_cache(maxsize=None)
def _jit_rolls_planar(mode: str, kx_range, ky_range):
    """Planar-layout counterpart of `_jit_rolls` (same chunked lax.map
    to bound the live set of term buffers)."""
    def chunk(args):
        im, fx, fy = args
        return _rolls_planar_with_mode(im, fx, fy, mode,
                                       kx_range, ky_range)

    def f(images, fx, fy):
        S = images.shape[0]
        if S <= _ROLL_CHUNK:
            return chunk((images, fx, fy))
        pad = -S % _ROLL_CHUNK
        if pad:
            images, fx, fy = (
                jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                for a in (images, fx, fy))
        out = jax.lax.map(
            chunk, tuple(a.reshape((-1, _ROLL_CHUNK) + a.shape[1:])
                         for a in (images, fx, fy)))
        return out.reshape((-1,) + images.shape[1:])[:S]

    return jax.jit(f)


def _bucket_groups(ext, S: int) -> dict:
    """Per-plane bucketed (kx_range, ky_range) from probed extrema; None
    keys mark planes beyond the largest bucket (scatter fallback)."""
    groups: dict = {}
    for i in range(S):
        rx = _axis_range(ext[i, 0], ext[i, 1])
        ry = _axis_range(ext[i, 2], ext[i, 3])
        key = (rx, ry) if (rx and ry) else None
        groups.setdefault(key, []).append(i)
    return groups


def _splat_groups(groups: dict, S: int, splat_fn, scatter_fn, arrays):
    """Splat each bucketed plane group and reassemble in original order
    with ONE inverse-permutation gather (a per-plane python stack costs
    hundreds of eager dispatches). Group plane counts are padded to
    powers of two so repeated calls reuse compiled shapes.

    `splat_fn(rx, ry, *group_arrays)` handles a bucketed group;
    `scatter_fn(*group_arrays)` handles over-range planes. `arrays` are
    per-plane arrays indexed on axis 0. Shared by the channels-last and
    planar batched splats — one implementation of the grouping
    machinery."""
    import numpy as np

    if len(groups) == 1 and None not in groups:
        (rx, ry), _ = next(iter(groups.items()))
        return splat_fn(rx, ry, *arrays)
    parts, order = [], []
    for key, idx_list in groups.items():
        idx = np.asarray(idx_list)
        g = [a[idx] for a in arrays]
        if key is None:
            o = scatter_fn(*g)
        else:
            pad = _next_pow2(len(idx)) - len(idx)
            if pad:
                g = [jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                    for a in g]
            o = splat_fn(key[0], key[1], *g)[:len(idx)]
        parts.append(o)
        order.extend(idx.tolist())
    inv = np.empty(S, np.int64)
    inv[np.asarray(order)] = np.arange(S)
    return jnp.concatenate(parts, 0)[jnp.asarray(inv)]


def softsplat_batched_planar(images: jnp.ndarray, fx: jnp.ndarray,
                             fy: jnp.ndarray,
                             mode: str = "average") -> jnp.ndarray:
    """`softsplat_batched` for PLANAR plane stacks: (S, C, H, W) x two
    (S, H, W) flow components -> (S, C, H, W).

    Same per-plane/per-axis measured bucketing (one probe fetch), but
    the splat math runs W-minor so the TPU's vector lanes ride the
    512-wide image axis instead of the 4-wide channel axis. Eager
    (concrete-flow) callers only — `interpolate`'s per-frame loop.
    Planes beyond the largest bucket fall back to the exact scatter
    (transposed through the channels-last kernel)."""
    import numpy as np

    assert mode in ("average", "summation")
    S = images.shape[0]
    if not S:
        return images
    ext = np.asarray(_probe_planar(fx, fy))

    def splat(rx, ry, im, fx_, fy_):
        return _jit_rolls_planar(mode, rx, ry)(im, fx_, fy_)

    def scatter(im, fx_, fy_):  # over-range planes: exact scatter
        # (transposed through the channels-last kernel)
        return _jit_scatter(mode)(
            im.transpose(0, 2, 3, 1),
            jnp.stack([fx_, fy_], -1)).transpose(0, 3, 1, 2)

    return _splat_groups(_bucket_groups(ext, S), S, splat, scatter,
                         (images, fx, fy))


def softsplat_batched(images: jnp.ndarray, flows: jnp.ndarray,
                      metric: Optional[jnp.ndarray] = None,
                      mode: str = "average",
                      max_disp: Optional[int] = None) -> jnp.ndarray:
    """Splat over a leading plane axis (the MPI sample planes in
    `interpolate`): (S, H, W, C) x (S, H, W, 2) -> (S, H, W, C).

    When a plane's flow components are bounded by small integers, that
    plane is splatted with the dense shift decomposition
    (`softsplat_sum_rolls`) instead of a serialized scatter — measured
    ~2 orders of magnitude faster on TPU for MPI interpolation flows
    (which are sub-pixel to a few pixels). The offset ranges come from
    `max_disp` (validated when the flows are concrete), or — outside
    jit, as in the eval CLI's eager per-frame loop — are measured PER
    PLANE AND PER AXIS in one batched probe fetch and bucketed to limit
    recompiles: the term count is the product of the two range widths,
    so one fast-moving plane must not drag the whole stack to a large
    range, and purely horizontal motion doesn't pay for vertical taps.
    Plane groups are padded to power-of-two counts so repeated calls
    reuse shapes. Planes beyond the largest bucket (and traced flows
    without `max_disp`) keep the exact scatter path.
    """
    rolls_ok = metric is None and mode in ("average", "summation")
    concrete = not (isinstance(flows, jax.core.Tracer)
                    or isinstance(images, jax.core.Tracer))

    if max_disp is not None and rolls_ok:
        if concrete and flows.size:
            # caller-contract validation costs one blocking device fetch
            # (~30 ms/call over a tunneled backend); eager hot loops that
            # guarantee the bound themselves can disable it
            if os.environ.get("NSFF_SPLAT_VALIDATE", "1") != "0":
                actual = float(jnp.max(jnp.abs(flows)))
                if actual > max_disp:
                    raise ValueError(
                        f"softsplat_batched: max_disp={max_disp} but "
                        f"max |flow| = {actual:.3f} — the shift "
                        f"decomposition would drop splat mass (see "
                        f"softsplat_sum_rolls)")
            D = int(max_disp)
            return _jit_rolls(mode, (-D, D + 1), (-D, D + 1))(images, flows)
        return _rolls_with_mode(images, flows, mode, max_disp)

    if rolls_ok and concrete and flows.size:
        import numpy as np

        S = images.shape[0]
        # one batched probe fetch for the whole stack: per-plane per-axis
        # flow extrema (the term count is the product of the two range
        # widths, so measuring x and y separately pays off quadratically
        # on directional motion)
        ext = np.asarray(_probe_cl(flows))
        groups = _bucket_groups(ext, S)
        if any(k is not None for k in groups):
            def splat(rx, ry, im, fl):
                return _jit_rolls(mode, rx, ry)(im, fl)

            return _splat_groups(groups, S, splat, _jit_scatter(mode),
                                 (images, flows))
        # every plane over-range: keep the historical vmap scatter

    fn = lambda im, fl: softsplat(im, fl, metric, mode)  # noqa: E731
    return jax.vmap(fn)(images, flows)
