#!/usr/bin/env python
"""Benchmark `interpolate` (MPI space-time frame synthesis) at full
eval scale on TPU: 512x288 image, 128 sample planes, fw+bw average-mode
splats — the measurement behind the interpolation numbers in
docs/ROADMAP.md.

The synthetic render dicts use geometrically consistent sample
positions (xyz = o + d*z on real NDC pixel rays) and z_far-masked
flows, so the per-plane projected optical flows have the same few-pixel
magnitude as real checkpoints and `softsplat_batched` selects the
bounded-displacement shift path (prints the measured max |flow|).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.models.rendering import interpolate
from nsff_pl_tpu.ops import rays as ray_ops

w, h, S = 512, 288, 128
hw = h * w
rng = np.random.RandomState(0)


def mk(shape, lo=0.0, hi=1.0):
    return jnp.asarray(rng.uniform(lo, hi, shape).astype(np.float32))


zs = jnp.broadcast_to(jnp.linspace(0, 1, S), (hw, S))
far = jnp.asarray(np.asarray(zs)[..., None] > 0.95)
K_ = np.array([[500.0 * w / 960, 0, w / 2], [0, 500.0 * w / 960, h / 2],
               [0, 0, 1]], np.float32)
dirs = ray_ops.get_ray_directions(h, w, K_)
o_w, d_w = ray_ops.get_rays(dirs, jnp.eye(3, 4))
o_n, d_n = ray_ops.get_ndc_rays(K_, 1.0, 1.0, o_w, d_w)
res_t = {
    "xyzs_fine": o_n[:, None, :] + d_n[:, None, :] * zs[..., None],
    "zs_fine": zs,
    "transient_flows_fw": jnp.where(far, 0.0, mk((hw, S, 3), -0.01, 0.01)),
    "transient_rgbs_fine": mk((hw, S, 3)),
    "transient_alphas_fine": mk((hw, S), 0, 0.1),
    "static_rgbs_fine": mk((hw, S, 3)),
    "static_alphas_fine": mk((hw, S), 0, 0.1),
}
res_tp1 = dict(res_t)
res_tp1["transient_flows_bw"] = jnp.where(far, 0.0,
                                          mk((hw, S, 3), -0.01, 0.01))
K = jnp.asarray(K_)
c2w = jnp.eye(3, 4)

t0 = time.perf_counter()
rgb, depth = interpolate(res_t, res_tp1, 0.5, K, c2w, (w, h))
s = float(jnp.sum(rgb))
print(f"first call (incl compile): {time.perf_counter() - t0:.2f} s "
      f"(chk {s:.3e})")
t0 = time.perf_counter()
for _ in range(3):
    rgb, depth = interpolate(res_t, res_tp1, 0.5, K, c2w, (w, h))
s = float(jnp.sum(rgb)) + float(jnp.sum(depth))
print(f"steady state: {(time.perf_counter() - t0) / 3:.2f} s/frame "
      f"(chk {s:.3e})")
assert np.isfinite(np.asarray(rgb)).all()

# stage breakdown (each stage forced with a value fetch, so the numbers
# include one tunnel round trip each — the sum exceeds the pipelined
# end-to-end time above)
from nsff_pl_tpu.models.rendering import _interp_post, _interp_pre
from nsff_pl_tpu.ops.softsplat import softsplat_batched_planar

dt = jnp.float32(0.5)
rgba_t = jnp.concatenate([res_t["transient_rgbs_fine"],
                          res_t["transient_alphas_fine"][..., None]], -1)
rgba_tp1 = jnp.concatenate([res_tp1["transient_rgbs_fine"],
                            res_tp1["transient_alphas_fine"][..., None]], -1)

def pre():
    return _interp_pre(
        res_t["xyzs_fine"], res_t["transient_flows_fw"],
        res_tp1["transient_flows_bw"], rgba_t, rgba_tp1, dt, K, c2w,
        w=w, h=h)

pre()  # compile
t0 = time.perf_counter()
planes_cat, fx_cat, fy_cat = pre()
float(jnp.sum(fy_cat))
print(f"  pre: {time.perf_counter() - t0:.3f} s")
t0 = time.perf_counter()
warped = softsplat_batched_planar(planes_cat, fx_cat, fy_cat, "average")
float(jnp.sum(warped))
print(f"  splat (incl probe): {time.perf_counter() - t0:.3f} s")
t0 = time.perf_counter()
rgb2, depth2 = _interp_post(warped, res_t["static_rgbs_fine"],
                            res_t["static_alphas_fine"],
                            res_t["zs_fine"], dt)
float(jnp.sum(rgb2))
print(f"  post: {time.perf_counter() - t0:.3f} s")
