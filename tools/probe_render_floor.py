#!/usr/bin/env python
"""Attribute the test-time render's floor gap (VERDICT r4 #2).

BENCH_r04 measured the 8192-ray render stage at 73.8% of its chain-rate
floor while the train step (scan-dispatched) sits at 94.8%. Hypothesis:
per-dispatch tunnel overhead, not kernel inefficiency — the render stage
dispatches one jitted call per chunk with no in-device batching, the
train stage amortizes dispatch over `scan_steps` lax.scan iterations.

Probes (all on the planar no-grad eval kernel, S=128, transient render,
`models/raymarch.py::render_test_planar` semantics):
  A. per-dispatch loop (the current bench stage)        -> rays/s
  B. lax.scan over G=8 chunk renders inside ONE jit     -> rays/s
  C. one whole-frame dispatch (147,456 rays, no chunks) -> rays/s
If B/C >> A the gap is dispatch overhead and the eval path should render
frames with in-jit chunk scanning; if B ~ A the kernel itself is off
floor and needs a block sweep.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

FLOOR_RPS = 177.8e12 / 0.310e9  # chain rate / test-path GFLOP/ray


def make_inputs(n):
    key = jax.random.PRNGKey(0)
    rays = jnp.concatenate([
        (jax.random.uniform(key, (n, 3)) * 0.5).at[:, 2].set(-1.0),
        (jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 0.1)
        .at[:, 2].set(2.0)], -1)
    return rays, jnp.zeros((n,), jnp.int32)


def main():
    key = jax.random.PRNGKey(0)
    params = {"fine": nerf_m.init_nerf_params(
        key, "fine", use_viewdir=True, encode_transient=True,
        in_channels_t=48, output_flow=True)}
    emb = {"t": nerf_m.init_embedding(key, 30, 48)}
    cfg = RenderConfig(N_samples=128, use_viewdir=True, encode_t=True,
                       max_t=29, compute_dtype="bfloat16")

    def render1(rays, ts):
        return render_rays(params, emb, rays, ts, key, cfg,
                           test_time=True, output_transient=True)["rgb_fine"]

    # --- A: per-dispatch loop, 8192 rays (current bench stage shape)
    n = 8192
    rays, ts = make_inputs(n)
    f = jax.jit(render1)
    out = f(rays, ts)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(rays, ts)
    float(jnp.sum(out))
    a = n * 20 / (time.perf_counter() - t0)
    print(f"A per-dispatch 8192:   {a:,.0f} rays/s "
          f"({100 * a / FLOOR_RPS:.1f}% of floor)", flush=True)

    # --- B: lax.scan over 8 chunk renders inside one jit
    G = 8
    rays_g = jnp.stack([rays] * G)
    ts_g = jnp.stack([ts] * G)

    @jax.jit
    def scan_render(rays_g, ts_g):
        def body(_, rt):
            return None, render1(rt[0], rt[1])
        _, outs = jax.lax.scan(body, None, (rays_g, ts_g))
        return outs

    out = scan_render(rays_g, ts_g)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(4):
        out = scan_render(rays_g, ts_g)
    float(jnp.sum(out))
    b = n * G * 4 / (time.perf_counter() - t0)
    print(f"B scan x{G} in one jit: {b:,.0f} rays/s "
          f"({100 * b / FLOOR_RPS:.1f}% of floor)", flush=True)

    # --- C: one whole-frame dispatch (512x288 rays, no chunking)
    n_f = 512 * 288
    rays_f, ts_f = make_inputs(n_f)
    out = f(rays_f, ts_f)  # re-trace at the new shape
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(8):
        out = f(rays_f, ts_f)
    float(jnp.sum(out))
    c = n_f * 8 / (time.perf_counter() - t0)
    print(f"C whole-frame 147456:  {c:,.0f} rays/s "
          f"({100 * c / FLOOR_RPS:.1f}% of floor)", flush=True)


if __name__ == "__main__":
    main()
