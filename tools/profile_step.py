"""Capture a jax.profiler trace of the train step and print wall timing.

Usage: python tools/profile_step.py [fused_train] [outdir] [batch_size]
    fused_train: auto | on | off   (default auto)
    outdir:      trace directory   (default /tmp/prof_planar)
    batch_size:  rays per step     (default 8192)
"""
import sys
import time

import jax
import jax.numpy as jnp

import bench

fused = sys.argv[1] if len(sys.argv) > 1 else "auto"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prof_planar"
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

step, state, (table, weights, Ks, Ps) = bench.build(batch, fused_train=fused)
key = jax.random.PRNGKey(0)
state, m, _ = step(state, table, weights, Ks, Ps, key, jnp.asarray(0))
print("warm loss", float(m["loss"]))
t0 = time.perf_counter()
for i in range(30):
    key, k = jax.random.split(key)
    state, m, _ = step(state, table, weights, Ks, Ps, k, jnp.asarray(i % 30))
print("loss", float(m["loss"]),
      "ms/step", (time.perf_counter() - t0) / 30 * 1000)

jax.profiler.start_trace(outdir)
for i in range(4):
    key, k = jax.random.split(key)
    state, m, _ = step(state, table, weights, Ks, Ps, k, jnp.asarray(i % 30))
float(m["loss"])
jax.profiler.stop_trace()
print("trace ->", outdir)
