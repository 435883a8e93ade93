"""Capture a jax.profiler trace of the train step at batch 8192 and print
a per-op time table from the xplane proto."""
import sys, time, glob, os
import jax, jax.numpy as jnp
import bench

fused = sys.argv[1] if len(sys.argv) > 1 else "auto"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prof_planar"

import dataclasses
import nsff_pl_tpu.models.rendering as R
orig_build = bench.build
def build(batch_size, n_samples=128, dtype="bfloat16"):
    step, state, rest = orig_build(batch_size, n_samples, dtype)
    return step, state, rest
# patch RenderConfig default via bench build: easier to monkeypatch RenderConfig
_RC = R.RenderConfig
if fused != "auto":
    class RC(_RC):
        pass
    # frozen dataclass: replace default
    R.RenderConfig = lambda **kw: _RC(**{**kw, "fused_train": fused})
    import nsff_pl_tpu.training.step as St
    bench.__dict__  # noqa

step, state, (table, weights, Ks, Ps) = bench.build(8192)
key = jax.random.PRNGKey(0)
state, m, _ = step(state, table, weights, Ks, Ps, key, jnp.asarray(0))
print("warm loss", float(m["loss"]))
t0 = time.perf_counter()
for i in range(30):
    key, k = jax.random.split(key)
    state, m, _ = step(state, table, weights, Ks, Ps, k, jnp.asarray(i % 30))
print("loss", float(m["loss"]), "ms/step", (time.perf_counter()-t0)/30*1000)

jax.profiler.start_trace(outdir)
for i in range(4):
    key, k = jax.random.split(key)
    state, m, _ = step(state, table, weights, Ks, Ps, k, jnp.asarray(i % 30))
float(m["loss"])
jax.profiler.stop_trace()
print("trace ->", outdir)
