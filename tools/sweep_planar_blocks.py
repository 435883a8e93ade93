"""Sweep planar-kernel block sizes + isolate bridge costs on TPU.

Usage: python tools/sweep_planar_blocks.py [S] [N]
S=256 covers the coarse-to-fine fine pass (N_samples=128 + 2*64 draws,
`/root/reference/models/rendering.py:326-348` semantics); the block
candidates scale so the rays-per-block counts match the S=128 sweep."""
import sys, time, itertools
import jax, jax.numpy as jnp
from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.ops.posenc import posenc
from nsff_pl_tpu.ops.raymarch_kernel import make_planar_nerf_train
from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")
S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
SCALE = S // 128  # keep rays/block comparable across S
key = jax.random.PRNGKey(0)
params = M.init_nerf_params(key, "fine", use_viewdir=True,
    encode_appearance=False, encode_transient=True, in_channels_t=48,
    output_flow=True)
ks = jax.random.split(key, 6)
o = jax.random.uniform(ks[0], (N,3), minval=-0.5, maxval=0.5)
d = jax.random.uniform(ks[1], (N,3), minval=-0.5, maxval=0.5)
zs = jnp.sort(jax.random.uniform(ks[2], (N,S)), -1)
de = posenc(jax.random.normal(ks[3], (N,3)), 3.0, 4)
te = jax.random.normal(ks[4], (N,48))
fl = tuple(0.05*jax.random.normal(k, (N,S)) for k in jax.random.split(ks[5],3))

def tm(f, *args, iters=20):
    out = f(*args)
    s = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    s = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
    return (time.perf_counter()-t0)/iters*1000

def main_gfn(fn):
    return jax.jit(lambda p: jax.grad(lambda p_: sum(jnp.sum(jnp.sin(v))
        for v in fn(p_, o, d, zs, None, de, None, te).values()))(p))

def warp_gfn(fn):
    return jax.jit(lambda p: jax.grad(lambda p_: sum(jnp.sum(jnp.sin(v))
        for v in fn(p_, o, d, zs, fl, None, None, te).values()))(p))

print(f"== main op (S={S}, N={N}): fwd blk x bwd blk ==", flush=True)
for fb, bb in itertools.product(
        (2048 * SCALE, 4096 * SCALE), (1024 * SCALE, 2048 * SCALE,
                                       4096 * SCALE)):
    fn = make_planar_nerf_train(S, use_viewdir=True, encode_a=False,
        encode_t=True, output_flow=("fw","bw"), block_rows=fb,
        bwd_block_rows=bb)
    try:
        t_f = tm(jax.jit(lambda p: fn(p, o, d, zs, None, de, None, te)), params)
        t_g = tm(main_gfn(fn), params)
        print(f"fwd_blk={fb} bwd_blk={bb}: fwd {t_f:.2f} ms, fwd+bwd {t_g:.2f} ms", flush=True)
    except Exception as ex:
        print(f"fwd_blk={fb} bwd_blk={bb}: FAIL {str(ex)[:80]}", flush=True)

print("== warp op ==", flush=True)
for fb, bb in itertools.product(
        (2048 * SCALE, 4096 * SCALE), (1024 * SCALE, 2048 * SCALE)):
    fn = make_planar_nerf_train(S, static_branch=False, flow_in=True,
        encode_t=True, output_flow=("bw",), block_rows=fb, bwd_block_rows=bb)
    try:
        t_f = tm(jax.jit(lambda p: fn(p, o, d, zs, fl, None, None, te)), params)
        t_g = tm(warp_gfn(fn), params)
        print(f"fwd_blk={fb} bwd_blk={bb}: fwd {t_f:.2f} ms, fwd+bwd {t_g:.2f} ms", flush=True)
    except Exception as ex:
        print(f"fwd_blk={fb} bwd_blk={bb}: FAIL {str(ex)[:80]}", flush=True)
