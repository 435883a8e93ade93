"""Fused Pallas NeRF kernel vs the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
from nsff_pl_tpu.ops.mlp_kernel import make_fused_nerf_eval, unpack_fused
from nsff_pl_tpu.ops.posenc import posenc


def _params(**kw):
    base = dict(use_viewdir=True, encode_appearance=False,
                encode_transient=True, in_channels_t=16, output_flow=True)
    base.update(kw)
    return M.init_nerf_params(jax.random.PRNGKey(0), "fine", **base)


def test_fused_matches_xla_full():
    params = _params()
    N, S = 6, 16
    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (N, S, 3), minval=-0.8, maxval=0.8)
    dir_emb = posenc(jax.random.normal(key, (N, 3)), 3.0, 4)
    t_emb = jax.random.normal(key, (N, 16))

    fused = make_fused_nerf_eval(S, use_viewdir=True, encode_a=False,
                                 encode_t=True, output_flow=("fw", "bw"),
                                 n_tau=16, block_rows=64)
    res = unpack_fused(fused(params, xyz, dir_emb=dir_emb, t_emb=t_emb),
                       encode_t=True, output_flow=("fw", "bw"))

    xe = posenc(xyz, 9.0, 10)
    de = jnp.broadcast_to(dir_emb[:, None], (N, S, 27))
    te = jnp.broadcast_to(t_emb[:, None], (N, S, 16))
    rgb_s, sig_s = M.static_forward(params, xe, de, None, use_viewdir=True,
                                    compute_dtype=jnp.bfloat16)
    tr = M.transient_forward(params, xe, te, output_flow=("fw", "bw"),
                             compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(res["static_rgbs"]),
                               np.asarray(rgb_s), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["static_sigmas_raw"]),
                               np.asarray(sig_s), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res["transient_flows_fw"]),
                               np.asarray(tr["flow_fw"]), atol=2e-3)


def test_fused_static_only():
    params = M.init_nerf_params(jax.random.PRNGKey(0), "fine",
                                use_viewdir=False, encode_transient=False)
    N, S = 4, 8
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (N, S, 3))
    fused = make_fused_nerf_eval(S, use_viewdir=False, encode_a=False,
                                 encode_t=False, output_flow=(),
                                 block_rows=32)
    out = fused(params, xyz)
    res = unpack_fused(out, encode_t=False, output_flow=())
    rgb, sig = M.static_forward(params, posenc(xyz, 9.0, 10),
                                use_viewdir=False,
                                compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(res["static_rgbs"]),
                               np.asarray(rgb), atol=2e-3)


def test_fused_padding_path():
    """N not divisible by rays_per_block exercises the row padding."""
    params = _params()
    S = 8
    fused = make_fused_nerf_eval(S, use_viewdir=True, encode_a=False,
                                 encode_t=True, output_flow=(),
                                 n_tau=16, block_rows=4 * S)
    for N in (3, 5, 9):
        xyz = jax.random.uniform(jax.random.PRNGKey(N), (N, S, 3))
        dir_emb = posenc(jnp.ones((N, 3)), 3.0, 4)
        t_emb = jnp.ones((N, 16))
        out = fused(params, xyz, dir_emb=dir_emb, t_emb=t_emb)
        assert out.shape == (N, S, 16)


def test_render_rays_pallas_backend_matches_xla():
    """End-to-end: test-time render with mlp_backend='pallas' equals the
    XLA render (both evaluate in bf16)."""
    params = {"fine": _params()}
    emb = {"t": M.init_embedding(jax.random.PRNGKey(2), 4, 16)}
    rays = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(3), (5, 3), minval=-0.3,
                           maxval=0.3).at[:, 2].set(-1.0),
        jnp.tile(jnp.array([[0.05, -0.02, 2.0]]), (5, 1))], -1)
    ts = jnp.array([0, 1, 2, 3, 2])
    kw = dict(N_samples=16, use_viewdir=True, encode_t=True, max_t=3,
              N_tau=16, compute_dtype="bfloat16")
    out_x = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0),
                        RenderConfig(mlp_backend="xla", **kw),
                        test_time=True, output_transient=True,
                        output_transient_flow=("fw", "bw"))
    out_p = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0),
                        RenderConfig(mlp_backend="pallas", **kw),
                        test_time=True, output_transient=True,
                        output_transient_flow=("fw", "bw"))
    for k in ("rgb_fine", "depth_fine", "transient_alpha_fine"):
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   atol=3e-3)
