"""Trainable fused kernel: Pallas backward vs autodiff (CPU interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.ops.mlp_train_kernel import make_fused_nerf_train
from nsff_pl_tpu.ops.posenc import posenc


def _setup(N=5, S=16, n_tau=16):
    key = jax.random.PRNGKey(0)
    params = M.init_nerf_params(
        key, "fine", use_viewdir=True, encode_appearance=False,
        encode_transient=True, in_channels_t=n_tau, output_flow=True)
    xyz = jax.random.uniform(key, (N, S, 3), minval=-0.8, maxval=0.8)
    dir_emb = posenc(jax.random.normal(key, (N, 3)), 3.0, 4)
    t_emb = jax.random.normal(jax.random.PRNGKey(7), (N, n_tau))
    return params, xyz, dir_emb, t_emb


def _ref_packed(params, xyz, dir_emb, t_emb):
    N, S = xyz.shape[:2]
    xe = posenc(xyz, 9.0, 10)
    de = jnp.broadcast_to(dir_emb[:, None], (N, S, 27))
    te = jnp.broadcast_to(t_emb[:, None], (N, S, t_emb.shape[-1]))
    rgb_s, sig_s = M.static_forward(params, xe, de, None, use_viewdir=True,
                                    compute_dtype=jnp.bfloat16)
    tr = M.transient_forward(params, xe, te, output_flow=("fw", "bw"),
                             compute_dtype=jnp.bfloat16)
    return jnp.concatenate(
        [rgb_s, sig_s[..., None], tr["rgb"], tr["sigma"][..., None],
         tr["flow_fw"], tr["flow_bw"], jnp.zeros((N, S, 2))], -1)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-3)


def test_train_kernel_forward_matches():
    params, xyz, dir_emb, t_emb = _setup()
    ft = make_fused_nerf_train(16, use_viewdir=True, encode_a=False,
                               encode_t=True, output_flow=("fw", "bw"),
                               n_tau=16, block_rows=32, bwd_block_rows=32)
    out = ft(params, xyz, dir_emb, None, t_emb)
    ref = _ref_packed(params, xyz, dir_emb, t_emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_train_kernel_grads_match_autodiff():
    """Param/xyz/t-embedding grads within bf16 noise of XLA autodiff
    (measured closer to f32 ground truth than XLA's own bf16 grads)."""
    params, xyz, dir_emb, t_emb = _setup()
    ft = make_fused_nerf_train(16, use_viewdir=True, encode_a=False,
                               encode_t=True, output_flow=("fw", "bw"),
                               n_tau=16, block_rows=32, bwd_block_rows=32)

    def ker_loss(p, x, d, t):
        return jnp.sum(jnp.sin(ft(p, x, d, None, t) * 1.7))

    def ref_loss(p, x, d, t):
        return jnp.sum(jnp.sin(_ref_packed(p, x, d, t) * 1.7))

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 3))(params, xyz, dir_emb,
                                                  t_emb)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 3))(params, xyz, dir_emb,
                                                  t_emb)
    for kname in g_ref[0]:
        for part in ("w", "b"):
            assert _rel(g_ref[0][kname][part], g_ker[0][kname][part]) < 0.2, \
                f"{kname}.{part}"
    assert _rel(g_ref[1], g_ker[1]) < 0.25  # dxyz
    assert _rel(g_ref[2], g_ker[2]) < 0.2  # dt_emb


def test_train_kernel_row_padding():
    """N*S not divisible by the bwd block exercises row padding; padded
    rows must contribute zero gradient."""
    params, xyz, dir_emb, t_emb = _setup(N=3, S=16)
    ft = make_fused_nerf_train(16, use_viewdir=True, encode_a=False,
                               encode_t=True, output_flow=("fw", "bw"),
                               n_tau=16, block_rows=32, bwd_block_rows=32)
    g = jax.grad(lambda p: jnp.sum(ft(p, xyz, dir_emb, None, t_emb)))(params)
    assert np.isfinite(np.asarray(g["static_xyz_0"]["w"])).all()
