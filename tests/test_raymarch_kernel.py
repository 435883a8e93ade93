"""Planar fused train kernels: forward + VJP vs XLA autodiff (CPU
interpret). The planar op must reproduce `ops/mlp_train_kernel.py`
numerics with xyz assembled in-kernel from (o, d, zs) and dense (N, S)
plane i/o."""
import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.ops.posenc import posenc
from nsff_pl_tpu.ops.raymarch_kernel import (make_planar_nerf_train,
                                             planar_out_keys)

S, NTAU = 16, 16


def _setup(N=5):
    key = jax.random.PRNGKey(0)
    params = M.init_nerf_params(
        key, "fine", use_viewdir=True, encode_appearance=False,
        encode_transient=True, in_channels_t=NTAU, output_flow=True)
    ks = jax.random.split(key, 5)
    o = jax.random.uniform(ks[0], (N, 3), minval=-0.5, maxval=0.5)
    d = jax.random.uniform(ks[1], (N, 3), minval=-0.5, maxval=0.5)
    zs = jnp.sort(jax.random.uniform(ks[2], (N, S)), -1)
    dir_emb = posenc(jax.random.normal(ks[3], (N, 3)), 3.0, 4)
    t_emb = jax.random.normal(ks[4], (N, NTAU))
    return params, o, d, zs, dir_emb, t_emb


def _xyz(o, d, zs):
    return o[:, None, :] + d[:, None, :] * zs[..., None]


def _ref_main(params, o, d, zs, dir_emb, t_emb):
    """XLA reference of the planar main op's plane dict."""
    xyz = _xyz(o, d, zs)
    xe = posenc(xyz, 9.0, 10)
    N = o.shape[0]
    de = jnp.broadcast_to(dir_emb[:, None], (N, S, 27))
    te = jnp.broadcast_to(t_emb[:, None], (N, S, NTAU))
    rgb_s, sig_s = M.static_forward(params, xe, de, None, use_viewdir=True,
                                    compute_dtype=jnp.bfloat16)
    tr = M.transient_forward(params, xe, te, output_flow=("fw", "bw"),
                             compute_dtype=jnp.bfloat16)
    return {
        "srgb_r": rgb_s[..., 0], "srgb_g": rgb_s[..., 1],
        "srgb_b": rgb_s[..., 2], "ssig": sig_s,
        "trgb_r": tr["rgb"][..., 0], "trgb_g": tr["rgb"][..., 1],
        "trgb_b": tr["rgb"][..., 2], "tsig": tr["sigma"],
        "ffw_x": tr["flow_fw"][..., 0], "ffw_y": tr["flow_fw"][..., 1],
        "ffw_z": tr["flow_fw"][..., 2],
        "fbw_x": tr["flow_bw"][..., 0], "fbw_y": tr["flow_bw"][..., 1],
        "fbw_z": tr["flow_bw"][..., 2],
    }


def _ref_warp(params, o, d, zs, flows, t_emb):
    """XLA reference of the planar warp op (transient-only at xyz+flow)."""
    fl = jnp.stack(flows, -1)  # (N, S, 3)
    xe = posenc(_xyz(o, d, zs) + fl, 9.0, 10)
    te = jnp.broadcast_to(t_emb[:, None], (o.shape[0], S, NTAU))
    tr = M.transient_forward(params, xe, te, output_flow=("bw",),
                             compute_dtype=jnp.bfloat16)
    return {"trgb_r": tr["rgb"][..., 0], "trgb_g": tr["rgb"][..., 1],
            "trgb_b": tr["rgb"][..., 2], "tsig": tr["sigma"],
            "fbw_x": tr["flow_bw"][..., 0], "fbw_y": tr["flow_bw"][..., 1],
            "fbw_z": tr["flow_bw"][..., 2]}


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-3)


def _loss_of(out_dict):
    return sum(jnp.sum(jnp.sin(v * (1.3 + 0.2 * i)))
               for i, (k, v) in enumerate(sorted(out_dict.items())))


def test_planar_main_forward():
    params, o, d, zs, dir_emb, t_emb = _setup()
    fn = make_planar_nerf_train(
        S, use_viewdir=True, encode_a=False, encode_t=True,
        output_flow=("fw", "bw"), n_tau=NTAU, block_rows=32,
        bwd_block_rows=32)
    out = fn(params, o, d, zs, None, dir_emb, None, t_emb)
    ref = _ref_main(params, o, d, zs, dir_emb, t_emb)
    assert set(out) == set(ref)
    assert set(out) == set(planar_out_keys(
        static_branch=True, encode_t=True, output_flow=("fw", "bw")))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=6e-3, err_msg=k)


def test_planar_main_grads():
    params, o, d, zs, dir_emb, t_emb = _setup()
    fn = make_planar_nerf_train(
        S, use_viewdir=True, encode_a=False, encode_t=True,
        output_flow=("fw", "bw"), n_tau=NTAU, block_rows=32,
        bwd_block_rows=32)

    gk = jax.grad(lambda p, t: _loss_of(
        fn(p, o, d, zs, None, dir_emb, None, t)), argnums=(0, 1))(
        params, t_emb)
    gr = jax.grad(lambda p, t: _loss_of(
        _ref_main(p, o, d, zs, dir_emb, t)), argnums=(0, 1))(params, t_emb)
    for kname in gr[0]:
        for part in ("w", "b"):
            assert _rel(gr[0][kname][part], gk[0][kname][part]) < 0.2, \
                f"{kname}.{part}"
    assert _rel(gr[1], gk[1]) < 0.2  # dt_emb


def test_planar_warp_forward_and_flow_grad():
    params, o, d, zs, _, t_emb = _setup()
    key = jax.random.PRNGKey(3)
    flows = tuple(0.1 * jax.random.normal(k, zs.shape)
                  for k in jax.random.split(key, 3))
    fn = make_planar_nerf_train(
        S, static_branch=False, flow_in=True, encode_t=True,
        output_flow=("bw",), n_tau=NTAU, block_rows=32, bwd_block_rows=32)
    out = fn(params, o, d, zs, flows, None, None, t_emb)
    ref = _ref_warp(params, o, d, zs, flows, t_emb)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=6e-3, err_msg=k)

    gk = jax.grad(lambda p, fl, t: _loss_of(
        fn(p, o, d, zs, fl, None, None, t)), argnums=(0, 1, 2))(
        params, flows, t_emb)
    gr = jax.grad(lambda p, fl, t: _loss_of(
        _ref_warp(p, o, d, zs, fl, t)), argnums=(0, 1, 2))(
        params, flows, t_emb)
    for kname in gr[0]:
        if not np.asarray(gr[0][kname]["w"]).any():
            continue  # static params: untouched by the transient-only op
        for part in ("w", "b"):
            assert _rel(gr[0][kname][part], gk[0][kname][part]) < 0.2, \
                f"{kname}.{part}"
    for c in range(3):
        assert _rel(gr[1][c], gk[1][c]) < 0.25, f"dflow[{c}]"
    assert _rel(gr[2], gk[2]) < 0.2


def test_planar_ray_padding():
    """N not divisible by the block ray counts: padded rays must not
    pollute gradients or outputs."""
    params, o, d, zs, dir_emb, t_emb = _setup(N=3)
    fn = make_planar_nerf_train(
        S, use_viewdir=True, encode_a=False, encode_t=True,
        output_flow=("fw", "bw"), n_tau=NTAU, block_rows=32,
        bwd_block_rows=32)
    out = fn(params, o, d, zs, None, dir_emb, None, t_emb)
    assert out["ssig"].shape == (3, S)
    g = jax.grad(lambda p: _loss_of(
        fn(p, o, d, zs, None, dir_emb, None, t_emb)))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
