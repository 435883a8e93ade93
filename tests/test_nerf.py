"""Model tests: parameter shapes/counts vs the reference topology
(`models/nerf.py:33-116`) and forward-mode behaviors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as M


def _full_params(rng=0):
    return M.init_nerf_params(
        jax.random.PRNGKey(rng), typ="fine", in_channels_xyz=63,
        use_viewdir=True, in_channels_dir=27, encode_appearance=True,
        in_channels_a=48, encode_transient=True, in_channels_t=48,
        output_flow=True)


def test_param_shapes_static_tower():
    p = _full_params()
    assert p["static_xyz_0"]["w"].shape == (63, 256)
    assert p["static_xyz_3"]["w"].shape == (256, 256)
    # skip layer concatenates the xyz embedding (nerf.py:77-78)
    assert p["static_xyz_4"]["w"].shape == (256 + 63, 256)
    assert p["static_xyz_final"]["w"].shape == (256, 256)
    # viewdir conditioning includes appearance (nerf.py:86-87)
    assert p["static_dir"]["w"].shape == (256 + 27 + 48, 256)
    assert p["static_sigma"]["w"].shape == (256, 1)
    assert p["static_rgb"]["w"].shape == (256, 3)


def test_param_shapes_transient_tower():
    p = _full_params()
    assert p["transient_xyz_0"]["w"].shape == (63 + 48, 256)
    assert p["transient_xyz_4"]["w"].shape == (256 + 63 + 48, 256)
    assert p["transient_flow_fw"]["w"].shape == (256, 3)
    assert p["transient_flow_bw"]["w"].shape == (256, 3)


def test_coarse_has_no_appearance_or_flow():
    p = M.init_nerf_params(
        jax.random.PRNGKey(0), typ="coarse", encode_appearance=True,
        encode_transient=True, output_flow=True, use_viewdir=True)
    # coarse never encodes appearance (nerf.py:67) nor flow (nerf.py:112)
    assert p["static_dir"]["w"].shape[0] == 256 + 27
    assert "transient_flow_fw" not in p


def test_static_forward_shapes_and_ranges():
    p = _full_params()
    B = 16
    xyz = jnp.ones((B, 63)) * 0.1
    d = jnp.ones((B, 27)) * 0.2
    a = jnp.ones((B, 48)) * 0.3
    rgb, sigma = M.static_forward(p, xyz, d, a, use_viewdir=True)
    assert rgb.shape == (B, 3) and sigma.shape == (B,)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)

    sig_only = M.static_forward(p, xyz, sigma_only=True, use_viewdir=True)
    np.testing.assert_allclose(np.asarray(sig_only), np.asarray(sigma),
                               atol=1e-6)


def test_transient_forward_flow_heads_bounded():
    p = _full_params()
    out = M.transient_forward(p, jnp.ones((8, 63)), jnp.ones((8, 48)),
                              output_flow=("fw", "bw"), flow_scale=0.2)
    assert set(out) == {"sigma", "rgb", "flow_fw", "flow_bw"}
    # tanh * flow_scale bound (nerf.py:115-116,205-208)
    assert np.all(np.abs(np.asarray(out["flow_fw"])) <= 0.2)
    assert np.all(np.abs(np.asarray(out["flow_bw"])) <= 0.2)


def test_transient_sigma_only_matches_full():
    p = _full_params()
    xyz, t = jnp.ones((4, 63)) * 0.5, jnp.ones((4, 48)) * 0.1
    full = M.transient_forward(p, xyz, t)
    so = M.transient_forward(p, xyz, t, sigma_only=True)
    np.testing.assert_allclose(np.asarray(so["sigma"]),
                               np.asarray(full["sigma"]), atol=1e-6)


def test_viewdir_changes_rgb_not_sigma():
    p = _full_params()
    xyz = jnp.ones((4, 63)) * 0.1
    a = jnp.zeros((4, 48))
    rgb1, sig1 = M.static_forward(p, xyz, jnp.zeros((4, 27)), a,
                                  use_viewdir=True)
    rgb2, sig2 = M.static_forward(p, xyz, jnp.ones((4, 27)), a,
                                  use_viewdir=True)
    np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig2), atol=1e-6)
    assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))


def test_param_count_matches_reference_scale():
    """Full fine model (viewdir+a+t+flow) is the reference's ~1.2M-param
    MLP (SURVEY.md §2); the static-only 8x256 NeRF ~0.6M."""
    p_small = M.init_nerf_params(jax.random.PRNGKey(0), use_viewdir=False,
                                 encode_transient=False)
    n_small = M.param_count(p_small)
    # static tower: 63*256 + 3*256^2 + 319*256 + 3*256^2 + 256^2(final)
    #   + 257 + 256*3+3 biases etc. ~= 592k
    assert 5.5e5 < n_small < 6.5e5
    n_full = M.param_count(_full_params())
    assert 1.0e6 < n_full < 1.5e6


def test_embedding_lookup():
    table = M.init_embedding(jax.random.PRNGKey(0), 30, 48)
    assert table.shape == (30, 48)
    out = M.embedding_lookup(table, jnp.array([0, 5, 29]))
    assert out.shape == (3, 48)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(table[5]))


def test_bfloat16_compute_close_to_fp32():
    p = _full_params()
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (32, 63)) - 0.5
    d = jnp.zeros((32, 27))
    a = jnp.zeros((32, 48))
    rgb32, sig32 = M.static_forward(p, xyz, d, a, use_viewdir=True)
    rgb16, sig16 = M.static_forward(p, xyz, d, a, use_viewdir=True,
                                    compute_dtype=jnp.bfloat16)
    assert np.max(np.abs(np.asarray(rgb32) - np.asarray(rgb16))) < 0.05
