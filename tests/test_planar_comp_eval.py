"""Composited no-grad eval kernel (round-5 render-floor work).

`make_planar_nerf_eval_comp` runs the dual-tower evaluation AND the
volume compositing (`/root/reference/models/rendering.py:202-295` test
semantics) inside one kernel, emitting a per-ray (N, M) maps tile. When
the caller's key filter is a subset of `comp_eval_keys`,
`render_test_planar` routes through it. Every composited key must equal
the plane-path value bit-for-bit-ish (same math, different fusion).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.raymarch import comp_eval_keys
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

S = 16


def _params(n_importance=0):
    params = {"fine": nerf_m.init_nerf_params(
        jax.random.PRNGKey(1), "fine", use_viewdir=True,
        encode_transient=True, in_channels_t=16, output_flow=True)}
    if n_importance > 0:
        params["coarse"] = nerf_m.init_nerf_params(
            jax.random.PRNGKey(3), "coarse", use_viewdir=True,
            encode_transient=True, in_channels_t=16)
    return params


def _rays(n=6):
    rng = np.random.RandomState(0)
    rays = np.zeros((n, 6), np.float32)
    rays[:, 0:2] = rng.rand(n, 2) * 2 - 1
    rays[:, 2] = -1.0
    rays[:, 3:5] = (rng.rand(n, 2) - 0.5) * 0.4
    rays[:, 5] = 2.0
    return jnp.asarray(rays)


def _cfg(**kw):
    base = dict(N_samples=S, use_viewdir=True, encode_t=True, max_t=3,
                N_tau=16, img_wh=(16, 12), mlp_backend="pallas",
                planar_eval="on")
    base.update(kw)
    return RenderConfig(**base)


def _render(keys=None, output_transient=True, flow=(), n_importance=0,
            vis=False, mesh=None, **cfg_kw):
    params = _params(n_importance)
    emb = {"t": nerf_m.init_embedding(jax.random.PRNGKey(2), 4, 16)}
    rays = _rays()
    ts = jnp.array([0, 1, 2, 3, 2, 1])
    kw = {}
    if vis:
        kw["vis_poses"] = jnp.asarray(
            np.eye(3, 4, dtype=np.float32)[None])
        kw["vis_K"] = jnp.asarray(
            np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]], np.float32))
    return render_rays(
        params, emb, rays, ts, jax.random.PRNGKey(0),
        _cfg(N_importance=n_importance, **cfg_kw),
        test_time=True, output_transient=output_transient,
        output_transient_flow=flow, keys=keys, mesh=mesh, **kw)


FULL_KEYS = tuple(sorted(comp_eval_keys(True, ("fw", "bw"))))
VAL_KEYS = ("rgb_fine", "depth_fine", "transient_alpha_fine",
            "_static_rgb_fine", "_static_depth_fine")


def _assert_match(ref, comp, keys, tol=2e-5):
    assert set(comp.keys()) == set(keys)
    for k in keys:
        a, b = np.asarray(ref[k]), np.asarray(comp[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, atol=tol, rtol=1e-4, err_msg=k)


def test_comp_route_full_flow_keys():
    """All composited keys (flows on) equal the plane path."""
    ref = _render(flow=("fw", "bw"))
    comp = _render(keys=FULL_KEYS, flow=("fw", "bw"))
    _assert_match(ref, comp, FULL_KEYS)


def test_comp_route_validation_keys():
    """The trainer's validation key set (no flows) takes the comp route."""
    ref = _render()
    comp = _render(keys=VAL_KEYS)
    _assert_match(ref, comp, VAL_KEYS)


def test_comp_route_static_only():
    """output_transient=False: single-tower composite (the eval CLI's
    default test protocol, `/root/reference/eval.py:61,140`)."""
    ref = _render(output_transient=False)
    comp = _render(keys=("rgb_fine", "depth_fine"), output_transient=False)
    _assert_match(ref, comp, ("rgb_fine", "depth_fine"))


def test_comp_route_visibility_culling():
    """vis_poses culling (`rendering.py:191-200`) applies in-kernel."""
    ref = _render(vis=True)
    comp = _render(keys=VAL_KEYS, vis=True)
    _assert_match(ref, comp, VAL_KEYS)
    # culling must actually change something vs no-vis (sanity that the
    # vis plane is not trivially all-visible for this camera)
    no_vis = _render(keys=VAL_KEYS)
    assert not np.allclose(np.asarray(no_vis["rgb_fine"]),
                           np.asarray(comp["rgb_fine"]))


def test_comp_route_coarse_to_fine():
    """N_importance > 0: the fine pass composites in-kernel on the
    externally sorted zs plane (`rendering.py:326-348`)."""
    ref = _render(flow=("fw", "bw"), n_importance=4)
    comp = _render(keys=FULL_KEYS, flow=("fw", "bw"), n_importance=4)
    _assert_match(ref, comp, FULL_KEYS)


def test_ineligible_keys_fall_back_to_planes():
    """A key outside `comp_eval_keys` (per-sample planes) keeps the
    plane path — same values, plane keys present."""
    keys = ("rgb_fine", "weights_fine")
    ref = _render(flow=("fw", "bw"))
    out = _render(keys=keys, flow=("fw", "bw"))
    assert set(out.keys()) == set(keys)
    for k in keys:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(out[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_comp_route_planar_compositing_off_gate():
    """planar_compositing='off' disables the comp route (escape hatch)."""
    out = _render(keys=VAL_KEYS, planar_compositing="off")
    ref = _render()
    _assert_match(ref, out, VAL_KEYS)


@pytest.mark.parametrize("n_dev", [2])
def test_comp_route_under_mesh(n_dev):
    """shard_map'ed comp op == unsharded (rays shard, weights replicate)."""
    from nsff_pl_tpu.parallel import make_mesh

    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(n_dev)
    ref = _render(keys=VAL_KEYS)
    out = _render(keys=VAL_KEYS, mesh=mesh)
    _assert_match(ref, out, VAL_KEYS, tol=5e-5)
