"""Planar test-time render path (models/raymarch.py::render_test_planar).

The no-grad eval counterpart of the planar train path: one dual-tower
evaluation per sample on the planar fused kernel, visibility culling and
all composite maps on dense (N, S) planes. Must equal the XLA reference
path key-for-key (`/root/reference/models/rendering.py:148-300` test
semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

S = 16


def _params():
    return nerf_m.init_nerf_params(
        jax.random.PRNGKey(1), "fine", use_viewdir=True,
        encode_transient=True, in_channels_t=16, output_flow=True)


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
                N_tau=16, img_wh=(16, 12))
    base.update(kw)
    return RenderConfig(**base)


def _render(backend, planar_eval, n_importance=0, **kw):
    params = {"fine": _params()}
    if n_importance > 0:
        params["coarse"] = nerf_m.init_nerf_params(
            jax.random.PRNGKey(3), "coarse", use_viewdir=True,
            encode_transient=True, in_channels_t=16)
    emb = {"t": nerf_m.init_embedding(jax.random.PRNGKey(2), 4, 16)}
    rays = _rays()
    ts = jnp.array([0, 1, 2, 3, 2, 1])
    return render_rays(
        params, emb, rays, ts, jax.random.PRNGKey(0),
        _cfg(mlp_backend=backend, planar_eval=planar_eval,
             N_importance=n_importance),
        test_time=True, output_transient=True, **kw)


# every key the packed test path produces at flow=('fw','bw'); the planar
# path must produce the same set (result-key contract: the eval /
# interpolate layers rely on it)
FLOW_KEYS = (
    "zs_fine", "xyzs_fine", "static_rgbs_fine", "transient_rgbs_fine",
    "transient_flows_fw", "transient_flows_bw", "static_sigmas_fine",
    "transient_sigmas_fine", "static_alphas_fine", "transient_alphas_fine",
    "static_weights_fine", "transient_weights_fine", "weights_fine",
    "rgb_fine", "depth_fine", "transient_alpha_fine", "transient_rgb_fine",
    "_static_rgb_fine", "_static_depth_fine", "xyz_fine",
    "transient_flow_fw", "transient_flow_bw", "xyz_fw", "xyz_bw",
)


def test_planar_eval_matches_xla_all_keys():
    """Planar test path == XLA path on every shared result key (flows
    requested, as the interpolation split does)."""
    out_x = _render("xla", "off", output_transient_flow=("fw", "bw"))
    out_p = _render("pallas", "auto", output_transient_flow=("fw", "bw"))
    for k in FLOW_KEYS:
        assert k in out_p, k
        assert out_p[k].shape == out_x[k].shape, k
        # the planar kernel computes in bf16 (f32 accum) — bf16-level
        # tolerances, as in tests/test_planar_path.py
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)


def test_planar_eval_fused_compositing_matches():
    """The fused-compositor eval epilogue (planar_compositing='on';
    round-5 render-floor work) must equal the XLA epilogue on every key —
    same contract as the train path's compositor equivalence
    (tests/test_planar_path.py)."""
    params = {"fine": _params()}
    emb = {"t": nerf_m.init_embedding(jax.random.PRNGKey(2), 4, 16)}
    rays, ts = _rays(), jnp.array([0, 1, 2, 3, 2, 1])
    outs = {}
    for pc in ("off", "on"):
        outs[pc] = render_rays(
            params, emb, rays, ts, jax.random.PRNGKey(0),
            _cfg(mlp_backend="pallas", planar_eval="on",
                 planar_compositing=pc),
            test_time=True, output_transient=True,
            output_transient_flow=("fw", "bw"))
    for k in outs["off"]:
        np.testing.assert_allclose(
            np.asarray(outs["on"][k], np.float32),
            np.asarray(outs["off"][k], np.float32), rtol=1e-5, atol=1e-6,
            err_msg=k)


COARSE_KEYS = (
    "zs_coarse", "xyzs_coarse", "static_sigmas_coarse",
    "transient_sigmas_coarse", "static_alphas_coarse",
    "transient_alphas_coarse", "static_weights_coarse",
    "transient_weights_coarse", "weights_coarse",
    "static_zs_fine", "transient_zs_fine",
)


def test_planar_eval_c2f_matches_xla_all_keys():
    """Coarse-to-fine at test time (`rendering.py:151-162,326-348`): the
    planar path's coarse composite, deterministic PDF draws, and fine pass
    over the sorted union must equal the packed path key-for-key —
    including the coarse result keys and the pdf-draw keys. The coarse
    key SET must also match exactly (the packed coarse pass is
    sigma-only: no *_rgbs_coarse on either path)."""
    out_x = _render("xla", "off", n_importance=4,
                    output_transient_flow=("fw", "bw"))
    out_p = _render("pallas", "auto", n_importance=4,
                    output_transient_flow=("fw", "bw"))
    assert "static_rgbs_coarse" not in out_x
    assert "static_rgbs_coarse" not in out_p
    for k in COARSE_KEYS + FLOW_KEYS:
        assert k in out_p, k
        assert out_p[k].shape == out_x[k].shape, k
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)
    # the fine pass really ran over S + 2*N_importance sorted samples
    assert out_p["zs_fine"].shape == (6, S + 8)
    assert bool(jnp.all(jnp.diff(out_p["zs_fine"], axis=-1) >= 0))


def test_planar_eval_c2f_visibility_culls_coarse():
    """Test-time culling applies to the COARSE transient sigmas too
    (`rendering.py:191-200` runs inside every inference pass), steering
    the transient pdf draws identically on both paths."""
    vis_poses = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    vis_K = jnp.asarray(np.array([[20.0, 0, 8], [0, 20, 6], [0, 0, 1]],
                                 np.float32))
    kw = dict(n_importance=4, output_transient_flow=(),
              vis_poses=vis_poses, vis_K=vis_K)
    out_x = _render("xla", "off", **kw)
    out_p = _render("pallas", "auto", **kw)
    assert float(jnp.min(out_x["transient_sigmas_coarse"])) < 1e-4
    for k in ("transient_sigmas_coarse", "transient_zs_fine", "rgb_fine",
              "depth_fine"):
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)


def test_planar_eval_visibility_culling_matches():
    """Culling (`rendering.py:191-200`) on (N, S) component planes equals
    the packed path's point-list `compute_world_visibility`."""
    vis_poses = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    vis_K = jnp.asarray(np.array([[20.0, 0, 8], [0, 20, 6], [0, 0, 1]],
                                 np.float32))
    kw = dict(output_transient_flow=(), vis_poses=vis_poses, vis_K=vis_K)
    out_x = _render("xla", "off", **kw)
    out_p = _render("pallas", "auto", **kw)
    # culling must actually bite for this to be a real check
    assert float(jnp.min(out_x["transient_sigmas_fine"])) < 1e-4
    for k in ("rgb_fine", "depth_fine", "transient_alpha_fine",
              "transient_sigmas_fine"):
        # the planar kernel computes in bf16 (f32 accum) — bf16-level
        # tolerances, as in tests/test_planar_path.py
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)


def test_planar_eval_view_dir_override():
    """`view_dir` (eval.py --fix_view_dir) changes rgb but not depth, and
    matches the XLA path with the same override."""
    vd = jnp.tile(jnp.array([[0.3, 0.1, 1.0]]), (6, 1))
    out_p0 = _render("pallas", "auto", output_transient_flow=())
    out_pv = _render("pallas", "auto", output_transient_flow=(), view_dir=vd)
    out_xv = _render("xla", "off", output_transient_flow=(), view_dir=vd)
    assert not np.allclose(np.asarray(out_pv["rgb_fine"]),
                           np.asarray(out_p0["rgb_fine"]))
    np.testing.assert_allclose(np.asarray(out_pv["depth_fine"]),
                               np.asarray(out_p0["depth_fine"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_pv["rgb_fine"]),
                               np.asarray(out_xv["rgb_fine"]), atol=6e-3)


STATIC_ONLY_KEYS = (
    "zs_fine", "xyzs_fine", "static_rgbs_fine", "static_sigmas_fine",
    "static_weights_fine", "rgb_fine", "depth_fine",
)


def _render_static(backend, planar_eval, n_importance=0, **kw):
    """output_transient=False — the eval CLI's default test protocol
    (`/root/reference/eval.py:61,140`): static tower only."""
    params = {"fine": _params()}
    if n_importance > 0:
        params["coarse"] = nerf_m.init_nerf_params(
            jax.random.PRNGKey(3), "coarse", use_viewdir=True,
            encode_transient=True, in_channels_t=16)
    emb = {"t": nerf_m.init_embedding(jax.random.PRNGKey(2), 4, 16)}
    return render_rays(
        params, emb, _rays(), jnp.array([0, 1, 2, 3, 2, 1]),
        jax.random.PRNGKey(0),
        _cfg(mlp_backend=backend, planar_eval=planar_eval,
             N_importance=n_importance),
        test_time=True, output_transient=False, **kw)


def test_planar_eval_static_only_matches_xla():
    """The planar test path serves output_transient=False renders with a
    single-field composite, key-set-exact vs the packed path (which emits
    static_weights_fine = weights and NO transient/weights_fine keys for
    this protocol)."""
    out_x = _render_static("xla", "off")
    out_p = _render_static("pallas", "auto")
    assert set(out_p) == set(out_x)
    for k in STATIC_ONLY_KEYS:
        assert out_p[k].shape == out_x[k].shape, k
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)


def test_planar_eval_static_only_c2f_matches_xla():
    """Static-only coarse-to-fine: the coarse pass composites one field,
    draws ONE importance set (static only — `rendering.py:326-339` with
    output_transient=False), and the fine pass runs S + N_importance
    sorted samples. Key set and values match the packed path."""
    out_x = _render_static("xla", "off", n_importance=4)
    out_p = _render_static("pallas", "auto", n_importance=4)
    assert set(out_p) == set(out_x)
    assert "transient_zs_fine" not in out_p
    assert out_p["zs_fine"].shape == (6, S + 4)
    assert bool(jnp.all(jnp.diff(out_p["zs_fine"], axis=-1) >= 0))
    for k in STATIC_ONLY_KEYS + ("zs_coarse", "static_sigmas_coarse",
                                 "static_weights_coarse", "static_zs_fine"):
        assert out_p[k].shape == out_x[k].shape, k
        np.testing.assert_allclose(
            np.asarray(out_p[k], np.float32),
            np.asarray(out_x[k], np.float32), rtol=2e-2, atol=6e-3,
            err_msg=k)


def test_planar_eval_off_gate():
    """planar_eval='off' keeps the packed path (its extra raw keys are
    present; the planar path emits no packed-only intermediates)."""
    out_off = _render("pallas", "off", output_transient_flow=())
    out_on = _render("pallas", "auto", output_transient_flow=())
    # same user-facing maps either way
    np.testing.assert_allclose(np.asarray(out_on["rgb_fine"]),
                               np.asarray(out_off["rgb_fine"]), atol=6e-3)
    with pytest.raises(ValueError):
        _render("pallas", "bogus", output_transient_flow=())
