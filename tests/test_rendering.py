"""Renderer behavior tests (`models/rendering.py:52-362` semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.models.rendering import (RenderConfig, interpolate,
                                          render_rays)


def _setup(encode_t=True, N_importance=0, N_samples=8, n_frames=4):
    key = jax.random.PRNGKey(0)
    kw = dict(use_viewdir=True, encode_appearance=False,
              encode_transient=encode_t, in_channels_t=16,
              output_flow=encode_t)
    params = {"fine": M.init_nerf_params(key, "fine", **kw)}
    if N_importance > 0:
        params["coarse"] = M.init_nerf_params(
            key, "coarse", use_viewdir=True, encode_transient=encode_t,
            in_channels_t=16)
    emb = {"t": M.init_embedding(key, n_frames, 16)} if encode_t else {}
    cfg = RenderConfig(N_samples=N_samples, N_importance=N_importance,
                       use_viewdir=True, encode_t=encode_t,
                       max_t=n_frames - 1, img_wh=(16, 12))
    rays = jnp.concatenate([
        jax.random.uniform(key, (6, 3), minval=-0.5, maxval=0.5)
        .at[:, 2].set(-1.0),
        jax.random.uniform(jax.random.PRNGKey(1), (6, 3), minval=-0.2,
                           maxval=0.2).at[:, 2].set(2.0)], -1)
    ts = jnp.array([0, 1, 2, 3, 1, 2])
    return params, emb, rays, ts, cfg


def test_weights_sum_at_most_one():
    params, emb, rays, ts, cfg = _setup()
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      output_transient=True,
                      output_transient_flow=("fw", "bw", "disocc"))
    w = np.asarray(out["weights_fine"])
    assert np.all(w.sum(-1) <= 1 + 1e-5)
    assert np.all(w >= 0)
    # static + transient weights == combined weights? no — but each <= w sum
    sw = np.asarray(out["static_weights_fine"])
    tw = np.asarray(out["transient_weights_fine"])
    assert np.all(sw.sum(-1) <= 1 + 1e-5)
    assert np.all(tw.sum(-1) <= 1 + 1e-5)


def test_rgb_bounded():
    params, emb, rays, ts, cfg = _setup()
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      output_transient=True,
                      output_transient_flow=("fw", "bw", "disocc"))
    for k in ("rgb_fine", "rgb_fw", "rgb_bw", "_static_rgb_fine"):
        v = np.asarray(out[k])
        assert np.all(v >= -1e-5) and np.all(v <= 1 + 1e-5), k


def test_test_time_deterministic():
    """test_time disables perturb + noise (train.py:113-114): two different
    rng keys must give identical renders."""
    params, emb, rays, ts, cfg = _setup()
    o1 = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                     test_time=True, output_transient=True)
    o2 = render_rays(params, emb, rays, ts, jax.random.PRNGKey(7), cfg,
                     test_time=True, output_transient=True)
    np.testing.assert_allclose(np.asarray(o1["rgb_fine"]),
                               np.asarray(o2["rgb_fine"]), atol=1e-6)


def test_train_time_stochastic():
    params, emb, rays, ts, cfg = _setup()
    o1 = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                     output_transient=True)
    o2 = render_rays(params, emb, rays, ts, jax.random.PRNGKey(7), cfg,
                     output_transient=True)
    assert not np.allclose(np.asarray(o1["rgb_fine"]),
                           np.asarray(o2["rgb_fine"]))


def test_flow_zeroed_beyond_zfar():
    """transient flows are zeroed where z > 0.95 (`rendering.py:187-188`)."""
    params, emb, rays, ts, cfg = _setup(N_samples=64)
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      test_time=True, output_transient=True,
                      output_transient_flow=("fw", "bw"))
    zs = np.asarray(out["zs_fine"])
    flows = np.asarray(out["transient_flows_fw"])
    far = zs > 0.95
    assert far.any()
    np.testing.assert_allclose(flows[far], 0.0)
    near = ~far
    assert np.abs(flows[near]).max() > 0


def test_importance_sampling_shapes():
    params, emb, rays, ts, cfg = _setup(N_importance=4, N_samples=8)
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      test_time=True, output_transient=True)
    # fine samples = N_samples + N_importance (static) + N_importance
    # (transient) (`rendering.py:335-348`)
    assert out["zs_fine"].shape == (6, 8 + 4 + 4)
    assert out["zs_coarse"].shape == (6, 8)
    assert "static_zs_fine" in out and "transient_zs_fine" in out
    # zs sorted
    zs = np.asarray(out["zs_fine"])
    assert np.all(np.diff(zs, axis=-1) >= 0)


def test_visibility_culling_kills_transient():
    """Points invisible from all training cameras get transient sigma -10
    (`rendering.py:191-200`): transient alpha ~ 0."""
    params, emb, rays, ts, cfg = _setup()
    # NDC samples map to world z <= -1 (ndc2world); a camera at z = -1e6
    # looking down -z has the whole scene BEHIND it -> nothing visible
    pose_away = jnp.asarray(
        np.concatenate([np.eye(3), np.array([[0.0], [0.0], [-1e6]])], 1))[None]
    K = jnp.asarray(np.array([[100.0, 0, 8], [0, 100, 6], [0, 0, 1]],
                             np.float32))
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      test_time=True, output_transient=True,
                      vis_poses=pose_away, vis_K=K)
    assert float(jnp.max(out["transient_alpha_fine"])) < 1e-2

    out2 = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                       test_time=True, output_transient=True)
    assert float(jnp.max(out2["transient_alpha_fine"])) > \
        float(jnp.max(out["transient_alpha_fine"]))


def test_static_only_mode():
    params, emb, rays, _, cfg = _setup(encode_t=False)
    out = render_rays(params, {}, rays, None, jax.random.PRNGKey(0), cfg,
                      output_transient=False)
    assert "transient_rgbs_fine" not in out
    assert "rgb_fine" in out and "depth_fine" in out


def test_disocc_in_unit_range():
    params, emb, rays, ts, cfg = _setup()
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                      output_transient=True,
                      output_transient_flow=("fw", "bw", "disocc"))
    for k in ("disocc_fw", "disocc_bw", "disoccs_fw", "disoccs_bw"):
        v = np.asarray(out[k])
        assert np.all(v <= 1.0 + 1e-6) and np.all(v >= -1.0)


def test_interpolate_shapes_and_consistency():
    """interpolate() produces a finite (h, w, 3) image; with zero scene
    flow the warped planes equal the originals, so dt has no effect."""
    w, h = 16, 12
    params, emb, _, _, cfg = _setup(N_samples=8)
    cfg2 = RenderConfig(**{**cfg.__dict__, "img_wh": (w, h)})
    # full-image rays
    rays = jnp.concatenate([
        jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (w * h, 1)),
        jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (w * h, 1))], -1)
    ts = jnp.ones((w * h,), jnp.int32)
    out = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg2,
                      test_time=True, output_transient=True,
                      output_transient_flow=("fw", "bw"))
    out = dict(out)
    K = jnp.asarray(np.array([[20.0, 0, 8], [0, 20, 6], [0, 0, 1]],
                             np.float32))
    c2w = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1))

    rgb, depth = interpolate(out, out, 0.5, K, c2w, (w, h))
    assert rgb.shape == (h, w, 3) and depth.shape == (h, w)
    assert np.isfinite(np.asarray(rgb)).all()

    # zero flow -> interpolation is dt-independent
    zero = dict(out)
    zero["transient_flows_fw"] = jnp.zeros_like(out["transient_flows_fw"])
    zero["transient_flows_bw"] = jnp.zeros_like(out["transient_flows_bw"])
    r1, _ = interpolate(zero, zero, 0.25, K, c2w, (w, h))
    r2, _ = interpolate(zero, zero, 0.75, K, c2w, (w, h))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_view_dir_override():
    """`view_dir` replaces only the direction fed to the view-dependence
    embedding (`rendering.py:308` kwargs['view_dir']): passing rays_d is
    an identity, and a different direction changes rgb but NOT depth
    (sigmas are computed before the dir conditioning)."""
    params, emb, rays, ts, cfg = _setup()
    base = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                       test_time=True, output_transient=True)
    same = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                       test_time=True, output_transient=True,
                       view_dir=rays[:, 3:6])
    np.testing.assert_allclose(np.asarray(base["rgb_fine"]),
                               np.asarray(same["rgb_fine"]), atol=1e-6)
    other_dir = jnp.tile(jnp.array([[0.3, -0.2, 1.5]]), (rays.shape[0], 1))
    other = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                        test_time=True, output_transient=True,
                        view_dir=other_dir)
    assert not np.allclose(np.asarray(base["rgb_fine"]),
                           np.asarray(other["rgb_fine"]))
    np.testing.assert_allclose(np.asarray(base["depth_fine"]),
                               np.asarray(other["depth_fine"]), atol=1e-6)


def test_view_dir_through_render_full_image():
    """The eval-path plumbing: `render_full_image(view_dir=...)` chunks the
    override alongside the rays (reference `eval.py:91-92`) and matches a
    direct render_rays call."""
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image

    params, emb, rays, ts, cfg = _setup()
    flat = {"nerf_fine": params["fine"], "embedding_t": emb["t"]}
    vd = jnp.tile(jnp.array([[0.1, 0.2, 1.0]]), (rays.shape[0], 1))
    render = make_render_fn(cfg, test_time=True, output_transient=True,
                            keys=("rgb_fine", "depth_fine"))
    out = render_full_image(render, flat, rays, ts, jax.random.PRNGKey(0),
                            chunk=4, view_dir=vd)
    direct = render_rays(params, emb, rays, ts, jax.random.PRNGKey(0), cfg,
                         test_time=True, output_transient=True, view_dir=vd)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               np.asarray(direct["rgb_fine"]), atol=1e-6)
