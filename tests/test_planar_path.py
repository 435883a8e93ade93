"""Planar train path vs the reference-shaped path: loss + gradient
equivalence (CPU, kernels interpreted), and one-step integration through
`make_train_step` incl. a sharded mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.raymarch import render_train_planar
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
from nsff_pl_tpu.training.loss import (LossConfig, compute_losses,
                                       compute_losses_planar, total_loss)

N, S, FRAMES, NTAU = 48, 16, 4, 16


def _setup(encode_a=False):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=True, encode_appearance=encode_a,
            in_channels_t=NTAU, encode_transient=True, output_flow=True),
        "embedding_t": nerf_m.init_embedding(ks[1], FRAMES, NTAU),
    }
    if encode_a:
        params["embedding_a"] = nerf_m.init_embedding(ks[2], FRAMES, 48)
    rng = np.random.RandomState(0)
    rays = np.zeros((N, 6), np.float32)
    rays[:, 0:2] = rng.rand(N, 2) * 2 - 1
    rays[:, 2] = -1.0 + 0.1 * rng.rand(N)
    rays[:, 3:5] = (rng.rand(N, 2) - 0.5) * 0.4
    rays[:, 5] = 1.0 - rays[:, 2]
    batch = {
        "rays": jnp.asarray(rays),
        "ts": jnp.asarray(rng.randint(0, FRAMES, N)),
        "rgbs": jnp.asarray(rng.rand(N, 3).astype(np.float32)),
        "disps": jnp.asarray(rng.rand(N).astype(np.float32)),
        "cam_ids": jnp.zeros((N,), jnp.int32),
        "uv_fw": jnp.asarray(rng.rand(N, 2).astype(np.float32)),
        "uv_bw": jnp.asarray(rng.rand(N, 2).astype(np.float32)),
    }
    f = 20.0
    Ks = jnp.asarray(np.array(
        [[[f, 0, 8], [0, f, 8], [0, 0, 1]]], np.float32))
    Ps = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32),
                             (1, FRAMES, 1, 1)))
    cfg = RenderConfig(N_samples=S, N_importance=0, perturb=1.0,
                       noise_std=1.0, use_viewdir=True, encode_a=encode_a,
                       encode_t=True, N_tau=NTAU, max_t=FRAMES - 1,
                       compute_dtype="bfloat16", train_backend="pallas")
    lcfg = LossConfig(max_t=FRAMES - 1)
    return params, batch, Ks, Ps, cfg, lcfg


def _split(params):
    models = {"fine": params["nerf_fine"]}
    emb = {"t": params["embedding_t"]}
    if "embedding_a" in params:
        emb["a"] = params["embedding_a"]
    return models, emb


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-4)


def test_planar_loss_terms_and_grads_match_pallas_path():
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    key = jax.random.PRNGKey(5)
    flow = ("fw", "bw", "disocc")

    def loss_ref(p):
        models, emb = _split(p)
        res = render_rays(models, emb, batch["rays"], batch["ts"], key,
                          cfg, test_time=False, output_transient=True,
                          output_transient_flow=flow)
        ld = compute_losses(res, batch, lcfg, epoch=2,
                            output_transient_flow=flow, Ks=Ks, Ps=Ps)
        return total_loss(ld), (ld, res["rgb_fine"])

    def loss_planar(p):
        models, emb = _split(p)
        res = render_train_planar(models["fine"], emb, batch["rays"],
                                  batch["ts"], key, cfg)
        ld = compute_losses_planar(res, batch, lcfg, epoch=2, Ks=Ks, Ps=Ps)
        return total_loss(ld), (ld, res["rgb_fine"])

    (v1, (ld1, rgb1)), g1 = jax.value_and_grad(loss_ref, has_aux=True)(
        params)
    (v2, (ld2, rgb2)), g2 = jax.value_and_grad(loss_planar, has_aux=True)(
        params)

    assert set(ld1) == set(ld2)
    for k in ld1:
        np.testing.assert_allclose(float(ld1[k]), float(ld2[k]),
                                   rtol=2e-2, atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2),
                               atol=6e-3)
    assert abs(float(v1) - float(v2)) < 2e-2 * max(abs(float(v1)), 1.0)

    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        r = _rel(leaf, flat2[path])
        assert r < 0.3, f"{jax.tree_util.keystr(path)}: rel {r}"


def test_planar_step_integration_and_mesh():
    """make_train_step auto-selects the planar path when forced 'on';
    sharded (2 virtual devices) and unsharded agree."""
    import optax

    from nsff_pl_tpu.parallel import make_mesh
    from nsff_pl_tpu.training.step import TrainState, make_train_step

    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, fused_train="on")
    rng = np.random.RandomState(1)
    table = rng.rand(FRAMES, 256, 16).astype(np.float32)
    table[..., 0:2] = table[..., 0:2] * 2 - 1
    table[..., 2] = -1.0 + 0.1 * table[..., 2]
    table[..., 3:5] = (table[..., 3:5] - 0.5) * 0.4
    table[..., 5] = 1.0 - table[..., 2]
    table[..., 9] = np.arange(FRAMES, dtype=np.float32)[:, None]
    table = jnp.asarray(table)
    weights = jnp.ones(table.shape[:2], jnp.float32)
    tx = optax.adam(1e-3)

    def run(mesh):
        step = make_train_step(
            cfg, lcfg, tx, output_transient=True,
            output_transient_flow=("fw", "bw", "disocc"),
            steps_per_epoch=10, batch_size=32, mesh=mesh, donate=False)
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        state2, metrics, aux = step(state, table, weights, Ks, Ps,
                                    jax.random.PRNGKey(0), jnp.asarray(1))
        return state2, metrics

    s1, m1 = run(None)
    assert np.isfinite(float(m1["loss"]))
    before = np.asarray(params["nerf_fine"]["static_xyz_0"]["w"])
    after = np.asarray(s1.params["nerf_fine"]["static_xyz_0"]["w"])
    assert not np.allclose(before, after)

    s2, m2 = run(make_mesh(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for p1, p2 in zip(jax.tree.leaves(s1.params),
                      jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-5)


def test_planar_config_corners():
    """Deterministic mode (perturb=0, noise_std=0), top-k hard mining and
    no-viewdir all run and agree with the reference-shaped path."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, perturb=0.0, noise_std=0.0,
                              use_viewdir=False)
    lcfg = dataclasses.replace(lcfg, topk=0.5, thickness=3)
    key = jax.random.PRNGKey(9)
    flow = ("fw", "bw", "disocc")

    def loss_ref(p):
        models, emb = _split(p)
        res = render_rays(models, emb, batch["rays"], batch["ts"], key,
                          cfg, test_time=False, output_transient=True,
                          output_transient_flow=flow)
        return total_loss(compute_losses(
            res, batch, lcfg, epoch=11, output_transient_flow=flow,
            Ks=Ks, Ps=Ps))

    def loss_planar(p):
        models, emb = _split(p)
        res = render_train_planar(models["fine"], emb, batch["rays"],
                                  batch["ts"], key, cfg)
        return total_loss(compute_losses_planar(
            res, batch, lcfg, epoch=11, Ks=Ks, Ps=Ps))

    v1 = float(loss_ref(params))
    v2 = float(loss_planar(params))
    assert abs(v1 - v2) < 2e-2 * max(abs(v1), 1.0), (v1, v2)
    g = jax.grad(loss_planar)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_planar_opaque_samples_finite_grads():
    """Fully opaque mid-ray samples (alpha -> 1, the 1-alpha == 0
    underflow case that makes log-space transmittance NaN) must keep the
    matmul-cumsum transmittance's gradients finite."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    # huge sigma -> tau = delta * softplus(raw) saturates alpha to 1.0
    params = dict(params)
    params["nerf_fine"] = dict(params["nerf_fine"])
    params["nerf_fine"]["static_sigma"] = {
        "w": params["nerf_fine"]["static_sigma"]["w"] * 0 + 5.0,
        "b": params["nerf_fine"]["static_sigma"]["b"] * 0 + 500.0}
    key = jax.random.PRNGKey(2)

    def loss_planar(p):
        models, emb = _split(p)
        res = render_train_planar(models["fine"], emb, batch["rays"],
                                  batch["ts"], key, cfg)
        return total_loss(compute_losses_planar(
            res, batch, lcfg, epoch=0, Ks=Ks, Ps=Ps))

    v, g = jax.value_and_grad(loss_planar)(params)
    assert np.isfinite(float(v))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_planar_with_appearance():
    """encode_a exercises the a-embedding conditioning + its gradient."""
    params, batch, Ks, Ps, cfg, lcfg = _setup(encode_a=True)
    key = jax.random.PRNGKey(5)
    models, emb = _split(params)

    def loss_planar(p):
        m, e = _split(p)
        res = render_train_planar(m["fine"], e, batch["rays"],
                                  batch["ts"], key, cfg)
        ld = compute_losses_planar(res, batch, lcfg, epoch=0, Ks=Ks, Ps=Ps)
        return total_loss(ld)

    g = jax.grad(loss_planar)(params)
    assert np.isfinite(np.asarray(g["embedding_a"])).all()
    assert np.abs(np.asarray(g["embedding_a"])).max() > 0


def test_fused_train_on_raises_when_inapplicable():
    """Forcing fused_train='on' in a config the planar path cannot cover
    must raise instead of silently using the packed path (ADVICE r2)."""
    import optax
    import pytest

    from nsff_pl_tpu.training.step import make_train_step

    params, batch, Ks, Ps, cfg, lcfg = _setup()
    # one-directional flow is outside the planar envelope (coarse-to-fine
    # no longer is — tests/test_planar_c2f.py covers it)
    cfg = dataclasses.replace(cfg, fused_train="on")
    with pytest.raises(ValueError, match="fused_train='on'"):
        make_train_step(
            cfg, lcfg, optax.adam(1e-3), output_transient=True,
            output_transient_flow=("fw",),
            steps_per_epoch=10, batch_size=32, donate=False)


def test_planar_compositor_kernel_matches_xla():
    """The fused 3-composite Pallas compositor
    (ops/compositing_planar_kernel.py, planar_compositing='on',
    interpret mode) must match the XLA compositing ('off') through the
    FULL planar loss — values and parameter gradients."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    key = jax.random.PRNGKey(3)

    def loss_and_grads(mode):
        c = dataclasses.replace(cfg, planar_compositing=mode)

        def loss_fn(p):
            res = render_train_planar(
                p["nerf_fine"], {"t": p["embedding_t"]}, batch["rays"],
                batch["ts"], key, c)
            ld = compute_losses_planar(res, batch, lcfg, epoch=0,
                                       Ks=Ks, Ps=Ps)
            return total_loss(ld), res

        (v, res), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return v, res, g

    v1, r1, g1 = loss_and_grads("off")
    v2, r2, g2 = loss_and_grads("on")

    assert abs(float(v1) - float(v2)) < 1e-4 * max(abs(float(v1)), 1.0)
    for k in ("static_weights", "transient_weights", "weights",
              "rgb_fine", "depth_fine", "rgb_fw", "rgb_bw",
              "disocc_fw", "disocc_bw"):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        r = _rel(leaf, flat2[path])
        assert r < 5e-3, f"{jax.tree_util.keystr(path)}: rel {r}"


def test_planar_compositor_kernel_under_mesh():
    """The fused compositor must survive shard_map over the data mesh
    with unchanged numerics (pallas custom calls don't auto-partition
    under GSPMD)."""
    from nsff_pl_tpu.parallel import make_mesh

    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, planar_compositing="on")
    key = jax.random.PRNGKey(3)

    def run(mesh):
        fn = jax.jit(lambda p: render_train_planar(
            p["nerf_fine"], {"t": p["embedding_t"]}, batch["rays"],
            batch["ts"], key, cfg, mesh=mesh))
        return fn(params)

    r1 = run(None)
    r2 = run(make_mesh(2))
    for k in ("weights", "rgb_fine", "rgb_fw", "rgb_bw", "depth_fine"):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)

def test_warp_subsample_halves_match_exact():
    """warp_subsample=2 (one warp direction per ray): with deterministic
    sampling, the fw half must reproduce the exact path's fw quantities
    and the bw half the exact bw ones, bit-for-bit up to float tolerance;
    the fw/bw loss terms become the 2x-weighted per-half statistics and
    all main-eval terms are untouched."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, perturb=0.0, noise_std=0.0)
    cfg2 = dataclasses.replace(cfg, warp_subsample=2)
    key = jax.random.PRNGKey(3)
    models, emb = _split(params)
    n2 = batch["rays"].shape[0] // 2

    res1 = render_train_planar(models["fine"], emb, batch["rays"],
                               batch["ts"], key, cfg)
    res2 = render_train_planar(models["fine"], emb, batch["rays"],
                               batch["ts"], key, cfg2)

    def close(a, b, tol=1e-5):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)

    # warped quantities: half-for-half against the exact evaluation
    close(res2["rgb_w"][:n2], res1["rgb_fw"][:n2])
    close(res2["rgb_w"][n2:], res1["rgb_bw"][n2:])
    close(res2["disocc_w"][:n2], res1["disocc_fw"][:n2])
    close(res2["disocc_w"][n2:], res1["disocc_bw"][n2:])
    close(res2["disoccs_w"][:n2], res1["disoccs_fw"][:n2])
    close(res2["disoccs_w"][n2:], res1["disoccs_bw"][n2:])
    for c in range(3):
        close(res2["xyzs_wb"][c][:n2], res1["xyzs_fw_bw"][c][:n2])
        close(res2["xyzs_wb"][c][n2:], res1["xyzs_bw_fw"][c][n2:])
    # main-eval outputs identical
    for k in ("rgb_fine", "depth_fine", "weights", "xyz_fw", "xyz_bw"):
        close(res2[k], res1[k])

    ld1 = compute_losses_planar(res1, batch, lcfg, epoch=2, Ks=Ks, Ps=Ps)
    ld2 = compute_losses_planar(res2, batch, lcfg, epoch=2, Ks=Ks, Ps=Ps)
    assert set(ld1) == set(ld2)
    for k in ld1:
        if k in ("pho_l", "cyc_l"):
            continue
        np.testing.assert_allclose(float(ld1[k]), float(ld2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # pho/cyc: 2x-weighted per-half statistics of the exact quantities
    rgbs = np.asarray(batch["rgbs"])
    dfw = np.asarray(res1["disocc_fw"])[:n2]
    dbw = np.asarray(res1["disocc_bw"])[n2:]
    pho_fw = dfw * (np.asarray(res1["rgb_fw"])[:n2] - rgbs[:n2]) ** 2 \
        / dfw.mean()
    pho_bw = dbw * (np.asarray(res1["rgb_bw"])[n2:] - rgbs[n2:]) ** 2 \
        / dbw.mean()
    expected_pho = 2.0 * np.concatenate([pho_fw, pho_bw]).mean(-1).mean()
    np.testing.assert_allclose(float(ld2["pho_l"]), expected_pho,
                               rtol=1e-4)

    # and gradients through the subsampled loss stay finite
    def loss2(p):
        m, e = _split(p)
        r = render_train_planar(m["fine"], e, batch["rays"], batch["ts"],
                                key, cfg2)
        return total_loss(compute_losses_planar(r, batch, lcfg, epoch=2,
                                                Ks=Ks, Ps=Ps))

    g = jax.grad(loss2)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_warp_subsample_step_integration_and_mesh():
    """make_train_step with warp_subsample=2 runs end-to-end (fused
    compositor forced on so the duplicated-w1 slot path is covered) and
    the sharded (2 virtual devices) step matches unsharded."""
    import optax

    from nsff_pl_tpu.parallel import make_mesh
    from nsff_pl_tpu.training.step import TrainState, make_train_step

    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, fused_train="on", warp_subsample=2,
                              planar_compositing="on")
    rng = np.random.RandomState(1)
    table = rng.rand(FRAMES, 256, 16).astype(np.float32)
    table[..., 0:2] = table[..., 0:2] * 2 - 1
    table[..., 2] = -1.0 + 0.1 * table[..., 2]
    table[..., 3:5] = (table[..., 3:5] - 0.5) * 0.4
    table[..., 5] = 1.0 - table[..., 2]
    table[..., 9] = np.arange(FRAMES, dtype=np.float32)[:, None]
    table = jnp.asarray(table)
    weights = jnp.ones(table.shape[:2], jnp.float32)
    tx = optax.adam(1e-3)

    def run(mesh):
        step = make_train_step(
            cfg, lcfg, tx, output_transient=True,
            output_transient_flow=("fw", "bw", "disocc"),
            steps_per_epoch=10, batch_size=32, mesh=mesh, donate=False)
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        state2, metrics, aux = step(state, table, weights, Ks, Ps,
                                    jax.random.PRNGKey(0), jnp.asarray(1))
        return state2, metrics

    s1, m1 = run(None)
    assert np.isfinite(float(m1["loss"]))
    before = np.asarray(params["nerf_fine"]["static_xyz_0"]["w"])
    after = np.asarray(s1.params["nerf_fine"]["static_xyz_0"]["w"])
    assert not np.allclose(before, after)

    s2, m2 = run(make_mesh(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
