"""Importance-concentrated warp estimator (RenderConfig.warp_importance):
Horvitz-Thompson selection unbiasedness, exact reduction at f=1.0, loss
equivalence of both composite backends, and step/mesh integration."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models.raymarch import (_importance_select,
                                         render_train_planar)
from nsff_pl_tpu.training.loss import compute_losses_planar, total_loss
from tests.test_planar_path import _setup, _split


def test_importance_select_identity_at_full_capacity():
    """K = n forces pi = 1 everywhere: the selection is the identity with
    unit weights — the foundation of the f=1.0 exactness reduction."""
    scores = jnp.asarray(np.random.RandomState(0).rand(64) + 0.05)
    idx, v = _importance_select(scores, 64, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(64))
    np.testing.assert_allclose(np.asarray(v), 1.0, rtol=1e-6)


def test_importance_select_unbiased():
    """E[sum_k v_k f(idx_k)] = sum_i f(i) for arbitrary per-ray f — the
    HT property the loss scatter relies on. Monte-Carlo over keys."""
    n, K = 64, 16
    rng = np.random.RandomState(0)
    # heavily skewed scores (a few 'dynamic' rays + a floor)
    scores = jnp.asarray(np.where(rng.rand(n) < 0.15, 1.0, 0.05)
                         .astype(np.float32))
    f = jnp.asarray(rng.rand(n).astype(np.float32))

    def draw(key):
        idx, v = _importance_select(scores, K, key)
        return jnp.zeros((n,)).at[idx].add(v * f[idx])

    keys = jax.random.split(jax.random.PRNGKey(7), 4096)
    est = np.asarray(jax.vmap(draw)(keys))
    mean = est.mean(0)
    # per-ray unbiasedness within 5 empirical standard errors
    np.testing.assert_allclose(mean.sum(), float(f.sum()), rtol=0.02)
    se = est.std(0) / np.sqrt(est.shape[0])
    assert (np.abs(mean - np.asarray(f)) <= 5 * se + 1e-4).all()
    # concentration: every high-score ray is selected in (almost) every
    # draw — pi >= 1 given this score profile
    hot = np.asarray(scores) >= 1.0
    counts = np.asarray(jax.vmap(
        lambda k: jnp.zeros((n,)).at[_importance_select(scores, K, k)[0]]
        .add(1.0))(keys))
    assert (counts[:, hot] >= 1).mean() > 0.999


@pytest.mark.parametrize("compositing", ["auto", "on"])
def test_warp_importance_full_matches_exact(compositing):
    """warp_importance=1.0 with deterministic sampling reduces EXACTLY to
    the exact path: identical warped quantities and identical loss dict —
    on both the XLA composite ('auto' resolves to XLA on CPU) and the
    fused compositor kernel ('on', interpret mode)."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, perturb=0.0, noise_std=0.0,
                              planar_compositing=compositing)
    cfg2 = dataclasses.replace(cfg, warp_importance=1.0)
    key = jax.random.PRNGKey(3)
    models, emb = _split(params)

    res1 = render_train_planar(models["fine"], emb, batch["rays"],
                               batch["ts"], key, cfg)
    res2 = render_train_planar(models["fine"], emb, batch["rays"],
                               batch["ts"], key, cfg2)

    def close(a, b, tol=1e-5):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)

    np.testing.assert_array_equal(np.asarray(res2["warp_idx"]),
                                  np.arange(batch["rays"].shape[0]))
    close(res2["rgb_fw_g"], res1["rgb_fw"])
    close(res2["rgb_bw_g"], res1["rgb_bw"])
    close(res2["disocc_fw_g"], res1["disocc_fw"])
    close(res2["disocc_bw_g"], res1["disocc_bw"])
    close(res2["disoccs_fw_g"], res1["disoccs_fw"])
    close(res2["disoccs_bw_g"], res1["disoccs_bw"])
    for c in range(3):
        close(res2["xyzs_fw_bw_g"][c], res1["xyzs_fw_bw"][c])
        close(res2["xyzs_bw_fw_g"][c], res1["xyzs_bw_fw"][c])
    for k in ("rgb_fine", "depth_fine", "weights", "xyz_fw", "xyz_bw"):
        close(res2[k], res1[k])

    ld1 = compute_losses_planar(res1, batch, lcfg, epoch=2, Ks=Ks, Ps=Ps)
    ld2 = compute_losses_planar(res2, batch, lcfg, epoch=2, Ks=Ks, Ps=Ps)
    assert set(ld1) == set(ld2)
    for k in ld1:
        np.testing.assert_allclose(float(ld1[k]), float(ld2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_warp_importance_grads_finite_and_cover_flow_heads():
    """Gradients through the subsampled estimator are finite and reach
    the flow heads (the gather/scatter path must not sever them)."""
    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, warp_importance=0.5)
    key = jax.random.PRNGKey(5)

    def loss(p):
        m, e = _split(p)
        r = render_train_planar(m["fine"], e, batch["rays"], batch["ts"],
                                key, cfg)
        return total_loss(compute_losses_planar(r, batch, lcfg, epoch=2,
                                                Ks=Ks, Ps=Ps))

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    gflow = g["nerf_fine"]["transient_flow_fw"]["w"]
    assert float(jnp.max(jnp.abs(gflow))) > 0.0


def test_warp_importance_step_integration_and_mesh():
    """make_train_step with warp_importance=0.5 runs end-to-end (fused
    compositor on) and the 2-virtual-device sharded step matches
    unsharded — selection is computed from global arrays, so the mesh
    must not change the numbers."""
    import optax

    from nsff_pl_tpu.parallel import make_mesh
    from nsff_pl_tpu.training.step import TrainState, make_train_step
    from tests.test_planar_path import FRAMES

    params, batch, Ks, Ps, cfg, lcfg = _setup()
    cfg = dataclasses.replace(cfg, fused_train="on", warp_importance=0.5,
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
        state2, metrics, _aux = step(state, table, weights, Ks, Ps,
                                     jax.random.PRNGKey(0), jnp.asarray(1))
        return state2, metrics

    s1, m1 = run(None)
    assert np.isfinite(float(m1["loss"]))
    before = np.asarray(params["nerf_fine"]["static_xyz_0"]["w"])
    after = np.asarray(s1.params["nerf_fine"]["static_xyz_0"]["w"])
    assert not np.allclose(before, after)

    _s2, m2 = run(make_mesh(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
