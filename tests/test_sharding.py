"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4): the sharded train step must run AND match the unsharded
step numerically (batch-global loss statistics need collectives — the
SURVEY.md §5 caution)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.config import NSFFConfig
from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.rendering import RenderConfig
from nsff_pl_tpu.parallel import make_mesh
from nsff_pl_tpu.training.loss import LossConfig
from nsff_pl_tpu.training.optim import make_optimizer
from nsff_pl_tpu.training.step import TrainState, make_train_step


def _setup(batch_size, train_backend="auto"):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=False, encode_transient=True,
            in_channels_t=16, output_flow=True),
        "embedding_t": nerf_m.init_embedding(ks[1], 4, 16),
    }
    rcfg = RenderConfig(N_samples=8, use_viewdir=False, encode_t=True,
                        max_t=3, img_wh=(16, 12), N_tau=16,
                        train_backend=train_backend)
    tx = make_optimizer(NSFFConfig(lr_scheduler="cosine", num_epochs=2), 10)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.RandomState(0)
    table = rng.rand(4, 128, 16).astype(np.float32)
    table[..., 2] = -1.0
    table[..., 5] = 2.0
    table[..., 9] = np.arange(4, dtype=np.float32)[:, None]
    Ks = np.array([[[20.0, 0, 8], [0, 20, 6], [0, 0, 1]]], np.float32)
    Ps = np.tile(np.eye(3, 4, dtype=np.float32), (1, 4, 1, 1))
    return state, tx, rcfg, (jnp.asarray(table),
                             jnp.ones((4, 128), jnp.float32),
                             jnp.asarray(Ks), jnp.asarray(Ps))


@pytest.mark.parametrize("train_backend", ["xla", "pallas"])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_step_matches_unsharded(n_devices, train_backend):
    """The sharded step must match unsharded numerics for BOTH backends:
    XLA (GSPMD auto-partitioned) and Pallas (shard_map-wrapped kernels,
    interpret mode on CPU). The Pallas path's gradient equality proves
    the replicated-weight cotangent is correctly psum'ed across shards."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    batch_size = 32
    flow = ("fw", "bw", "disocc")

    def run(mesh):
        state, tx, rcfg, data = _setup(batch_size, train_backend)
        step = make_train_step(
            rcfg, LossConfig(max_t=3), tx, output_transient=True,
            output_transient_flow=flow, steps_per_epoch=10,
            batch_size=batch_size, mesh=mesh, donate=False)
        state, metrics, _ = step(state, *data, jax.random.PRNGKey(3),
                                 jnp.asarray(1))
        return state, metrics

    state_1, m_1 = run(None)
    state_n, m_n = run(make_mesh(n_devices))

    np.testing.assert_allclose(float(m_n["loss"]), float(m_1["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_n["psnr"]), float(m_1["psnr"]),
                               rtol=1e-4)
    # updated parameters identical across sharding configurations (the
    # pallas dW accumulators are f32 but block partitioning changes the
    # accumulation order -> slightly looser tolerance there)
    atol = 1e-5 if train_backend == "xla" else 1e-4
    w1 = np.asarray(state_1.params["nerf_fine"]["static_xyz_0"]["w"])
    wn = np.asarray(state_n.params["nerf_fine"]["static_xyz_0"]["w"])
    np.testing.assert_allclose(wn, w1, atol=atol)


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_train_step_deterministic():
    """SURVEY §5: determinism by construction (sorted XLA scatter, explicit
    jax.random keys). The same state + batch + key must produce bitwise
    identical losses and updated params across two executions."""
    batch_size = 32
    state, tx, rcfg, data = _setup(batch_size)
    step = make_train_step(
        rcfg, LossConfig(max_t=3), tx, output_transient=True,
        output_transient_flow=("fw", "bw", "disocc"), steps_per_epoch=10,
        batch_size=batch_size, donate=False)
    out = []
    for _ in range(2):
        s2, m, _ = step(state, *data, jax.random.PRNGKey(9), jnp.asarray(2))
        out.append((float(m["loss"]),
                    np.asarray(s2.params["nerf_fine"]["static_xyz_0"]["w"])))
    assert out[0][0] == out[1][0]
    np.testing.assert_array_equal(out[0][1], out[1][1])


@pytest.mark.parametrize("mlp_backend", ["xla", "pallas"])
def test_sharded_full_image_render_matches(mlp_backend):
    """Mesh-sharded validation/eval rendering (VERDICT r2 #7): a chunked
    full-image render over an 8-virtual-device mesh must match the
    single-device render for both eval backends (the pallas eval kernel
    is shard_map'ed; XLA partitions via GSPMD)."""
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=True, encode_transient=True,
            in_channels_t=16, output_flow=True),
        "embedding_t": nerf_m.init_embedding(ks[1], 4, 16),
    }
    rcfg = RenderConfig(N_samples=8, use_viewdir=True, encode_t=True,
                        max_t=3, img_wh=(16, 12), N_tau=16,
                        mlp_backend=mlp_backend)
    rng = np.random.RandomState(0)
    n = 16 * 12
    rays = np.zeros((n, 6), np.float32)
    rays[:, 0:2] = rng.rand(n, 2) * 2 - 1
    rays[:, 2] = -1.0
    rays[:, 3:5] = (rng.rand(n, 2) - 0.5) * 0.4
    rays[:, 5] = 2.0
    rays = jnp.asarray(rays)
    ts = jnp.zeros((n,), jnp.int32)
    vis_poses = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    vis_K = jnp.asarray(np.array([[20.0, 0, 8], [0, 20, 6], [0, 0, 1]],
                                 np.float32))

    def run(mesh):
        render = make_render_fn(
            rcfg, test_time=True, output_transient=True,
            output_transient_flow=(), with_visibility=True,
            keys=("rgb_fine", "depth_fine"), mesh=mesh)
        return render_full_image(render, params, rays, ts,
                                 jax.random.PRNGKey(1), chunk=64,
                                 vis_poses=vis_poses, vis_K=vis_K)

    r1 = run(None)
    r2 = run(make_mesh(8))
    for k in ("rgb_fine", "depth_fine"):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_sharded_render_view_dir_override_matches():
    """`--fix_view_dir` under a mesh: the view_dir override shards
    alongside the rays (training/step.py::make_render_fn) and matches the
    single-device render."""
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image

    key = jax.random.PRNGKey(0)
    params = {"nerf_fine": nerf_m.init_nerf_params(
        key, "fine", use_viewdir=True)}
    rcfg = RenderConfig(N_samples=8, use_viewdir=True, img_wh=(16, 12))
    rng = np.random.RandomState(1)
    n = 64
    rays = np.zeros((n, 6), np.float32)
    rays[:, 0:2] = rng.rand(n, 2) * 2 - 1
    rays[:, 2] = -1.0
    rays[:, 3:5] = (rng.rand(n, 2) - 0.5) * 0.4
    rays[:, 5] = 2.0
    rays = jnp.asarray(rays)
    vd = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def run(mesh):
        render = make_render_fn(rcfg, test_time=True,
                                output_transient=False,
                                keys=("rgb_fine",), mesh=mesh)
        return render_full_image(render, params, rays, None,
                                 jax.random.PRNGKey(1), chunk=16,
                                 view_dir=vd)

    r1 = run(None)
    r2 = run(make_mesh(8))
    np.testing.assert_allclose(np.asarray(r1["rgb_fine"]),
                               np.asarray(r2["rgb_fine"]),
                               rtol=1e-5, atol=1e-6)


def test_scan_dispatch_under_mesh_matches_unsharded():
    """K-step scan dispatch (--scan_steps) composed with a data mesh
    (--num_gpus): the grouped sharded step must reproduce the grouped
    UNSHARDED step exactly — scan changes only the dispatch pattern and
    the mesh only the placement."""
    import optax

    from nsff_pl_tpu.models.rendering import RenderConfig
    from nsff_pl_tpu.training.loss import LossConfig
    from nsff_pl_tpu.training.step import TrainState, make_train_step

    n_frames, n_pixels, bs, K = 4, 256, 32, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=True, encode_transient=True,
            in_channels_t=48, output_flow=True),
        "embedding_t": nerf_m.init_embedding(ks[1], n_frames, 48),
    }
    cfg = RenderConfig(N_samples=8, N_importance=0, perturb=1.0,
                       noise_std=1.0, use_viewdir=True, encode_t=True,
                       max_t=n_frames - 1, img_wh=(16, 16))
    rng = np.random.RandomState(0)
    table = rng.rand(n_frames, n_pixels, 16).astype(np.float32)
    table[..., 9] = np.arange(n_frames, dtype=np.float32)[:, None]
    table = jnp.asarray(table)
    weights = jnp.ones(table.shape[:2], jnp.float32)
    Ks = jnp.asarray(np.array([[[20, 0, 8], [0, 20, 8], [0, 0, 1]]],
                              np.float32))
    Ps = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32),
                             (1, n_frames, 1, 1)))
    tx = optax.adam(1e-3)
    kw = dict(output_transient=True,
              output_transient_flow=("fw", "bw", "disocc"),
              steps_per_epoch=2, batch_size=bs, hard_sampling=False,
              donate=False, scan_steps=K)
    ts = jnp.asarray([1, 2, 0])
    root = jax.random.PRNGKey(7)
    tmp0 = jnp.zeros((1, 1, 3))

    def run(mesh):
        stepK = make_train_step(cfg, LossConfig(max_t=n_frames - 1), tx,
                                mesh=mesh, **kw)
        state0 = TrainState(params, tx.init(params),
                            jnp.zeros((), jnp.int32))
        state, _, m = stepK(state0, tmp0, table, weights, Ks, Ps, root, ts)
        return state, m

    s1, m1 = run(None)
    s2, m2 = run(make_mesh(8))
    np.testing.assert_allclose(np.asarray(m2["loss"]),
                               np.asarray(m1["loss"]), rtol=1e-5)
    # sharded gradient reductions reorder f32 sums; over 3 chained Adam
    # steps the rsqrt(v) amplifies ~1e-7 grad deltas on near-zero-v
    # entries to O(lr * 1e-2) updates on isolated elements. The per-step
    # LOSSES matching at 1e-5 carries the semantic equivalence; the
    # end-state params get the correspondingly looser band
    for p1, p2 in zip(jax.tree.leaves(s1.params),
                      jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-3, atol=5e-5)
