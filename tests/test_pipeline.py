"""Data-pipeline tests: frame scheduler anti-correlation, device-side
batch gather, hard-sampling draws (`datasets/monocular.py:220-250`)."""
import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.data.pipeline import FrameScheduler, RayBatcher


def test_scheduler_respects_window():
    """Consecutive frames must be > window apart (monocular.py:222-232)."""
    sched = FrameScheduler(n_frames=30, window=5, seed=0)
    ts = [sched.next() for _ in range(200)]
    for a, b in zip(ts, ts[1:]):
        assert abs(a - b) > 5


def test_scheduler_tiny_scene_fallback():
    sched = FrameScheduler(n_frames=3, window=5, seed=0)
    ts = [sched.next() for _ in range(20)]
    assert all(0 <= t < 3 for t in ts)


def test_scheduler_covers_all_frames():
    sched = FrameScheduler(n_frames=30, window=5, seed=1)
    ts = {sched.next() for _ in range(500)}
    assert len(ts) == 30


def _table(n_frames=3, n_pixels=64):
    rng = np.random.RandomState(0)
    table = rng.rand(n_frames, n_pixels, 16).astype(np.float32)
    table[..., 9] = np.arange(n_frames, dtype=np.float32)[:, None]
    return table


def test_batch_channel_mapping():
    """The gathered batch dict channels must match the table layout
    (monocular.py:242-250)."""
    table = _table()
    b = RayBatcher(table, batch_size=16)
    batch = b.sample(jax.random.PRNGKey(0), 1)
    idx = np.asarray(batch["rand_idx"])
    rows = table[1][idx]
    np.testing.assert_allclose(np.asarray(batch["rays"]), rows[:, 0:6])
    np.testing.assert_allclose(np.asarray(batch["rgbs"]), rows[:, 6:9])
    np.testing.assert_array_equal(np.asarray(batch["ts"]),
                                  rows[:, 9].astype(np.int32))
    np.testing.assert_allclose(np.asarray(batch["disps"]), rows[:, 10])
    np.testing.assert_allclose(np.asarray(batch["rays_mask"]), rows[:, 11])
    np.testing.assert_allclose(np.asarray(batch["uv_fw"]), rows[:, 12:14])
    np.testing.assert_allclose(np.asarray(batch["uv_bw"]), rows[:, 14:16])
    assert np.all(np.asarray(batch["cam_ids"]) == 0)


def test_uniform_sampling_covers_pixels():
    b = RayBatcher(_table(n_pixels=32), batch_size=64)
    idx = set()
    for i in range(20):
        batch = b.sample(jax.random.PRNGKey(i), 0)
        idx.update(np.asarray(batch["rand_idx"]).tolist())
    assert len(idx) > 28  # nearly all pixels hit


def test_hard_sampling_concentrates():
    """With weight mass on a few pixels, draws should concentrate there
    (monocular.py:234-238)."""
    b = RayBatcher(_table(n_pixels=64), batch_size=256, hard_sampling=True)
    w = np.full(64, 1e-6, np.float32)
    w[:4] = 1.0
    b.update_weights(0, w)
    batch = b.sample(jax.random.PRNGKey(0), 0)
    idx = np.asarray(batch["rand_idx"])
    assert np.mean(idx < 4) > 0.95
