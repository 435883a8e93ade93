"""HBM-resident ray-table pipeline.

The reference feeds training through a torch DataLoader with 4 worker
processes, each `__getitem__` assembling a full batch on the host
(`datasets/monocular.py:220-250`, `train.py:153-160`). On TPU the whole
(N_frames, H*W, 16) ray table (~283 MB fp32 for kid-running) fits in HBM,
so we upload it once and make batch assembly a device-side gather inside
the jitted train step — no host<->device traffic per step, no worker
processes.

Two pieces:

- `FrameScheduler` (host, stateful): picks the frame index for each step
  with the reference's temporal anti-correlation rule — next frame is
  sampled outside a +-5 window of the last one (`monocular.py:222-232`).
  Sequential host state is the natural home for this; it is O(1) per step.
- `RayBatcher` (device, pure): given (rng, t) gathers `batch_size` rays of
  frame t, uniformly or weighted by the hard-sampling distribution
  (`monocular.py:234-241`). Returns the batch dict the loss expects
  (`monocular.py:242-250`).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class FrameScheduler:
    """Temporal anti-correlation frame sampling (`monocular.py:222-232`).

    The reference runs 4 DataLoader worker processes, each holding its own
    `last_t`; the global batch stream is their round-robin interleave, so
    the ±`window` exclusion applies per worker stream, not between
    globally consecutive batches (`train.py:156-160` num_workers=4,
    `monocular.py:225` "for EACH worker"). `num_streams` emulates exactly
    that: stream i = the reference's worker i, served round-robin. One
    shared RandomState stands in for the workers' independent RNGs —
    identical in distribution since draws are independent across streams.
    `num_streams=1` gives the strictly-stronger single-stream rule (every
    consecutive pair > window apart).
    """

    def __init__(self, n_frames: int, window: int = 5, seed: int = 42,
                 num_streams: int = 4):
        self.n_frames = n_frames
        self.window = window
        self.rng = np.random.RandomState(seed)
        self.last_ts = [-1] * max(1, int(num_streams))
        self._turn = 0

    def next(self) -> int:
        s = self._turn % len(self.last_ts)
        self._turn += 1
        last = self.last_ts[s]
        if last == -1:
            t = int(self.rng.choice(self.n_frames))
        else:
            valid = list(set(range(self.n_frames))
                         - set(range(last - self.window,
                                     last + self.window + 1)))
            if not valid:  # tiny scenes: fall back to uniform
                valid = list(range(self.n_frames))
            t = int(self.rng.choice(valid))
        self.last_ts[s] = t
        return t


class RayBatcher:
    """Device-side batch gather over the HBM-resident ray table."""

    # ray-table channel layout (matches monocular.py:181-184)
    RAYS = slice(0, 6)
    RGB = slice(6, 9)
    T = 9
    DISP = 10
    MASK = 11
    UV_FW = slice(12, 14)
    UV_BW = slice(14, 16)

    def __init__(self, table: np.ndarray, batch_size: int,
                 hard_sampling: bool = False):
        """table: (N_frames, H*W, 16) float32 (from MonocularScene.rays)."""
        self.n_frames, self.n_pixels, _ = table.shape
        self.batch_size = batch_size
        self.hard_sampling = hard_sampling
        self.table = jax.device_put(jnp.asarray(table))
        # hard-sampling distribution, refreshed from validation SSIM maps
        # (train.py:246-257); kept on device as log-weights for Gumbel
        # top-k sampling
        self.weights = jnp.ones((self.n_frames, self.n_pixels), jnp.float32)

    def update_weights(self, t: int, w: np.ndarray):
        """Refresh one frame's sampling weights (1 - SSIM, train.py:253).

        `w` stays a host array through the update so the op follows
        `self.weights`' sharding (which is a global replicated array under
        multi-process training)."""
        self.weights = self.weights.at[t].set(np.asarray(w, np.float32))

    def sample(self, rng: jax.Array, t) -> Dict[str, jnp.ndarray]:
        """Gather one training batch for frame `t` (traced or concrete).

        Uniform: random integer gather. Hard sampling: weighted draw with
        replacement via Gumbel-max (equivalent to `np.random.choice(p=w)`,
        `monocular.py:236-238`).
        """
        return _sample_batch(self.table, self.weights, rng, jnp.asarray(t),
                             self.batch_size, self.hard_sampling)


def _sample_batch(table, weights, rng, t, batch_size: int,
                  hard_sampling: bool) -> Dict[str, jnp.ndarray]:
    """Pure sampling fn (jit-friendly; call from inside the train step)."""
    n_pixels = table.shape[1]
    frame = table[t]  # (H*W, 16) dynamic gather over frames
    if hard_sampling:
        # Weighted draw with replacement via inverse-CDF sampling —
        # distribution-identical to `np.random.choice(p=w)`
        # (`monocular.py:236-238`). NOT jax.random.categorical: that
        # materializes a (B, P) gumbel tensor + argmax reduction
        # (512×147456 ≈ 75M floats per step at reference scale — measured
        # as most of the ~21% mining tax in the round-4 parity run). The
        # prefix sum over P and a B-wide binary search are ~1000× less
        # work and memory traffic.
        w = jnp.maximum(weights[t], 0.0)
        cw = jnp.cumsum(w)
        u = jax.random.uniform(rng, (batch_size,)) * cw[-1]
        idx = jnp.clip(jnp.searchsorted(cw, u, side="right"), 0, n_pixels - 1)
    else:
        idx = jax.random.randint(rng, (batch_size,), 0, n_pixels)
    rays = frame[idx]  # (B, 16)
    B = RayBatcher
    return {
        "rays": rays[:, B.RAYS],
        "rgbs": rays[:, B.RGB],
        "ts": rays[:, B.T].astype(jnp.int32),
        "cam_ids": jnp.zeros((batch_size,), jnp.int32),  # monocular: cam 0
        "disps": rays[:, B.DISP],
        "rays_mask": rays[:, B.MASK],
        "uv_fw": rays[:, B.UV_FW],
        "uv_bw": rays[:, B.UV_BW],
        "rand_idx": idx,
    }
