"""Device mesh + sharding helpers.

Rays are embarrassingly parallel (the batch dimension IS the data
dimension — SURVEY.md §2 "Rays are the batch dimension, so DP ≡
ray-sharding"), so a 1-D mesh with a single 'data' axis covers the
reference's entire parallelism story. Parameters (~1.2M) are replicated;
gradients are all-reduced by XLA over ICI.

There is no TP/PP/SP/EP analog here by design: the model is a 1.2M-param
MLP with no sequence dimension (SURVEY.md §2). Long-context scaling's
analog — ray chunking — becomes sharding + bigger fused batches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) dimension across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Apply the ray-dim sharding constraint to every leaf of a batch dict
    (used inside jit so XLA partitions the device-side gather too)."""
    spec = P(DATA_AXIS)
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec)),
        batch)
