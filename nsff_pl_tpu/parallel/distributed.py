"""Multi-process (multi-node) data parallelism.

The reference scales past one machine with Lightning DDP over NCCL —
`Trainer(gpus=num_gpus, num_nodes=num_nodes, accelerator='ddp')`
(`train.py:294-301`, flags `opt.py:63-66`): every rank runs an identical
trainer and gradients are all-reduced. The TPU-native equivalent built
here:

- `jax.distributed.initialize` connects the processes (auto-detected on
  TPU pods; explicit `--coordinator_address`/`--node_rank` elsewhere),
- the 1-D data mesh spans ALL processes' chips (`jax.devices()` is global
  after initialization),
- the ONE jitted SPMD train step shards the ray batch over the global
  mesh — XLA inserts the gradient all-reduce and the collectives for the
  batch-global loss statistics over ICI (and DCN across slices), exactly
  as in the single-process mesh path.

Every process executes the identical host loop (same seeds, same frame
schedule), so host-side state stays consistent; anything a process reads
back from the device is fully replicated. Process 0 owns the side effects
(logging, config writes, progress prints); Orbax checkpointing is itself
multihost-aware (all processes call save, the primary writes replicated
arrays).

Host arrays crossing into a multi-process jit must either be numpy (pjit
treats host-local non-Array inputs as replicated global values) or
explicitly `device_put` with a replicated sharding — a process-local
committed `jax.Array` cannot describe a global value. `replicate` and
`host_array` below are those two conversions.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(cfg) -> bool:
    """Connect the processes when `--num_nodes > 1` (no-op otherwise).

    Must run before any other JAX use in the process. On TPU pods all
    arguments are auto-detected; elsewhere pass `--coordinator_address
    host:port` and `--node_rank` (the reference reads the equivalent
    MASTER_ADDR/NODE_RANK env vars through Lightning).
    """
    if getattr(cfg, "num_nodes", 1) <= 1:
        return False
    kwargs = {}
    if cfg.coordinator_address:
        if cfg.node_rank < 0:
            raise ValueError("--coordinator_address requires --node_rank")
        kwargs = dict(coordinator_address=cfg.coordinator_address,
                      num_processes=cfg.num_nodes,
                      process_id=cfg.node_rank)
    jax.distributed.initialize(**kwargs)
    return True


def multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns logging/printing side effects."""
    return jax.process_index() == 0


def replicated(mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh):
    """Replicate every leaf over the (possibly multi-process) mesh.

    Works for numpy arrays and for process-local jax.Arrays whose value is
    identical on every process (SPMD invariant: params/tables/buffers are
    built from the same seed and files everywhere)."""
    sharding = replicated(mesh)

    def put(x):
        if isinstance(x, jax.Array):
            # a committed process-local array can't be device_put to a
            # non-addressable sharding directly; round-trip through host
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def host_array(x):
    """Fetch to host numpy so pjit treats it as a replicated global value
    (used for per-step operands like RNG keys and frame indices)."""
    return np.asarray(x)
