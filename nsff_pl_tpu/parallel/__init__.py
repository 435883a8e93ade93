"""Multi-chip parallelism: mesh construction and sharding specs.

The reference's only distributed strategy is DDP gradient all-reduce over
NCCL (`train.py:294-301`, SURVEY.md §2). The TPU-native equivalent: a 1-D
`jax.sharding.Mesh` over the chips, ray batches sharded along the mesh,
parameters replicated, and XLA inserting the gradient all-reduce (and the
collectives for batch-global loss statistics) automatically over ICI.
"""

from nsff_pl_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
