"""Persistent XLA compilation cache (TPU-native addition; no reference
analog — the reference's CuPy NVRTC kernels are memoized per-process only,
`softsplat.py:203-205`, and torch recompiles nothing else).

First compiles of the fused train step / eval kernels cost ~30-45 s on
TPU; with a cache dir, repeat CLI invocations (eval after train, resumed
runs, sweeps) load the compiled executables instead."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at `path` (created if
    missing). Call before the first jit executes; later calls are no-ops
    for already-compiled programs."""
    if not path:
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: even sub-second programs add up over the eval
    # CLI's many small jits, and entries are content-addressed
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
