"""Sinusoidal positional encoding.

Matches the reference's `PosEmbedding` (`models/nerf.py:4-30`): frequencies
`2**linspace(0, max_logscale, N_freqs)` (logscale) or
`linspace(1, 2**max_logscale, N_freqs)`, output layout
`[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]` — the exact channel
order matters for checkpoint-import parity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def posenc_freqs(max_logscale: float, n_freqs: int, logscale: bool = True) -> np.ndarray:
    if logscale:
        return 2.0 ** np.linspace(0, max_logscale, n_freqs)
    return np.linspace(1, 2.0 ** max_logscale, n_freqs)


def posenc(x, max_logscale: float, n_freqs: int, logscale: bool = True):
    """Embed (..., C) -> (..., C*(1+2*n_freqs)).

    Channel order per frequency is [sin, cos] as in `models/nerf.py:25-30`
    (funcs = [sin, cos] iterated inside the frequency loop).
    """
    freqs = jnp.asarray(posenc_freqs(max_logscale, n_freqs, logscale),
                        dtype=x.dtype)
    # (..., N_freqs, C)
    xf = x[..., None, :] * freqs[:, None]
    # interleave sin/cos along a new axis -> (..., N_freqs, 2, C)
    sc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)


def posenc_dim(n_channels: int, n_freqs: int) -> int:
    return n_channels * (1 + 2 * n_freqs)
