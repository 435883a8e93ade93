"""Functional static + transient NeRF with forward/backward scene-flow heads.

A TPU-first re-design of the reference `models/nerf.py:33-213` (an 8x256
MLP pair). Instead of an nn.Module with string-keyed submodules, the model
is a pure function `apply(params, ...)` over a parameter pytree, so it
composes with jit/grad/vmap/pjit, and all matmuls are (B, W) x (W, W) —
large, batched, MXU-shaped.

Topology (identical to the reference):
- static branch:  D=8, W=256, skip cat of the xyz embedding at layer 4
  (`nerf.py:74-83`), sigma head from the 8th ReLU feature (`nerf.py:90`),
  rgb head from a final linear (+ optional viewdir/appearance conditioning,
  `nerf.py:85-91,182-186`)
- transient branch: same topology on xyz-embedding ⊕ time-latent
  (`nerf.py:93-103`), sigma/rgb from the final linear feature
  (`nerf.py:110-111,197-202`), and (fine model only) fw/bw flow heads
  `tanh(linear(feat)) * flow_scale` (`nerf.py:112-116,205-208`)

Weights are stored as (fan_in, fan_out) so application is `x @ W + b`
(transposed from torch's Linear layout; the checkpoint importer in
`training/checkpoint.py` handles the conversion).
"""
from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jnp.ndarray]]

DEFAULT_D = 8
DEFAULT_W = 256
DEFAULT_SKIPS = (4,)


def _linear_init(rng, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(rng)
    w = jax.random.uniform(k_w, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _linear(params, x):
    return x @ params["w"] + params["b"]


def init_nerf_params(
    rng,
    typ: str = "fine",
    D: int = DEFAULT_D,
    W: int = DEFAULT_W,
    skips: Sequence[int] = DEFAULT_SKIPS,
    in_channels_xyz: int = 63,
    use_viewdir: bool = True,
    in_channels_dir: int = 27,
    encode_appearance: bool = False,
    in_channels_a: int = 48,
    encode_transient: bool = False,
    in_channels_t: int = 48,
    output_flow: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Build the parameter pytree. Mirrors `models/nerf.py:34-116` including
    the coarse-model restrictions (no appearance, no flow — `nerf.py:67,112`).
    """
    encode_appearance = False if typ == "coarse" else encode_appearance
    n_a = in_channels_a if encode_appearance else 0
    output_flow = encode_transient and output_flow and typ == "fine"

    keys = iter(jax.random.split(rng, 64))
    p: Params = {}

    # static xyz tower
    for i in range(D):
        fan_in = in_channels_xyz if i == 0 else (
            W + in_channels_xyz if i in skips else W)
        p[f"static_xyz_{i}"] = _linear_init(next(keys), fan_in, W, dtype)
    p["static_xyz_final"] = _linear_init(next(keys), W, W, dtype)
    if use_viewdir:
        p["static_dir"] = _linear_init(
            next(keys), W + in_channels_dir + n_a, W, dtype)
    p["static_sigma"] = _linear_init(next(keys), W, 1, dtype)
    p["static_rgb"] = _linear_init(next(keys), W, 3, dtype)

    if encode_transient:
        in_tr = in_channels_xyz + in_channels_t
        for i in range(D):
            fan_in = in_tr if i == 0 else (W + in_tr if i in skips else W)
            p[f"transient_xyz_{i}"] = _linear_init(next(keys), fan_in, W, dtype)
        p["transient_xyz_final"] = _linear_init(next(keys), W, W, dtype)
        p["transient_sigma"] = _linear_init(next(keys), W, 1, dtype)
        p["transient_rgb"] = _linear_init(next(keys), W, 3, dtype)
        if output_flow:
            p["transient_flow_fw"] = _linear_init(next(keys), W, 3, dtype)
            p["transient_flow_bw"] = _linear_init(next(keys), W, 3, dtype)
    return p


def _tower(params, prefix: str, inp, D: int, skips: Sequence[int],
           compute_dtype):
    """The 8-layer ReLU tower with skip re-concatenation (`nerf.py:162-167`)."""
    h = inp
    for i in range(D):
        if i in skips:
            h = jnp.concatenate([inp, h], -1)
        h = jax.nn.relu(_linear(
            jax.tree.map(lambda a: a.astype(compute_dtype),
                         params[f"{prefix}_{i}"]), h))
    return h


def static_forward(
    params: Params,
    xyz_emb,
    dir_emb=None,
    a_emb=None,
    sigma_only: bool = False,
    use_viewdir: bool = True,
    D: int = DEFAULT_D,
    skips: Sequence[int] = DEFAULT_SKIPS,
    compute_dtype=jnp.float32,
):
    """Static branch. Returns (rgb, sigma_raw) or sigma_raw if sigma_only.

    Sigma comes from the tower feature directly; rgb from the post-final
    (optionally view-conditioned) feature (`nerf.py:162-187`). Raw sigma is
    returned (activation happens in the renderer with noise,
    `rendering.py:206-208`).
    """
    x = xyz_emb.astype(compute_dtype)
    h = _tower(params, "static_xyz", x, D, skips, compute_dtype)
    sigma = _linear(params["static_sigma"], h.astype(jnp.float32))[..., 0]
    if sigma_only:
        return sigma
    feat = _linear(jax.tree.map(lambda a: a.astype(compute_dtype),
                                params["static_xyz_final"]), h)
    if use_viewdir:
        parts = [feat, dir_emb.astype(compute_dtype)]
        if a_emb is not None:
            parts.append(a_emb.astype(compute_dtype))
        feat = jax.nn.relu(_linear(
            jax.tree.map(lambda a: a.astype(compute_dtype), params["static_dir"]),
            jnp.concatenate(parts, -1)))
    rgb = jax.nn.sigmoid(_linear(params["static_rgb"], feat.astype(jnp.float32)))
    return rgb, sigma


def transient_forward(
    params: Params,
    xyz_emb,
    t_emb,
    output_flow: Tuple[str, ...] = (),
    sigma_only: bool = False,
    flow_scale: float = 0.2,
    D: int = DEFAULT_D,
    skips: Sequence[int] = DEFAULT_SKIPS,
    compute_dtype=jnp.float32,
):
    """Transient branch. Returns a dict with 'rgb', 'sigma' (raw) and
    optionally 'flow_fw'/'flow_bw' (`nerf.py:192-213`).

    In sigma_only mode only 'sigma' is computed (`nerf.py:173-180`).
    """
    inp = jnp.concatenate([xyz_emb, t_emb], -1).astype(compute_dtype)
    h = _tower(params, "transient_xyz", inp, D, skips, compute_dtype)
    feat = _linear(jax.tree.map(lambda a: a.astype(compute_dtype),
                                params["transient_xyz_final"]), h)
    out = {"sigma": _linear(params["transient_sigma"],
                            feat.astype(jnp.float32))[..., 0]}
    if sigma_only:
        return out
    out["rgb"] = jax.nn.sigmoid(
        _linear(params["transient_rgb"], feat.astype(jnp.float32)))
    feat32 = feat.astype(jnp.float32)
    if "fw" in output_flow:
        out["flow_fw"] = flow_scale * jnp.tanh(
            _linear(params["transient_flow_fw"], feat32))
    if "bw" in output_flow:
        out["flow_bw"] = flow_scale * jnp.tanh(
            _linear(params["transient_flow_bw"], feat32))
    return out


# ---------------------------------------------------------------------------
# trainable per-frame latent tables (torch nn.Embedding equivalents,
# train.py:53,57)
# ---------------------------------------------------------------------------

def init_embedding(rng, n: int, dim: int, dtype=jnp.float32):
    """nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(rng, (n, dim), dtype)


def embedding_lookup(table, idx):
    return jnp.take(table, idx, axis=0)


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
