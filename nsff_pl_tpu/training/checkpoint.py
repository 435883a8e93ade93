"""Checkpointing: Orbax save/restore + PyTorch-Lightning checkpoint import.

Replaces the reference's Lightning `ModelCheckpoint` + non-strict
prefix-filtered `load_ckpt` (`train.py:279-280`, `utils/__init__.py:82-104`).
Also fixes the reference's known gap: hard-sampling weights ARE
checkpointed here (TODO at `datasets/monocular.py:235`).

The PL importer maps a reference `.ckpt` (torch state_dict) onto our
parameter pytree for cross-framework parity testing — torch Linear stores
(out, in) weights, ours are (in, out), so weights transpose on import.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax
# ---------------------------------------------------------------------------

_CKPTR = None


def _checkpointer():
    """Singleton StandardCheckpointer, closed at exit so async commit
    threads finish before interpreter shutdown."""
    global _CKPTR
    if _CKPTR is None:
        import atexit

        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(_CKPTR.close)
    return _CKPTR


def save_checkpoint(ckpt_dir: str, step: int, state: Dict[str, Any]) -> str:
    """Save a pytree (params/opt_state/step/sampling weights) under
    `ckpt_dir/step_<n>`. Returns the path."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_checkpoint(path: str, abstract_state: Dict[str, Any]):
    """Restore a pytree saved by `save_checkpoint`. `abstract_state` is a
    matching pytree of arrays (or ShapeDtypeStructs) defining structure."""
    return _checkpointer().restore(os.path.abspath(path), abstract_state)


def save_weights_only(ckpt_path: str, out_path: str,
                      abstract_state: Dict[str, Any]) -> str:
    """Strip a full checkpoint to bare params — the analog of
    `utils/save_weights_only.py:12-15`."""
    state = restore_checkpoint(ckpt_path, abstract_state)
    _checkpointer().save(os.path.abspath(out_path), {"params": state["params"]},
                         force=True)
    return out_path


# ---------------------------------------------------------------------------
# PyTorch-Lightning checkpoint import (reference ckpts, e.g. kid.ckpt)
# ---------------------------------------------------------------------------

# reference module name -> our param key, for each NeRF
# (models/nerf.py:74-116; Sequential(Linear, act) layers expose `.0.weight`)
def _map_nerf_keys(sd: Dict[str, np.ndarray], model_name: str) -> Dict[str, Dict[str, np.ndarray]]:
    out: Dict[str, Dict[str, np.ndarray]] = {}

    def put(ours: str, w_key: str, b_key: str):
        if w_key in sd:
            out[ours] = {"w": sd[w_key].T.copy(), "b": sd[b_key].copy()}

    for i in range(8):
        put(f"static_xyz_{i}",
            f"{model_name}.static_xyz_encoding_{i+1}.0.weight",
            f"{model_name}.static_xyz_encoding_{i+1}.0.bias")
        put(f"transient_xyz_{i}",
            f"{model_name}.transient_xyz_encoding_{i+1}.0.weight",
            f"{model_name}.transient_xyz_encoding_{i+1}.0.bias")
    put("static_xyz_final", f"{model_name}.static_xyz_encoding_final.weight",
        f"{model_name}.static_xyz_encoding_final.bias")
    put("static_dir", f"{model_name}.static_dir_encoding.0.weight",
        f"{model_name}.static_dir_encoding.0.bias")
    put("static_sigma", f"{model_name}.static_sigma.weight",
        f"{model_name}.static_sigma.bias")
    put("static_rgb", f"{model_name}.static_rgb.0.weight",
        f"{model_name}.static_rgb.0.bias")
    put("transient_xyz_final",
        f"{model_name}.transient_xyz_encoding_final.weight",
        f"{model_name}.transient_xyz_encoding_final.bias")
    put("transient_sigma", f"{model_name}.transient_sigma.weight",
        f"{model_name}.transient_sigma.bias")
    put("transient_rgb", f"{model_name}.transient_rgb.0.weight",
        f"{model_name}.transient_rgb.0.bias")
    put("transient_flow_fw", f"{model_name}.transient_flow_fw.0.weight",
        f"{model_name}.transient_flow_fw.0.bias")
    put("transient_flow_bw", f"{model_name}.transient_flow_bw.0.weight",
        f"{model_name}.transient_flow_bw.0.bias")
    return out


def load_pl_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """torch.load a Lightning ckpt (or bare state_dict) to numpy arrays
    (`utils/__init__.py:82-96`)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def import_pl_checkpoint(ckpt_path: str,
                         prefixes_to_ignore: Optional[List[str]] = None
                         ) -> Dict[str, Any]:
    """Convert a reference Lightning checkpoint into our params pytree.

    Returns {'nerf_fine': ..., 'nerf_coarse'?: ..., 'embedding_a'?: (N, C),
    'embedding_t'?: (N, C)} with torch (out,in) weights transposed to our
    (in,out) layout. Keys under `prefixes_to_ignore` are dropped
    (`opt.py:70-71`, default ['loss'])."""
    prefixes_to_ignore = prefixes_to_ignore or ["loss"]
    sd = load_pl_state_dict(ckpt_path)
    sd = {k: v for k, v in sd.items()
          if not any(k.startswith(p) for p in prefixes_to_ignore)}

    params: Dict[str, Any] = {}
    fine = _map_nerf_keys(sd, "nerf_fine")
    if fine:
        params["nerf_fine"] = fine
    coarse = _map_nerf_keys(sd, "nerf_coarse")
    if coarse:
        params["nerf_coarse"] = coarse
    if "embedding_a.weight" in sd:
        params["embedding_a"] = sd["embedding_a.weight"].copy()
    if "embedding_t.weight" in sd:
        params["embedding_t"] = sd["embedding_t.weight"].copy()
    return jax.tree.map(jnp.asarray, params)


def merge_params(init_params, loaded_params):
    """Non-strict partial load: overwrite matching leaves, keep the rest
    (the reference's `load_ckpt` semantics, `utils/__init__.py:98-104`)."""
    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            return {k: merge(a[k], b[k]) if k in b else a[k] for k in a}
        return b if b is not None else a

    return merge(init_params, loaded_params)
