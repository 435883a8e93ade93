"""Notebook drift guard.

The reference's `test.ipynb` accumulated stale result keys as the
renderer evolved (SURVEY.md §2: cell 4 references keys no longer
produced). Guard ours: every code cell must parse, the import cell must
execute against the current package, and every `out[...]` result key the
cells reference must be produced by the current `render_rays`.
"""
import ast
import json
import os
import re

NB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "notebooks", "test.ipynb")


def _cells():
    with open(NB_PATH) as f:
        nb = json.load(f)
    return [("".join(c["source"]), c["cell_type"]) for c in nb["cells"]]


def test_notebook_cells_parse():
    for i, (src, kind) in enumerate(_cells()):
        if kind == "code":
            ast.parse(src)  # raises on syntax errors


def test_notebook_imports_execute():
    for src, kind in _cells():
        if kind == "code" and "import" in src and "NSFFConfig" in src:
            exec(src.replace('sys.path.insert(0, "..")', ""), {})
            return
    raise AssertionError("import cell not found")


def test_notebook_result_keys_exist():
    """Every out['...'] key used by the notebook must be a key
    render_rays actually produces in test-time mode."""
    import jax
    import jax.numpy as jnp

    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

    keys_used = set()
    for src, kind in _cells():
        if kind == "code":
            keys_used |= set(re.findall(r"out\[[\"']([a-z_]+)[\"']\]", src))
    assert keys_used, "no result keys referenced?"

    k = jax.random.PRNGKey(0)
    params = {"fine": nerf_m.init_nerf_params(
        k, "fine", use_viewdir=True, encode_transient=True,
        in_channels_t=8, output_flow=True)}
    emb = {"t": nerf_m.init_embedding(k, 3, 8)}
    rays = jnp.concatenate([jnp.zeros((4, 2)), -jnp.ones((4, 1)),
                            jnp.zeros((4, 2)), 2 * jnp.ones((4, 1))], -1)
    cfg = RenderConfig(N_samples=8, use_viewdir=True, encode_t=True,
                       N_tau=8, max_t=2, img_wh=(4, 4))
    out = render_rays(params, emb, rays, jnp.zeros((4,), jnp.int32),
                      k, cfg, test_time=True, output_transient=True,
                      output_transient_flow=("fw", "bw"))
    missing = keys_used - set(out)
    assert not missing, f"notebook references stale result keys: {missing}"
