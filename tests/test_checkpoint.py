"""Checkpoint tests: orbax roundtrip, Lightning importer key mapping +
transpose, non-strict merge (`utils/__init__.py:82-104` semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.models import nerf as M
from nsff_pl_tpu.training import checkpoint as C


def test_orbax_roundtrip(tmp_path):
    state = {
        "params": {"a": jnp.arange(6.0).reshape(2, 3),
                   "b": {"w": jnp.ones((4,))}},
        "step": jnp.asarray(7),
    }
    path = C.save_checkpoint(str(tmp_path), 7, state)
    restored = C.restore_checkpoint(path, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(restored["params"]["a"]),
                               np.asarray(state["params"]["a"]))
    assert int(restored["step"]) == 7


def test_latest_checkpoint(tmp_path):
    assert C.latest_checkpoint(str(tmp_path)) is None
    s = {"x": jnp.zeros(2)}
    C.save_checkpoint(str(tmp_path), 5, s)
    C.save_checkpoint(str(tmp_path), 50, s)
    C.save_checkpoint(str(tmp_path), 9, s)
    assert C.latest_checkpoint(str(tmp_path)).endswith("step_50")


def _fake_pl_ckpt(tmp_path, with_coarse=False):
    """Build a torch state_dict with the reference's module names
    (nerf.py:74-116, train.py:47-59)."""
    import torch

    sd = {}

    def lin(name, fin, fout):
        sd[f"{name}.weight"] = torch.randn(fout, fin)
        sd[f"{name}.bias"] = torch.randn(fout)

    def tower(model, prefix, in0):
        for i in range(8):
            fin = in0 if i == 0 else (256 + in0 if i == 4 else 256)
            lin(f"{model}.{prefix}_xyz_encoding_{i+1}.0", fin, 256)
        lin(f"{model}.{prefix}_xyz_encoding_final", 256, 256)
        lin(f"{model}.{prefix}_sigma", 256, 1)
        lin(f"{model}.{prefix}_rgb.0", 256, 3)

    tower("nerf_fine", "static", 63)
    lin("nerf_fine.static_dir_encoding.0", 256 + 27, 256)
    tower("nerf_fine", "transient", 63 + 48)
    lin("nerf_fine.transient_flow_fw.0", 256, 3)
    lin("nerf_fine.transient_flow_bw.0", 256, 3)
    sd["embedding_t.weight"] = torch.randn(30, 48)
    sd["loss.Ks"] = torch.randn(1, 3, 3)  # must be filtered out
    if with_coarse:
        tower("nerf_coarse", "static", 63)

    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd}, path)
    return path, sd


def test_pl_import_maps_and_transposes(tmp_path):
    path, sd = _fake_pl_ckpt(tmp_path)
    params = C.import_pl_checkpoint(path)
    assert set(params) == {"nerf_fine", "embedding_t"}
    w = np.asarray(params["nerf_fine"]["static_xyz_0"]["w"])
    ref = sd["nerf_fine.static_xyz_encoding_1.0.weight"].numpy()
    np.testing.assert_allclose(w, ref.T)
    assert params["nerf_fine"]["static_xyz_4"]["w"].shape == (319, 256)
    assert params["nerf_fine"]["transient_xyz_0"]["w"].shape == (111, 256)
    assert params["embedding_t"].shape == (30, 48)
    # 'loss' prefix filtered (opt.py:70-71 default)
    assert not any("Ks" in k for k in params["nerf_fine"])


def test_pl_import_forward_equivalence(tmp_path):
    """Imported weights produce the same static MLP output as torch."""
    import torch

    path, sd = _fake_pl_ckpt(tmp_path)
    params = C.import_pl_checkpoint(path)["nerf_fine"]

    x = np.random.RandomState(0).randn(5, 63).astype(np.float32)
    # torch forward of the static tower + sigma head
    h = torch.from_numpy(x)
    for i in range(8):
        if i == 4:
            h = torch.cat([torch.from_numpy(x), h], -1)
        W = sd[f"nerf_fine.static_xyz_encoding_{i+1}.0.weight"]
        b = sd[f"nerf_fine.static_xyz_encoding_{i+1}.0.bias"]
        h = torch.relu(h @ W.T + b)
    sigma_t = (h @ sd["nerf_fine.static_sigma.weight"].T
               + sd["nerf_fine.static_sigma.bias"]).detach().numpy()[:, 0]

    sigma_j = np.asarray(M.static_forward(params, jnp.asarray(x),
                                          sigma_only=True))
    np.testing.assert_allclose(sigma_j, sigma_t, atol=1e-4, rtol=1e-4)


def test_merge_params_partial():
    init = {"a": {"w": jnp.zeros(3)}, "b": jnp.zeros(2)}
    loaded = {"a": {"w": jnp.ones(3)}}
    merged = C.merge_params(init, loaded)
    np.testing.assert_allclose(np.asarray(merged["a"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["b"]), 0.0)


def test_ranger_state_checkpoint_roundtrip(tmp_path):
    """Orbax must round-trip the ranger optimizer's LookaheadState
    (inner RAdam state + slow weights + count) so --ckpt_path resume
    works for every optimizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.training import checkpoint as ckpt_lib
    from nsff_pl_tpu.training.optim import make_optimizer

    cfg = NSFFConfig(optimizer="ranger", lr=1e-2, lr_scheduler="cosine",
                     num_epochs=4)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    state = tx.init(params)
    for _ in range(3):
        grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    path = ckpt_lib.save_checkpoint(str(tmp_path), 3,
                                    {"params": params, "opt": state})
    restored = ckpt_lib.restore_checkpoint(
        path, {"params": params, "opt": state})
    for a, b in zip(jax.tree.leaves(restored["opt"]),
                    jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state must keep stepping (structure intact)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    tx.update(grads, restored["opt"], restored["params"])


@pytest.mark.parametrize("optimizer", ["adam", "ranger"])
def test_save_weights_only_tool(tmp_path, optimizer):
    """tools/save_weights_only strips full training checkpoints to bare
    params for ANY optimizer (the orbax path restores the raw on-disk
    tree — an abstract-pytree restore broke on ranger's LookaheadState)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tools.save_weights_only as swo
    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.training import checkpoint as ckpt_lib
    from nsff_pl_tpu.training.optim import make_optimizer
    from nsff_pl_tpu.training.step import TrainState

    params = {"nerf_fine": nerf_m.init_nerf_params(
        jax.random.PRNGKey(0), "fine", use_viewdir=False,
        encode_transient=True, in_channels_t=8, output_flow=True)}
    tx = make_optimizer(NSFFConfig(optimizer=optimizer), 1)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    ckpt = ckpt_lib.save_checkpoint(
        str(tmp_path / "full"), 1,
        {"state": state, "sampling_weights": np.ones((3, 64), np.float32)})

    out = str(tmp_path / "stripped")
    swo.main(["--ckpt_path", ckpt, "--out", out])

    restored = ckpt_lib.restore_checkpoint(out, {"params": params})
    a = np.asarray(params["nerf_fine"]["static_xyz_0"]["w"])
    b = np.asarray(restored["params"]["nerf_fine"]["static_xyz_0"]["w"])
    np.testing.assert_array_equal(a, b)
