"""Fused compositing kernel vs the pure-JAX reference path
(ops/compositing.py): forward outputs and packed-input gradients must
match (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.ops import compositing as cp
from nsff_pl_tpu.ops.compositing_kernel import make_fused_compositing

N, S = 12, 16


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    packed = jnp.asarray(rng.randn(N, S, 16).astype(np.float32))
    zs = jnp.asarray(np.sort(rng.rand(N, S).astype(np.float32), -1))
    noise_s = jnp.asarray(rng.randn(N, S).astype(np.float32) * 0.1)
    noise_t = jnp.asarray(rng.randn(N, S).astype(np.float32) * 0.1)
    return packed, zs, noise_s, noise_t


def _reference(packed, zs, noise_s, noise_t):
    """The existing XLA path, written with ops/compositing.py."""
    d_s, d_t = cp.deltas_from_zs(zs)
    s_s = cp.softplus(packed[..., 3] + noise_s)
    s_t = cp.softplus(packed[..., 7] + noise_t)
    a_s = 1.0 - jnp.exp(-d_s * s_s)
    a_t = 1.0 - jnp.exp(-d_t * s_t)
    w_s, w_t, w, trans = cp.composite_two_fields(a_s, a_t)
    rgb = (cp.weighted_sum(w_s, packed[..., 0:3])
           + cp.weighted_sum(w_t, packed[..., 4:7]))
    depth = cp.weighted_sum(w, zs)
    return {"static_sigmas": s_s, "transient_sigmas": s_t,
            "static_alphas": a_s, "transient_alphas": a_t,
            "static_weights": w_s, "transient_weights": w_t,
            "weights": w, "rgb": rgb, "depth": depth}


def test_forward_matches_reference():
    packed, zs, ns, nt = _inputs()
    fused = make_fused_compositing(S, block_rays=8)
    got = fused(packed, zs, ns, nt)
    ref = _reference(packed, zs, ns, nt)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-5, err_msg=k)


@pytest.mark.parametrize("which", ["maps", "weights", "all"])
def test_gradients_match_reference(which):
    packed, zs, ns, nt = _inputs(1)
    fused = make_fused_compositing(S, block_rays=8)

    def scalarize(out):
        if which == "maps":
            return jnp.sum(out["rgb"] * 1.3) + jnp.sum(out["depth"] * 0.7)
        if which == "weights":
            return (jnp.sum(out["weights"] ** 2)
                    + jnp.sum(out["static_weights"] * 0.5)
                    + jnp.sum(jnp.sin(out["transient_weights"])))
        return sum(jnp.sum(v * (i + 1)) for i, v in
                   enumerate(out[k] for k in sorted(out)))

    g_fused = jax.grad(lambda p: scalarize(fused(p, zs, ns, nt)))(packed)
    g_ref = jax.grad(lambda p: scalarize(_reference(p, zs, ns, nt)))(packed)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=3e-5)


def test_ray_padding():
    """N not divisible by block_rays pads and trims correctly."""
    rng = np.random.RandomState(2)
    n = 11
    packed = jnp.asarray(rng.randn(n, S, 16).astype(np.float32))
    zs = jnp.asarray(np.sort(rng.rand(n, S).astype(np.float32), -1))
    z0 = jnp.zeros((n, S))
    fused = make_fused_compositing(S, block_rays=8)
    got = fused(packed, zs, z0, z0)
    ref = _reference(packed, zs, z0, z0)
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               np.asarray(ref["weights"]), atol=2e-5)
    assert got["rgb"].shape == (n, 3)


def test_render_rays_fused_comp_equivalence():
    """render_rays(train, pallas backend) with fused_compositing on/off:
    identical result values and parameter gradients (same RNG keys =>
    identical sigma noise)."""
    import dataclasses

    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    params = {
        "fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=False, encode_transient=True,
            in_channels_t=16, output_flow=True),
    }
    emb = {"t": nerf_m.init_embedding(ks[1], 4, 16)}
    rng = np.random.RandomState(0)
    n = 16
    rays = np.concatenate(
        [rng.rand(n, 2).astype(np.float32) - 0.5, -np.ones((n, 1), np.float32),
         (rng.rand(n, 2).astype(np.float32) - 0.5) * 0.2,
         2 * np.ones((n, 1), np.float32)], -1)
    rays = jnp.asarray(rays)
    ts = jnp.asarray(rng.randint(0, 4, (n,)), jnp.int32)

    base = RenderConfig(N_samples=8, use_viewdir=False, encode_t=True,
                        N_tau=16, max_t=3, img_wh=(8, 8),
                        train_backend="pallas")

    def run(fused):
        cfg = dataclasses.replace(base, fused_compositing=fused)

        def f(p):
            out = render_rays(p, emb, rays, ts, jax.random.PRNGKey(7), cfg,
                              test_time=False, output_transient=True,
                              output_transient_flow=("fw", "bw", "disocc"))
            loss = (jnp.sum(out["rgb_fine"] ** 2)
                    + jnp.sum(out["depth_fine"])
                    + jnp.sum(out["transient_weights_fine"] * 0.3)
                    + jnp.sum(out["rgb_fw"]) + jnp.sum(out["rgb_bw"])
                    + jnp.sum(jnp.abs(out["xyzs_fw_bw"] - out["xyzs_fine"])))
            return loss, out

        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, out, grads

    l0, o0, g0 = run(False)
    l1, o1, g1 = run(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for k in ("rgb_fine", "depth_fine", "weights_fine",
              "static_weights_fine", "transient_weights_fine",
              "static_sigmas_fine", "transient_sigmas_fine", "rgb_fw",
              "disocc_fw"):
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                   atol=3e-5, err_msg=k)
    for (p0, p1) in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=5e-4)
