"""Cross-framework golden harness (round-1 verdict item #6a).

Constructs a synthetic torch-layout Lightning checkpoint (the exact key
naming/shapes of the reference `models/nerf.py:74-116`), imports it
through `import_pl_checkpoint`, renders with our `render_rays`, and
asserts the outputs against an INDEPENDENT float64 NumPy
re-implementation of the reference forward equations
(`models/nerf.py:143-213` MLP + `models/rendering.py:200-260`
compositing). This pins the whole torch->JAX path: key mapping, weight
transposes, posenc ordering, tower topology, head activations, flow
zeroing past z_far, and the NeRF-W additive compositing — without
needing reference weights or real data in the image.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

D, W = 8, 256
N_EMB_XYZ, S_EMB_XYZ = 10, 9.0
N_EMB_DIR, S_EMB_DIR = 4, 3.0
IN_XYZ = 3 + 6 * N_EMB_XYZ  # 63
IN_DIR = 3 + 6 * N_EMB_DIR  # 27
N_TAU = 16
N_FRAMES = 4
FLOW_SCALE = 0.2
Z_FAR = 0.95


# ---------------------------------------------------------------------------
# synthetic torch-layout checkpoint
# ---------------------------------------------------------------------------

def make_torch_ckpt(path, rng, n_tau=N_TAU, n_frames=N_FRAMES):
    import torch

    sd = {}

    def lin(name, cin, cout):
        sd[name + ".weight"] = torch.tensor(
            (rng.randn(cout, cin) / np.sqrt(cin)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(
            (rng.randn(cout) * 0.01).astype(np.float32))

    for i in range(D):
        cin = IN_XYZ if i == 0 else (W + IN_XYZ if i == 4 else W)
        lin(f"nerf_fine.static_xyz_encoding_{i+1}.0", cin, W)
        cin_t = (IN_XYZ + n_tau if i == 0
                 else (W + IN_XYZ + n_tau if i == 4 else W))
        lin(f"nerf_fine.transient_xyz_encoding_{i+1}.0", cin_t, W)
    lin("nerf_fine.static_xyz_encoding_final", W, W)
    lin("nerf_fine.static_dir_encoding.0", W + IN_DIR, W)
    lin("nerf_fine.static_sigma", W, 1)
    lin("nerf_fine.static_rgb.0", W, 3)
    lin("nerf_fine.transient_xyz_encoding_final", W, W)
    lin("nerf_fine.transient_sigma", W, 1)
    lin("nerf_fine.transient_rgb.0", W, 3)
    lin("nerf_fine.transient_flow_fw.0", W, 3)
    lin("nerf_fine.transient_flow_bw.0", W, 3)
    sd["embedding_t.weight"] = torch.tensor(
        (rng.randn(n_frames, n_tau) * 0.1).astype(np.float32))
    # loss buffers must be dropped by prefixes_to_ignore (opt.py:70-71)
    sd["loss.Ks"] = torch.zeros(1, 3, 3)
    torch.save({"state_dict": sd}, path)
    return {k: v.numpy().astype(np.float64) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# independent float64 reference (the reference equations, re-derived)
# ---------------------------------------------------------------------------

def np_posenc(x, n_freqs, max_log):
    """PosEmbedding order [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
    with freqs 2**linspace(0, max_log, n_freqs) (nerf.py:4-30)."""
    freqs = 2.0 ** np.linspace(0, max_log, n_freqs)
    out = [x]
    for f in freqs:
        out += [np.sin(f * x), np.cos(f * x)]
    return np.concatenate(out, -1)


def ref_forward(sd, xyz, dirs, t_emb, zs):
    """Reference fine-model forward + test-time compositing in f64.

    xyz: (N, S, 3); dirs: (N, 3); t_emb: (N, N_TAU); zs: (N, S).
    Returns dict with rgb_fine/depth_fine/sigmas/flows.
    """
    relu = lambda v: np.maximum(v, 0.0)  # noqa: E731
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
    softplus = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)  # noqa: E731

    def L(name, v):
        return v @ sd[f"nerf_fine.{name}.weight"].T + sd[f"nerf_fine.{name}.bias"]

    n, s = xyz.shape[:2]
    xyz_emb = np_posenc(xyz.reshape(-1, 3), N_EMB_XYZ, S_EMB_XYZ)
    dir_emb = np.repeat(np_posenc(dirs, N_EMB_DIR, S_EMB_DIR), s, axis=0)
    t_rows = np.repeat(t_emb, s, axis=0)

    # static tower (nerf.py:163-169 + heads :170-189)
    h = xyz_emb
    for i in range(D):
        if i == 4:
            h = np.concatenate([xyz_emb, h], -1)
        h = relu(L(f"static_xyz_encoding_{i+1}.0", h))
    static_sigma = L("static_sigma", h)[:, 0]
    feat = L("static_xyz_encoding_final", h)
    feat = relu(L("static_dir_encoding.0",
                  np.concatenate([feat, dir_emb], -1)))
    static_rgb = sigmoid(L("static_rgb.0", feat))

    # transient tower (nerf.py:193-208); skip re-concats [xyz, t, h]
    inp_t = np.concatenate([xyz_emb, t_rows], -1)
    ht = inp_t
    for i in range(D):
        if i == 4:
            ht = np.concatenate([inp_t, ht], -1)
        ht = relu(L(f"transient_xyz_encoding_{i+1}.0", ht))
    tfeat = L("transient_xyz_encoding_final", ht)
    tr_sigma = L("transient_sigma", tfeat)[:, 0]
    tr_rgb = sigmoid(L("transient_rgb.0", tfeat))
    fw = FLOW_SCALE * np.tanh(L("transient_flow_fw.0", tfeat))
    bw = FLOW_SCALE * np.tanh(L("transient_flow_bw.0", tfeat))
    # flow zeroed past z_far (rendering.py:316,126,187-188)
    far = (zs.reshape(-1) > Z_FAR)[:, None]
    fw = np.where(far, 0.0, fw)
    bw = np.where(far, 0.0, bw)

    shape2 = (n, s)
    static_sigma = static_sigma.reshape(shape2)
    tr_sigma = tr_sigma.reshape(shape2)
    static_rgb = static_rgb.reshape(n, s, 3)
    tr_rgb = tr_rgb.reshape(n, s, 3)

    # compositing (rendering.py:202-260), test-time => no noise
    deltas = zs[:, 1:] - zs[:, :-1]
    sd_deltas = np.concatenate([deltas, 100 * np.ones_like(zs[:, :1])], -1)
    td_deltas = np.concatenate([deltas, 1e-3 * np.ones_like(zs[:, :1])], -1)
    ssig = softplus(static_sigma)
    tsig = softplus(tr_sigma)
    sa = 1 - np.exp(-sd_deltas * ssig)
    ta = 1 - np.exp(-td_deltas * tsig)
    alphas = 1 - (1 - sa) * (1 - ta)
    shifted = np.concatenate([np.ones_like(alphas[:, :1]),
                              1 - alphas[:, :-1]], -1)
    trans = np.cumprod(shifted, -1)
    sw, tw, w = sa * trans, ta * trans, alphas * trans
    rgb = (sw[..., None] * static_rgb).sum(1) + (tw[..., None] * tr_rgb).sum(1)
    depth = (w * zs).sum(1)
    return {"rgb_fine": rgb, "depth_fine": depth,
            "static_sigmas": static_sigma, "transient_sigmas": tr_sigma,
            "flows_fw": fw.reshape(n, s, 3), "flows_bw": bw.reshape(n, s, 3)}


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

def test_render_matches_reference_equations(tmp_path):
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
    from nsff_pl_tpu.training.checkpoint import import_pl_checkpoint

    rng = np.random.RandomState(7)
    ckpt = os.path.join(str(tmp_path), "synthetic.ckpt")
    sd = make_torch_ckpt(ckpt, rng)

    params = import_pl_checkpoint(ckpt)
    assert set(params) == {"nerf_fine", "embedding_t"}  # 'loss.' dropped
    assert params["nerf_fine"]["static_xyz_0"]["w"].shape == (IN_XYZ, W)

    n, s = 16, 16
    rays_o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    rays_o[:, 2] = -1.0
    rays_d = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    rays_d[:, 2] = 2.0
    rays = jnp.asarray(np.concatenate([rays_o, rays_d], -1))
    ts = jnp.asarray(rng.randint(0, N_FRAMES, (n,)), jnp.int32)

    cfg = RenderConfig(N_samples=s, N_importance=0, perturb=0.0,
                       noise_std=0.0, use_viewdir=True, encode_a=False,
                       encode_t=True, N_tau=N_TAU, max_t=N_FRAMES - 1,
                       img_wh=(16, 16))
    out = render_rays(
        {"fine": params["nerf_fine"]}, {"t": params["embedding_t"]},
        rays, ts, jax.random.PRNGKey(0), cfg, test_time=True,
        output_transient=True, output_transient_flow=("fw", "bw"))

    # independent reference: same points, f64
    zs = np.broadcast_to(np.linspace(0, 1, s, dtype=np.float32), (n, s))
    xyz = rays_o[:, None] + rays_d[:, None] * zs[..., None]
    t_emb = sd["embedding_t.weight"][np.asarray(ts)]
    ref = ref_forward(sd, xyz.astype(np.float64), rays_d.astype(np.float64),
                      t_emb, zs.astype(np.float64))

    np.testing.assert_allclose(np.asarray(out["zs_fine"]), zs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["static_sigmas_fine"]),
                               np.log1p(np.exp(ref["static_sigmas"])),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["transient_flows_fw"]),
                               ref["flows_fw"], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["transient_flows_bw"]),
                               ref["flows_bw"], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               ref["rgb_fine"], atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["depth_fine"]),
                               ref["depth_fine"], atol=5e-4)


def test_importer_roundtrips_through_merge(tmp_path):
    """import + merge_params keeps non-checkpoint leaves (non-strict
    partial load, utils/__init__.py:98-104)."""
    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.training.checkpoint import (import_pl_checkpoint,
                                                 merge_params)

    rng = np.random.RandomState(3)
    ckpt = os.path.join(str(tmp_path), "partial.ckpt")
    make_torch_ckpt(ckpt, rng)
    init = {
        "nerf_fine": nerf_m.init_nerf_params(
            jax.random.PRNGKey(0), "fine", use_viewdir=True,
            encode_transient=True, in_channels_t=N_TAU, output_flow=True),
        "embedding_t": nerf_m.init_embedding(jax.random.PRNGKey(1),
                                             N_FRAMES, N_TAU),
        "embedding_a": nerf_m.init_embedding(jax.random.PRNGKey(2),
                                             N_FRAMES, 48),
    }
    loaded = import_pl_checkpoint(ckpt)
    merged = merge_params(init, loaded)
    # loaded leaves replaced, missing leaves kept
    assert np.allclose(np.asarray(merged["embedding_t"]),
                       np.asarray(loaded["embedding_t"]))
    assert np.allclose(np.asarray(merged["embedding_a"]),
                       np.asarray(init["embedding_a"]))
    w_loaded = np.asarray(loaded["nerf_fine"]["static_rgb"]["w"])
    assert np.allclose(np.asarray(merged["nerf_fine"]["static_rgb"]["w"]),
                       w_loaded)


# ---------------------------------------------------------------------------
# train-time golden: 3-frame scene-flow warping + disocclusion
# ---------------------------------------------------------------------------

def _np_static_tower(sd, xyz_emb, dir_emb):
    relu = lambda v: np.maximum(v, 0.0)  # noqa: E731
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731

    def L(name, v):
        return v @ sd[f"nerf_fine.{name}.weight"].T \
            + sd[f"nerf_fine.{name}.bias"]

    h = xyz_emb
    for i in range(D):
        if i == 4:
            h = np.concatenate([xyz_emb, h], -1)
        h = relu(L(f"static_xyz_encoding_{i+1}.0", h))
    sigma = L("static_sigma", h)[:, 0]
    feat = L("static_xyz_encoding_final", h)
    feat = relu(L("static_dir_encoding.0",
                  np.concatenate([feat, dir_emb], -1)))
    return sigmoid(L("static_rgb.0", feat)), sigma


def _np_transient_tower(sd, xyz_emb, t_rows, flows=("fw", "bw")):
    relu = lambda v: np.maximum(v, 0.0)  # noqa: E731
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731

    def L(name, v):
        return v @ sd[f"nerf_fine.{name}.weight"].T \
            + sd[f"nerf_fine.{name}.bias"]

    inp = np.concatenate([xyz_emb, t_rows], -1)
    h = inp
    for i in range(D):
        if i == 4:
            h = np.concatenate([inp, h], -1)
        h = relu(L(f"transient_xyz_encoding_{i+1}.0", h))
    feat = L("transient_xyz_encoding_final", h)
    out = {"sigma": L("transient_sigma", feat)[:, 0],
           "rgb": sigmoid(L("transient_rgb.0", feat))}
    for f in flows:
        out[f] = FLOW_SCALE * np.tanh(L(f"transient_flow_{f}.0", feat))
    return out


def test_warped_render_matches_reference_equations(tmp_path):
    """Train-time golden for the 3-frame scene-flow warping path
    (`rendering.py:98-140` render_transient_warping, call sites
    `:217-232`, disocclusion `:289-295`): rgb_fw/rgb_bw composite the
    warped transient field (t±1 embeddings, flow-displaced xyz) against
    the CURRENT static field sharing one warped transmittance; disocc
    maps are 1-|Σ(warped_w - w)|. Asserted against an independent f64
    NumPy re-derivation, perturb=0 noise=0."""
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
    from nsff_pl_tpu.training.checkpoint import import_pl_checkpoint

    rng = np.random.RandomState(11)
    ckpt = os.path.join(str(tmp_path), "synthetic_warp.ckpt")
    sd = make_torch_ckpt(ckpt, rng)
    params = import_pl_checkpoint(ckpt)

    n, s = 12, 16
    rays_o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    rays_o[:, 2] = -1.0
    rays_d = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    rays_d[:, 2] = 2.0
    rays = jnp.asarray(np.concatenate([rays_o, rays_d], -1))
    ts_np = rng.randint(0, N_FRAMES, (n,))
    ts = jnp.asarray(ts_np, jnp.int32)

    cfg = RenderConfig(N_samples=s, N_importance=0, perturb=0.0,
                       noise_std=0.0, use_viewdir=True, encode_t=True,
                       N_tau=N_TAU, max_t=N_FRAMES - 1, img_wh=(16, 16))
    out = render_rays(
        {"fine": params["nerf_fine"]}, {"t": params["embedding_t"]},
        rays, ts, jax.random.PRNGKey(0), cfg, test_time=False,
        output_transient=True, output_transient_flow=("fw", "bw", "disocc"))

    # ---- independent f64 derivation --------------------------------
    softplus = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)  # noqa: E731
    zs = np.broadcast_to(
        np.linspace(0, 1, s), (n, s)).astype(np.float64)
    xyz = rays_o.astype(np.float64)[:, None] \
        + rays_d.astype(np.float64)[:, None] * zs[..., None]
    far = (zs.reshape(-1) > Z_FAR)[:, None]

    xyz_emb = np_posenc(xyz.reshape(-1, 3), N_EMB_XYZ, S_EMB_XYZ)
    dir_emb = np.repeat(
        np_posenc(rays_d.astype(np.float64), N_EMB_DIR, S_EMB_DIR), s, 0)
    emb_t = sd["embedding_t.weight"]
    t_rows = np.repeat(emb_t[ts_np], s, axis=0)

    static_rgbs, static_sigma = _np_static_tower(sd, xyz_emb, dir_emb)
    static_rgbs = static_rgbs.reshape(n, s, 3)
    tr = _np_transient_tower(sd, xyz_emb, t_rows)
    flows_fw = np.where(far, 0.0, tr["fw"]).reshape(n, s, 3)
    flows_bw = np.where(far, 0.0, tr["bw"]).reshape(n, s, 3)

    deltas = zs[:, 1:] - zs[:, :-1]
    s_deltas = np.concatenate([deltas, 100 * np.ones_like(zs[:, :1])], -1)
    t_deltas = np.concatenate([deltas, 1e-3 * np.ones_like(zs[:, :1])], -1)
    static_alphas = 1 - np.exp(
        -s_deltas * softplus(static_sigma.reshape(n, s)))
    transient_alphas = 1 - np.exp(
        -t_deltas * softplus(tr["sigma"].reshape(n, s)))
    alphas = 1 - (1 - static_alphas) * (1 - transient_alphas)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alphas[:, :1]), 1 - alphas[:, :-1]], -1), -1)
    transient_weights = transient_alphas * trans

    def warped(xyz_w, t_idx, flow_out):
        """rendering.py:98-140: warped transient + CURRENT static."""
        emb_rows = np.repeat(emb_t[t_idx], s, axis=0)
        xw_emb = np_posenc(xyz_w.reshape(-1, 3), N_EMB_XYZ, S_EMB_XYZ)
        trw = _np_transient_tower(sd, xw_emb, emb_rows, flows=(flow_out,))
        flows_w = np.where(far, 0.0, trw[flow_out]).reshape(n, s, 3)
        ta_w = 1 - np.exp(-t_deltas * softplus(trw["sigma"].reshape(n, s)))
        a_w = 1 - (1 - static_alphas) * (1 - ta_w)
        tr_w = np.cumprod(np.concatenate(
            [np.ones_like(a_w[:, :1]), 1 - a_w[:, :-1]], -1), -1)
        sw_w = static_alphas * tr_w
        tw_w = ta_w * tr_w
        rgb_w = (sw_w[..., None] * static_rgbs).sum(1) \
            + (tw_w[..., None] * trw["rgb"].reshape(n, s, 3)).sum(1)
        return rgb_w, flows_w, tw_w

    xyz_fw = xyz + flows_fw
    rgb_fw, flows_fw_bw, tw_fw = warped(
        xyz_fw, np.minimum(ts_np + 1, N_FRAMES - 1), "bw")
    xyz_bw = xyz + flows_bw
    rgb_bw, flows_bw_fw, tw_bw = warped(
        xyz_bw, np.maximum(ts_np - 1, 0), "fw")

    disocc_fw = 1 - np.abs((tw_fw - transient_weights).sum(1))[:, None]
    disocc_bw = 1 - np.abs((tw_bw - transient_weights).sum(1))[:, None]

    np.testing.assert_allclose(np.asarray(out["rgb_fw"]), rgb_fw, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["rgb_bw"]), rgb_bw, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["xyzs_fw_bw"]),
                               xyz_fw + flows_fw_bw, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["xyzs_bw_fw"]),
                               xyz_bw + flows_bw_fw, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["disocc_fw"]), disocc_fw,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["disocc_bw"]), disocc_bw,
                               atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["disoccs_fw"]),
        1 - np.abs(tw_fw - transient_weights)[..., None], atol=5e-4)


# ---------------------------------------------------------------------------
# f64 golden for the MPI space-time interpolation with NONZERO flows
# ---------------------------------------------------------------------------

def _np_interpolate_f64(res_t, res_tp1, dt, K, c2w, w, h):
    """Independent float64 re-implementation of the reference
    `interpolate` (`models/rendering.py:365-460`): per-plane optical flow
    by projecting the (scaled) scene-flowed world points (:404-437), a
    dense bilinear scatter-add softmax splat in 'average' mode
    (`softsplat.py:6-44,303-329`; zero-weight normalizers set to 1,
    :320-322), dt blending with the static planes (:450-455), and
    front-to-back over-compositing (:456-459). Pure NumPy loops — no
    shared code with the production path."""
    xyzs = res_t["xyzs"]  # (hw, S, 3) NDC
    S = xyzs.shape[1]

    c2w4 = np.eye(4)
    c2w4[:3] = c2w
    w2c = np.linalg.inv(c2w4)[:3] * np.array([[1.0], [-1.0], [-1.0]])
    P = K @ w2c  # (3, 4), "right up back" -> image (rendering.py:390-394)

    def ndc2world(xyz):  # ray_utils.py:127-151
        rz = 2.0 / (xyz[..., 2] - 1 - 1e-6)
        rx = -rz * xyz[..., 0] * K[0, 2] / K[0, 0]
        ry = -rz * xyz[..., 1] * K[1, 2] / K[1, 1]
        return np.stack([rx, ry, rz], -1)

    uu = np.tile(np.arange(w, dtype=np.float64), h)      # ray order y*w+x
    vv = np.repeat(np.arange(h, dtype=np.float64), w)

    def plane_flows(flows_3d, scale):
        """(hw, S, 2) optical flow of every sample plane
        (rendering.py:404-414 with the dt scaling of :434-437)."""
        base = ndc2world(xyzs)
        moved = ndc2world(xyzs + flows_3d)
        pt = base + scale * (moved - base)
        hom = np.concatenate([pt, np.ones((*pt.shape[:2], 1))], -1)
        uvd = hom @ P.T
        u, v = uvd[..., 0] / uvd[..., 2], uvd[..., 1] / uvd[..., 2]
        return np.stack([u - uu[:, None], v - vv[:, None]], -1)

    def splat_average(plane, flow):
        """plane (h, w, C), flow (h, w, 2) -> average-mode forward warp
        via the reference's bilinear atomicAdd scatter
        (softsplat.py:6-44)."""
        C = plane.shape[-1]
        acc = np.zeros((h, w, C + 1))
        src = np.concatenate([plane, np.ones((h, w, 1))], -1)
        for y in range(h):
            for x in range(w):
                ox, oy = x + flow[y, x, 0], y + flow[y, x, 1]
                x0, y0 = int(np.floor(ox)), int(np.floor(oy))
                for xi, wx_ in ((x0, x0 + 1.0 - ox), (x0 + 1, ox - x0)):
                    for yi, wy_ in ((y0, y0 + 1.0 - oy), (y0 + 1, oy - y0)):
                        if 0 <= xi < w and 0 <= yi < h:
                            acc[yi, xi] += src[y, x] * wx_ * wy_
        norm = acc[..., -1:]
        norm = np.where(norm == 0.0, 1.0, norm)
        return acc[..., :-1] / norm

    def warp_all(res, flows_key, scale):
        flows = plane_flows(res[flows_key], scale)
        rgba = np.concatenate([res["rgbs"], res["alphas"][..., None]], -1)
        out = np.empty((S, h, w, 4))
        for s in range(S):
            out[s] = splat_average(rgba[:, s].reshape(h, w, 4),
                                   flows[:, s].reshape(h, w, 2))
        return out

    warped_fw = warp_all(res_t, "flows_fw", dt)
    warped_bw = warp_all(res_tp1, "flows_bw", 1.0 - dt)

    static_rgb = res_t["static_rgbs"].transpose(1, 0, 2).reshape(S, h, w, 3)
    static_a = res_t["static_alphas"].T.reshape(S, h, w, 1)
    composed_rgb = (warped_fw[..., :3] * warped_fw[..., 3:] * (1 - dt)
                    + warped_bw[..., :3] * warped_bw[..., 3:] * dt
                    + static_rgb * static_a)
    composed_a = 1.0 - (1.0 - (warped_fw[..., 3:] * (1 - dt)
                               + warped_bw[..., 3:] * dt)) * (1.0 - static_a)
    composed_a = composed_a[..., 0]

    rgb = np.zeros((h, w, 3))
    depth = np.zeros((h, w))
    trans = np.ones((h, w))
    zs = res_t["zs"].T.reshape(S, h, w)
    for s in range(S):  # front-to-back over (rendering.py:456-459)
        rgb += trans[..., None] * composed_rgb[s]
        depth += trans * composed_a[s] * zs[s]
        trans = trans * (1.0 - composed_a[s])
    return rgb, depth


def test_interpolate_matches_reference_equations():
    """End-to-end f64 golden for `interpolate` with NONZERO per-plane
    flows of mixed magnitude (small flows + one fast plane per direction),
    exercising the per-plane/per-axis bucketed shift-decomposition splat,
    the mixed-bucket reassembly, and the planar flow projection against
    the dense scatter equations."""
    from nsff_pl_tpu.models.rendering import interpolate

    from nsff_pl_tpu.ops import rays as ray_ops

    w, h, S = 10, 8, 6
    n = w * h
    K = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1]])
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)

    # sample points ON the pixel rays (like the reference's renders): the
    # base projection then lands near each plane's own pixel and the
    # per-plane optical flow is dominated by the scene flow — so the
    # mixed flow magnitudes below land in DIFFERENT per-plane buckets
    # (small-D shift splats for the slow planes, larger D for the fast
    # one), exercising the bucketed dispatch + reassembly
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    pix = np.stack([uu.ravel(), vv.ravel(), np.ones(n)], 0)
    dirs_c = (np.linalg.inv(K) @ pix).T  # camera right-down-fwd
    flip = np.array([1.0, -1.0, -1.0])

    def make_res(seed):
        r = np.random.RandomState(seed)
        xyz = np.empty((n, S, 3))
        for si in range(S):
            zc = 2.0 + si + r.uniform(-0.2, 0.2)
            xyz[:, si] = np.asarray(ray_ops.world2ndc(
                jnp.asarray(dirs_c * zc * flip[None]), jnp.asarray(K)))
        flows = {}
        for key in ("flows_fw", "flows_bw"):
            # sub-pixel flows (D=1 buckets) except two faster planes at
            # ~1.5 px and ~4 px projected displacement (D=2 / D=4)
            f = r.uniform(-0.01, 0.01, (n, S, 3))
            f[:, 2] *= 150.0
            f[:, S // 2 + 1] *= 400.0
            flows[key] = f
        return {
            "xyzs": xyz, "zs": np.sort(r.uniform(0.05, 0.95, (n, S)), -1),
            "rgbs": r.uniform(0, 1, (n, S, 3)),
            "alphas": r.uniform(0, 0.6, (n, S)),
            "static_rgbs": r.uniform(0, 1, (n, S, 3)),
            "static_alphas": r.uniform(0, 0.6, (n, S)),
            **flows,
        }

    res_t, res_tp1 = make_res(1), make_res(2)
    dt = 0.3

    gold_rgb, gold_depth = _np_interpolate_f64(res_t, res_tp1, dt, K, c2w,
                                               w, h)

    def to_jax(res):
        return {
            "xyzs_fine": jnp.asarray(res["xyzs"], jnp.float32),
            "zs_fine": jnp.asarray(res["zs"], jnp.float32),
            "transient_rgbs_fine": jnp.asarray(res["rgbs"], jnp.float32),
            "transient_alphas_fine": jnp.asarray(res["alphas"], jnp.float32),
            "transient_flows_fw": jnp.asarray(res["flows_fw"], jnp.float32),
            "transient_flows_bw": jnp.asarray(res["flows_bw"], jnp.float32),
            "static_rgbs_fine": jnp.asarray(res["static_rgbs"], jnp.float32),
            "static_alphas_fine": jnp.asarray(res["static_alphas"],
                                              jnp.float32),
        }

    rgb, depth = interpolate(to_jax(res_t), to_jax(res_tp1), dt,
                             jnp.asarray(K, jnp.float32),
                             jnp.asarray(c2w, jnp.float32), (w, h))
    np.testing.assert_allclose(np.asarray(rgb), gold_rgb, atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth), gold_depth, atol=2e-4)
