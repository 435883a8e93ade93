"""Volumetric renderer with 3-frame scene-flow warping and disocclusion.

TPU-native re-design of the reference `models/rendering.py:52-362`
(`render_rays` + inner `inference` + `render_transient_warping`):

- one pure function over the full ray batch; the reference's chunk loops
  (`rendering.py:113,154,169`) disappear — chunking happens (if at all) at
  the caller as fixed-shape jit invocations
- the train/test/coarse/flow mode polymorphism becomes *static* Python
  booleans, so each mode is its own specialized XLA program
- the test-time per-camera visibility loop (`rendering.py:191-200`)
  is vectorized over cameras (`ops/rays.compute_world_visibility`)
- randomness (z perturb, sigma noise, PDF resampling) is explicit
  `jax.random` keys

Result-dict keys are kept identical to the reference so the loss, eval
and interpolation layers line up 1:1.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nsff_pl_tpu.ops import compositing as cp
from nsff_pl_tpu.ops import rays as ray_ops
from nsff_pl_tpu.ops.posenc import posenc
from nsff_pl_tpu.ops.sampling import sample_pdf, stratified_zs
from nsff_pl_tpu.models import nerf as nerf_m

Z_FAR = 0.95  # flow is zeroed beyond this NDC depth (`rendering.py:316`)


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable; safe as a jit static arg)."""
    N_samples: int = 128
    N_importance: int = 0
    perturb: float = 1.0
    noise_std: float = 1.0
    use_viewdir: bool = False
    encode_a: bool = False
    encode_t: bool = False
    flow_scale: float = 0.2
    max_t: int = 29  # N_frames - 1
    N_emb_xyz: int = 10
    S_emb_xyz: float = 9.0
    N_emb_dir: int = 4
    S_emb_dir: float = 3.0
    N_tau: int = 48
    N_a: int = 48
    img_wh: Tuple[int, int] = (512, 288)
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # rematerialize MLP activations in backward (trade FLOPs for HBM
    # bandwidth). Measured a wash at batch 512 and a LOSS at batch 2048 on
    # v5e with the XLA path, so default off; revisit with Pallas kernels.
    remat: bool = False
    # training-path MLP backend: 'auto' | 'xla' | 'pallas' (fused forward
    # + custom-VJP Pallas backward, ops/mlp_train_kernel.py). Full-step
    # v5e: 43.2k rays/s at batch 512 (+10% vs xla) and 46.4k at 2048
    # (+55%). 'auto' = pallas on TPU, xla on CPU.
    train_backend: str = "auto"
    # fuse the main-eval compositing (softplus/alphas/shared
    # transmittance/weights/rgb+depth maps) into a Pallas kernel pair
    # with a hand-written VJP (ops/compositing_kernel.py) when the
    # Pallas train backend is active. Numerically equivalent incl.
    # gradients (tests/test_compositing_kernel.py) but measured SLOWER
    # as an isolated stage on v5e (58.4k -> 54.7k rays/s at batch 8192:
    # the cotangent/packed boundary traffic exceeds the glue saved), so
    # OFF by default — it is validated groundwork for the full fusion
    # (docs/RAYMARCH_KERNEL.md), not a win on its own.
    fused_compositing: bool = False
    # planar-form fused compositing (ops/compositing_planar_kernel.py):
    # ONE kernel pair composites the main + both warped evaluations of
    # the planar train path (shared tau_s, additive-exp transmittance
    # adjoint), replacing ~25 HBM-bound XLA fusions of step glue.
    # 'auto' = on when running on TPU; 'on' forces it (interpret mode on
    # CPU — used by the equivalence tests); 'off' = XLA compositing.
    planar_compositing: str = "auto"
    # planar fused train path (models/raymarch.py + ops/raymarch_kernel):
    # dense (N, S) boundaries between kernels/loss, xyz assembled
    # in-kernel. 'auto' = use it whenever the Pallas train backend is
    # active and the config is in its envelope (encode_t, fw+bw flows,
    # N_importance == 0); 'on' forces it (CPU interpret for tests),
    # 'off' keeps the reference-shaped path.
    fused_train: str = "auto"
    # warp-evaluation subsampling (planar train path only). The exact
    # algorithm evaluates the transient tower at BOTH warped positions
    # (xyz+flow_fw @ t+1 and xyz+flow_bw @ t-1) for every ray — 2 of the
    # ~4 tower evaluations per step (`rendering.py:217-232`). With
    # warp_subsample=2, each ray gets ONE warp evaluation per step
    # (first half of the batch forward, second half backward; batch rows
    # are i.i.d. so the halves are unbiased samples) and the fw/bw loss
    # terms are computed on their half at 2x weight — expectation equals
    # the exact loss. ~25% FLOP cut; learning-equivalence is measured,
    # not assumed (tools/learning_equiv.py --warp_subsample).
    warp_subsample: int = 1
    # importance-concentrated warp evaluation (planar train path only;
    # mutually exclusive with warp_subsample=2). 0 = off (exact). With
    # warp_importance = f in (0, 1], each step draws K = round(f*N) rays
    # by a Horvitz-Thompson systematic sample over stop-grad transient
    # weight (static rays contribute ~nothing to the pho/cyc terms —
    # `losses.py:126-141` residuals vanish where the transient field is
    # empty) and evaluates BOTH warp directions on the selected rays
    # (2K warp rows per step vs 2N exact; f=0.5 halves the warp FLOPs
    # like warp_subsample=2 but keeps the fw/bw pairing per ray). The
    # pho/cyc contributions are scattered back with 1/pi inclusion
    # weights, so the loss estimator is unbiased over the selection
    # randomness; learning equivalence is measured, not assumed
    # (tools/learning_equiv.py --mode warp_imp).
    warp_importance: float = 0.0
    # planar test-time path (models/raymarch.py::render_test_planar):
    # 'auto' = take it whenever the Pallas eval backend is active and the
    # config fits the planar envelope (transient, N_importance=0, S a
    # lane multiple); 'off' = always use the packed eval kernel path.
    planar_eval: str = "auto"
    # 'auto' | 'xla' | 'pallas' — evaluation backend for the no-grad
    # (test-time) path. The fused Pallas kernel (ops/mlp_kernel.py,
    # selector-matmul posenc + packed transient heads) measures 1.34x
    # faster than XLA's fusion at full-image ray counts on v5e (5.8 vs
    # 7.8 ms / 262k points), parity at small batches. 'auto' uses it on
    # TPU and the XLA path on CPU (where pallas runs interpreted).
    mlp_backend: str = "auto"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def _embed_xyz(cfg: RenderConfig, xyz):
    return posenc(xyz, cfg.S_emb_xyz, cfg.N_emb_xyz)


def _shard_over_rays(fn, mesh):
    """Wrap a fused Pallas evaluator fn(params, xyz, dir, a, t) -> packed
    in `shard_map` over the data mesh: rays shard on the row axis, weights
    replicate. Pallas custom calls don't auto-partition under GSPMD, so
    this is what keeps the kernels alive multi-chip (docs/ROADMAP.md).

    check_vma=False is required (custom_vjp has no replication rule); the
    shard_map transpose still psums the replicated params' cotangent, so
    gradients match the unsharded path (tests/test_sharding.py)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from nsff_pl_tpu.parallel.mesh import DATA_AXIS

    ray = PS(DATA_AXIS)
    return shard_map(fn, mesh=mesh,
                     in_specs=(PS(), ray, ray, ray, ray),
                     out_specs=ray, check_vma=False)


def _shard_comp(fn, mesh):
    """shard_map the fused compositing kernel over the data mesh (no
    replicated operands, so no transpose-psum subtleties)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from nsff_pl_tpu.parallel.mesh import DATA_AXIS

    ray = PS(DATA_AXIS)
    return shard_map(fn, mesh=mesh, in_specs=(ray, ray, ray, ray),
                     out_specs=ray, check_vma=False)


def planar_eval_decision(cfg: RenderConfig, output_transient: bool):
    """Whether the planar no-grad test path will serve this render, and
    why not otherwise. Single source of truth for the `render_rays`
    test-time dispatch and the eval CLI's path breadcrumb.

    Returns (engaged, reasons): `engaged` is True when
    `raymarch.render_test_planar` handles the render; `reasons` lists the
    blockers (empty when engaged, or when only the backend preference —
    planar_eval='auto' with a non-Pallas eval backend — stands down)."""
    if cfg.planar_eval == "off":
        return False, ["planar_eval='off'"]
    if cfg.planar_eval not in ("auto", "on"):
        raise ValueError(f"unknown planar_eval {cfg.planar_eval!r}")
    from nsff_pl_tpu.models import raymarch

    reasons = raymarch.test_planar_unapplicable_reasons(cfg, output_transient)
    if reasons:
        return False, reasons
    eff = cfg.mlp_backend
    if eff == "auto":
        eff = ("pallas" if (jax.default_backend() != "cpu"
                            and cfg.compute_dtype == "bfloat16")
               else "xla")
    # 'on' forces the planar kernel path (interpret mode off-TPU);
    # 'auto' takes it only when the Pallas eval backend is active
    if cfg.planar_eval == "on" or eff == "pallas":
        return True, []
    return False, [f"planar_eval='auto' with the {eff} eval backend "
                   "(pass --planar_eval on to force)"]


def _expand(v, n_samples: int):
    """(N, C) per-ray vector -> (N, S, C) per-sample (repeat over samples,
    cf. the reference's einops `repeat` at `rendering.py:153,164-168`)."""
    return jnp.broadcast_to(v[:, None, :], (v.shape[0], n_samples, v.shape[1]))


def render_rays(
    params: Dict[str, nerf_m.Params],
    embeddings: Dict[str, jnp.ndarray],
    rays: jnp.ndarray,
    ts: Optional[jnp.ndarray],
    rng: jax.Array,
    cfg: RenderConfig,
    *,
    test_time: bool = False,
    output_transient: bool = True,
    output_transient_flow: Tuple[str, ...] = (),
    vis_poses: Optional[jnp.ndarray] = None,
    vis_K: Optional[jnp.ndarray] = None,
    view_dir: Optional[jnp.ndarray] = None,
    mesh=None,
    keys: Optional[Tuple[str, ...]] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays. See the reference `render_rays`
    (`rendering.py:52-362`) for the semantic contract; this function matches
    its outputs key-for-key with static shapes.

    Inputs:
        params: {'fine': ..., 'coarse': ...} parameter pytrees
        embeddings: {'a': (N_frames, N_a)?, 't': (N_frames, N_tau)?}
        rays: (N, 6) NDC ray origins+directions
        ts: (N,) int frame indices (or None when not output_transient)
        rng: PRNG key (consumed for perturb/noise/PDF sampling)
        vis_poses/vis_K: (C, 3, 4) training camera poses at the rays' time
            and (3, 3) intrinsics — enables test-time visibility culling of
            transient sigma (`rendering.py:191-200`)
        view_dir: optional (N, 3) override of the direction used for the
            view-dependence embedding (`rendering.py:308` kwargs['view_dir'])
        mesh: optional `jax.sharding.Mesh` — when the Pallas train backend
            is active, its kernels are shard_map'ed over the mesh's data
            axis (rays sharded, weights replicated)
    """
    output_transient = output_transient and cfg.encode_t
    flow = tuple(output_transient_flow) if output_transient else ()
    n_rays = rays.shape[0]

    if test_time and planar_eval_decision(cfg, output_transient)[0]:
        from nsff_pl_tpu.models import raymarch

        # planar no-grad path: in-kernel xyz assembly, dense (N, S)
        # plane boundaries (no packed (rows, 16) output), same result
        # keys (models/raymarch.py); static-only when
        # output_transient=False (the eval CLI default)
        out = raymarch.render_test_planar(
            params["fine"], embeddings, rays, ts, rng, cfg,
            params_coarse=params.get("coarse"),
            output_transient=output_transient,
            output_transient_flow=flow, vis_poses=vis_poses,
            vis_K=vis_K, view_dir=view_dir, mesh=mesh, keys=keys)
        if keys is not None:  # same filter make_render_fn applies
            out = {k: v for k, v in out.items() if k in keys}
        return out

    results: Dict[str, jnp.ndarray] = {}

    k_perturb, k_pdf_s, k_pdf_t, k_rest = jax.random.split(rng, 4)

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    dir_embedded = posenc(view_dir if view_dir is not None else rays_d,
                          cfg.S_emb_dir, cfg.N_emb_dir)

    perturb = 0.0 if test_time else cfg.perturb
    noise_std = 0.0 if test_time else cfg.noise_std

    zs, zs_mid = stratified_zs(k_perturb, n_rays, cfg.N_samples, perturb)

    if output_transient:
        t_embedded = nerf_m.embedding_lookup(embeddings["t"], ts)
    else:
        t_embedded = None
    if cfg.encode_a and ts is not None:
        a_embedded = nerf_m.embedding_lookup(embeddings["a"], ts)
    else:
        a_embedded = None

    def _maybe_remat(fn):
        return jax.checkpoint(fn) if cfg.remat and not test_time else fn

    def inference(model_params, typ, xyz, zs, flow, k_inf):
        """One field evaluation + compositing pass (`rendering.py:83-300`)."""
        n_samples_ = xyz.shape[1]
        k_noise_s, k_noise_t, k_fw, k_bw = jax.random.split(k_inf, 4)
        results[f"zs_{typ}"] = zs
        results[f"xyzs_{typ}"] = xyz

        xyz_emb = _embed_xyz(cfg, xyz)  # (N, S, 63)
        dir_emb_ = _expand(dir_embedded, n_samples_)
        a_emb_ = _expand(a_embedded, n_samples_) if (
            a_embedded is not None and typ == "fine") else None
        t_emb_ = _expand(t_embedded, n_samples_) if output_transient else None

        sigma_only = typ == "coarse" and test_time
        # the fused kernels compute in bf16; 'auto' only selects them when
        # the user asked for bf16 compute (float32 runs keep XLA so the
        # precision contract of --dtype is honored)
        on_tpu = jax.default_backend() != "cpu"
        is_bf16 = cfg.compute_dtype == "bfloat16"
        backend = cfg.mlp_backend
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown mlp_backend {backend!r}")
        if backend == "auto":
            backend = "pallas" if (on_tpu and is_bf16) else "xla"
        use_pallas = backend == "pallas" and test_time and not sigma_only
        # trainable fused kernels (fine model only; coarse stays XLA)
        tbackend = cfg.train_backend
        if tbackend not in ("auto", "xla", "pallas", "stub"):
            raise ValueError(f"unknown train_backend {tbackend!r}")
        if tbackend == "auto":
            tbackend = "pallas" if (on_tpu and is_bf16) else "xla"
        use_pallas_train = (tbackend == "pallas"
                            and not test_time and typ == "fine")
        if tbackend == "stub" and not test_time and typ == "fine":
            # profiling aid: replaces the MLP evaluation with a trivial
            # params-dependent map of the right shape, so a step timed with
            # train_backend='stub' measures ONLY the non-MLP "glue"
            # (sampling, compositing, warping, losses, optimizer) incl. its
            # backward. Not a real model — never use for training.
            w0 = model_params["static_xyz_0"]["w"][:3, :16]
            packed = jnp.tanh(xyz @ w0)
            this_flow = tuple(f for f in flow if f in ("fw", "bw"))
            static_rgbs = packed[..., 0:3]
            static_sigmas_raw = packed[..., 3]
            results[f"static_rgbs_{typ}"] = static_rgbs
            if output_transient:
                transient_rgbs = packed[..., 4:7]
                transient_sigmas_raw = packed[..., 7]
                results[f"transient_rgbs_{typ}"] = transient_rgbs
                if "fw" in this_flow:
                    far_mask = (zs > Z_FAR)[..., None]
                    transient_flows_fw = jnp.where(
                        far_mask, 0.0, 0.01 * packed[..., 8:11])
                    transient_flows_bw = jnp.where(
                        far_mask, 0.0, 0.01 * packed[..., 11:14])
                    results["transient_flows_fw"] = transient_flows_fw
                    results["transient_flows_bw"] = transient_flows_bw
        elif use_pallas_train:
            from nsff_pl_tpu.ops import mlp_kernel as mk
            from nsff_pl_tpu.ops import mlp_train_kernel as mtk

            this_flow = tuple(f for f in flow if f in ("fw", "bw"))
            has_a = a_embedded is not None
            # need_dxyz=False: the main evaluation's xyz are ray-derived
            # (o + d*z, no parameter dependence), so the xyz cotangent is
            # dead — the kernel skips the dxs chain and its (rows, 3)
            # output entirely
            ftrain = mtk.make_fused_nerf_train(
                n_samples_, use_viewdir=cfg.use_viewdir, encode_a=has_a,
                encode_t=output_transient, output_flow=this_flow,
                n_emb_xyz=cfg.N_emb_xyz, s_emb_xyz=cfg.S_emb_xyz,
                n_emb_dir=cfg.N_emb_dir, n_a=cfg.N_a, n_tau=cfg.N_tau,
                flow_scale=cfg.flow_scale, need_dxyz=False)
            if mesh is not None:
                ftrain = _shard_over_rays(ftrain, mesh)
            packed = ftrain(model_params, xyz,
                            dir_embedded if cfg.use_viewdir else None,
                            a_embedded if has_a else None,
                            t_embedded if output_transient else None)
            un = mk.unpack_fused(packed, encode_t=output_transient,
                                 output_flow=this_flow)
            static_rgbs = un["static_rgbs"]
            static_sigmas_raw = un["static_sigmas_raw"]
            results[f"static_rgbs_{typ}"] = static_rgbs
            if output_transient:
                transient_rgbs = un["transient_rgbs"]
                transient_sigmas_raw = un["transient_sigmas_raw"]
                results[f"transient_rgbs_{typ}"] = transient_rgbs
                if "fw" in this_flow:
                    far_mask = (zs > Z_FAR)[..., None]
                    transient_flows_fw = jnp.where(
                        far_mask, 0.0, un["transient_flows_fw"])
                    transient_flows_bw = jnp.where(
                        far_mask, 0.0, un["transient_flows_bw"])
                    results["transient_flows_fw"] = transient_flows_fw
                    results["transient_flows_bw"] = transient_flows_bw
        elif use_pallas:
            # fused posenc+dual-tower Pallas kernel (ops/mlp_kernel.py)
            from nsff_pl_tpu.ops import mlp_kernel as mk

            this_flow = tuple(f for f in (flow if typ == "fine" else ())
                              if f in ("fw", "bw"))
            has_a = a_embedded is not None and typ == "fine"
            fused = mk.make_fused_nerf_eval(
                n_samples_, use_viewdir=cfg.use_viewdir, encode_a=has_a,
                encode_t=output_transient, output_flow=this_flow,
                n_emb_xyz=cfg.N_emb_xyz, s_emb_xyz=cfg.S_emb_xyz,
                n_emb_dir=cfg.N_emb_dir, n_a=cfg.N_a, n_tau=cfg.N_tau,
                flow_scale=cfg.flow_scale)
            if mesh is not None:
                # data-parallel full-image rendering (eval/validation):
                # the eval kernel needs the same shard_map treatment as
                # the train kernels (pallas doesn't partition under GSPMD)
                fused_pos = lambda p, x, de, ae, te: fused(  # noqa: E731
                    p, x, dir_emb=de, a_emb=ae, t_emb=te)
                packed = _shard_over_rays(fused_pos, mesh)(
                    model_params, xyz,
                    dir_embedded if cfg.use_viewdir else None,
                    a_embedded if has_a else None,
                    t_embedded if output_transient else None)
            else:
                packed = fused(
                    model_params, xyz,
                    dir_emb=dir_embedded if cfg.use_viewdir else None,
                    a_emb=a_embedded if has_a else None,
                    t_emb=t_embedded if output_transient else None)
            un = mk.unpack_fused(packed, encode_t=output_transient,
                                 output_flow=this_flow)
            static_rgbs = un["static_rgbs"]
            static_sigmas_raw = un["static_sigmas_raw"]
            results[f"static_rgbs_{typ}"] = static_rgbs
            if output_transient:
                transient_rgbs = un["transient_rgbs"]
                transient_sigmas_raw = un["transient_sigmas_raw"]
                results[f"transient_rgbs_{typ}"] = transient_rgbs
                if "fw" in this_flow:
                    far_mask = (zs > Z_FAR)[..., None]
                    transient_flows_fw = jnp.where(
                        far_mask, 0.0, un["transient_flows_fw"])
                    transient_flows_bw = jnp.where(
                        far_mask, 0.0, un["transient_flows_bw"])
                    results["transient_flows_fw"] = transient_flows_fw
                    results["transient_flows_bw"] = transient_flows_bw
        elif sigma_only:
            # coarse pass at test time only needs sigmas (`rendering.py:151-162`)
            static_sigmas_raw = nerf_m.static_forward(
                model_params, xyz_emb, sigma_only=True,
                use_viewdir=cfg.use_viewdir, compute_dtype=cfg.dtype)
            static_rgbs = None
            if output_transient:
                tr = nerf_m.transient_forward(
                    model_params, xyz_emb, t_emb_, sigma_only=True,
                    compute_dtype=cfg.dtype)
                transient_sigmas_raw = tr["sigma"]
                transient_rgbs = None
        else:
            static_rgbs, static_sigmas_raw = _maybe_remat(
                lambda p, xe, de, ae: nerf_m.static_forward(
                    p, xe, de, ae, use_viewdir=cfg.use_viewdir,
                    compute_dtype=cfg.dtype))(
                model_params, xyz_emb, dir_emb_, a_emb_)
            results[f"static_rgbs_{typ}"] = static_rgbs
            if output_transient:
                this_flow = flow if typ == "fine" else ()
                tr = _maybe_remat(
                    lambda p, xe, te: nerf_m.transient_forward(
                        p, xe, te,
                        output_flow=tuple(f for f in this_flow
                                          if f in ("fw", "bw")),
                        flow_scale=cfg.flow_scale, compute_dtype=cfg.dtype))(
                    model_params, xyz_emb, t_emb_)
                transient_rgbs, transient_sigmas_raw = tr["rgb"], tr["sigma"]
                results[f"transient_rgbs_{typ}"] = transient_rgbs
                if "fw" in this_flow:
                    far_mask = (zs > Z_FAR)[..., None]
                    transient_flows_fw = jnp.where(far_mask, 0.0, tr["flow_fw"])
                    transient_flows_bw = jnp.where(far_mask, 0.0, tr["flow_bw"])
                    results["transient_flows_fw"] = transient_flows_fw
                    results["transient_flows_bw"] = transient_flows_bw

        # test-time visibility culling of transient sigma (`rendering.py:191-200`)
        if test_time and output_transient and vis_poses is not None:
            w, h = cfg.img_wh
            xyz_w = ray_ops.ndc2world(xyz.reshape(-1, 3), vis_K)
            vis = ray_ops.compute_world_visibility(xyz_w, vis_K, h, w, vis_poses)
            vis = vis.reshape(transient_sigmas_raw.shape)
            transient_sigmas_raw = jnp.where(vis == 0, -10.0,
                                             transient_sigmas_raw)

        static_deltas, transient_deltas = cp.deltas_from_zs(zs)

        # fused compositing: the whole sigma->alpha->transmittance->
        # weights->maps chain runs in one Pallas kernel pair reading the
        # MLP kernel's packed output directly (ops/compositing_kernel.py)
        use_fused_comp = (use_pallas_train and output_transient
                          and not test_time and typ == "fine"
                          and cfg.fused_compositing)
        comp = None
        if use_fused_comp:
            from nsff_pl_tpu.ops.compositing_kernel import \
                make_fused_compositing

            shape2 = (xyz.shape[0], n_samples_)
            noise_s = (jax.random.normal(k_noise_s, shape2) * noise_std
                       if noise_std > 0 else jnp.zeros(shape2))
            noise_t = (jax.random.normal(k_noise_t, shape2) * noise_std
                       if noise_std > 0 else jnp.zeros(shape2))
            fcomp = make_fused_compositing(n_samples_)
            if mesh is not None:
                fcomp = _shard_comp(fcomp, mesh)
            comp = fcomp(packed, zs, noise_s, noise_t)
            static_sigmas = comp["static_sigmas"]
            transient_sigmas = comp["transient_sigmas"]
            results[f"static_sigmas_{typ}"] = static_sigmas
            results[f"transient_sigmas_{typ}"] = transient_sigmas
            static_alphas = comp["static_alphas"]
            transient_alphas = comp["transient_alphas"]
            alphas = None  # trans/weights come from the kernel
        else:
            noise_s = (jax.random.normal(k_noise_s, static_sigmas_raw.shape)
                       * noise_std) if noise_std > 0 else None
            static_sigmas = cp.softplus(
                static_sigmas_raw + noise_s if noise_s is not None
                else static_sigmas_raw)
            results[f"static_sigmas_{typ}"] = static_sigmas
            static_alphas = 1.0 - jnp.exp(-static_deltas * static_sigmas)
            alphas = static_alphas

        if output_transient and not use_fused_comp:
            noise_t = (jax.random.normal(k_noise_t, transient_sigmas_raw.shape)
                       * noise_std) if noise_std > 0 else None
            transient_sigmas = cp.softplus(
                transient_sigmas_raw + noise_t if noise_t is not None
                else transient_sigmas_raw)
            results[f"transient_sigmas_{typ}"] = transient_sigmas
            transient_alphas = 1.0 - jnp.exp(-transient_deltas * transient_sigmas)
            alphas = 1.0 - (1.0 - static_alphas) * (1.0 - transient_alphas)

        if output_transient:
            if (not test_time) and ("fw" in flow) and typ == "fine":
                # render with flowed xyzs (`rendering.py:217-232`)
                def warp(xyz_w_pts, t_shift, which_flow, k_w):
                    """`render_transient_warping` (`rendering.py:98-140`):
                    evaluate the transient field at warped points/time and
                    composite against the CURRENT static field. (Batching
                    the two warps into one double-row call was measured
                    SLOWER on v5e: the concats materialize what these
                    broadcasts let XLA fuse.)"""
                    ts_shift = jnp.clip(ts + t_shift, 0, cfg.max_t)
                    t_emb_ray = nerf_m.embedding_lookup(embeddings["t"],
                                                        ts_shift)
                    if tbackend == "stub":
                        w0 = model_params["static_xyz_0"]["w"][:3, :16]
                        pk = jnp.tanh(xyz_w_pts @ w0)
                        tr_w = {"rgb": pk[..., 4:7], "sigma": pk[..., 7],
                                f"flow_{which_flow}": 0.01 * pk[..., 8:11]}
                    elif use_pallas_train:
                        from nsff_pl_tpu.ops import mlp_train_kernel as mtk

                        ft_w = mtk.make_fused_nerf_train(
                            n_samples_, use_viewdir=cfg.use_viewdir,
                            encode_a=False, encode_t=True,
                            output_flow=(which_flow,),
                            n_emb_xyz=cfg.N_emb_xyz,
                            s_emb_xyz=cfg.S_emb_xyz,
                            n_emb_dir=cfg.N_emb_dir, n_a=cfg.N_a,
                            n_tau=cfg.N_tau, flow_scale=cfg.flow_scale,
                            static_branch=False)
                        if mesh is not None:
                            ft_w = _shard_over_rays(ft_w, mesh)
                        pk = ft_w(model_params, xyz_w_pts, None, None,
                                  t_emb_ray)
                        tr_w = {"rgb": pk[..., 4:7], "sigma": pk[..., 7],
                                f"flow_{which_flow}": pk[..., 8:11]}
                    else:
                        t_emb_w = _expand(t_emb_ray, n_samples_)
                        tr_w = _maybe_remat(
                            lambda p, xe, te: nerf_m.transient_forward(
                                p, xe, te, output_flow=(which_flow,),
                                flow_scale=cfg.flow_scale,
                                compute_dtype=cfg.dtype))(
                            model_params, _embed_xyz(cfg, xyz_w_pts),
                            t_emb_w)
                    flows_w = jnp.where((zs > Z_FAR)[..., None], 0.0,
                                        tr_w[f"flow_{which_flow}"])
                    noise_w = (jax.random.normal(k_w, tr_w["sigma"].shape)
                               * noise_std) if noise_std > 0 else 0.0
                    tr_alphas_w = 1.0 - jnp.exp(
                        -transient_deltas * cp.softplus(tr_w["sigma"] + noise_w))
                    alphas_w = 1.0 - (1.0 - static_alphas) * (1.0 - tr_alphas_w)
                    trans_w = cp.transmittance(alphas_w)
                    static_w_w = static_alphas * trans_w
                    transient_w_w = tr_alphas_w * trans_w
                    rgb_map_w = (
                        cp.weighted_sum(static_w_w, static_rgbs)
                        + cp.weighted_sum(transient_w_w, tr_w["rgb"]))
                    return rgb_map_w, flows_w, transient_w_w

                xyz_fw = xyz + transient_flows_fw
                results["xyzs_fw"] = xyz_fw
                results["rgb_fw"], tr_flows_fw_bw, transient_weights_fw = warp(
                    xyz_fw, +1, "bw", k_fw)
                xyz_bw = xyz + transient_flows_bw
                results["xyzs_bw"] = xyz_bw
                results["rgb_bw"], tr_flows_bw_fw, transient_weights_bw = warp(
                    xyz_bw, -1, "fw", k_bw)
                results["xyzs_fw_bw"] = xyz_fw + tr_flows_fw_bw
                results["xyzs_bw_fw"] = xyz_bw + tr_flows_bw_fw

        if use_fused_comp:
            static_weights = comp["static_weights"]
            transient_weights = comp["transient_weights"]
            weights = comp["weights"]
            results[f"static_weights_{typ}"] = static_weights
            results[f"transient_weights_{typ}"] = transient_weights
            results[f"weights_{typ}"] = weights
        else:
            trans = cp.transmittance(alphas)
            weights = alphas * trans
            if output_transient:
                static_weights = static_alphas * trans
                transient_weights = transient_alphas * trans
                results[f"static_weights_{typ}"] = static_weights
                results[f"transient_weights_{typ}"] = transient_weights
                results[f"weights_{typ}"] = weights
            else:
                static_weights = weights
                results[f"static_weights_{typ}"] = weights

        if test_time:
            if output_transient:
                results[f"static_alphas_{typ}"] = static_alphas
                results[f"transient_alphas_{typ}"] = transient_alphas
            if typ == "coarse":
                return  # `rendering.py:253-254`

        if use_fused_comp:
            results[f"depth_{typ}"] = comp["depth"]
        else:
            results[f"depth_{typ}"] = cp.weighted_sum(weights, zs)
        if output_transient:
            transient_rgb_map = cp.weighted_sum(transient_weights, transient_rgbs)
            if use_fused_comp:
                results[f"rgb_{typ}"] = comp["rgb"]
            else:
                static_rgb_map = cp.weighted_sum(static_weights, static_rgbs)
                results[f"rgb_{typ}"] = static_rgb_map + transient_rgb_map
            transient_alpha = jnp.sum(transient_weights, -1)
            results[f"transient_alpha_{typ}"] = transient_alpha
            # gray background for the transient-only view (`rendering.py:264-265`)
            results[f"transient_rgb_{typ}"] = (
                transient_rgb_map + 0.8 * (1.0 - transient_alpha[:, None]))

            # static-only compositing with its own transmittance
            # (`rendering.py:270-278`)
            _static_weights = cp.composite_one_field(static_alphas)
            results[f"_static_rgb_{typ}"] = cp.weighted_sum(
                _static_weights, static_rgbs)
            results[f"_static_depth_{typ}"] = cp.weighted_sum(_static_weights, zs)

            if flow and typ == "fine":
                results["xyz_fine"] = cp.weighted_sum(weights, xyz)
                results["transient_flow_fw"] = cp.weighted_sum(
                    weights, transient_flows_fw)
                results["xyz_fw"] = results["xyz_fine"] + results["transient_flow_fw"]
                results["transient_flow_bw"] = cp.weighted_sum(
                    weights, transient_flows_bw)
                results["xyz_bw"] = results["xyz_fine"] + results["transient_flow_bw"]

                if (not test_time) and ("disocc" in flow):
                    # disocclusion = 1 - |sum(warped_w - w)| (`rendering.py:289-295`)
                    occ_fw = jax.lax.stop_gradient(
                        transient_weights_fw - transient_weights)
                    occ_bw = jax.lax.stop_gradient(
                        transient_weights_bw - transient_weights)
                    results["disocc_fw"] = 1.0 - jnp.abs(
                        jnp.sum(occ_fw, -1, keepdims=True))
                    results["disoccs_fw"] = 1.0 - jnp.abs(occ_fw[..., None])
                    results["disocc_bw"] = 1.0 - jnp.abs(
                        jnp.sum(occ_bw, -1, keepdims=True))
                    results["disoccs_bw"] = 1.0 - jnp.abs(occ_bw[..., None])
        else:
            results[f"rgb_{typ}"] = cp.weighted_sum(weights, static_rgbs)

    k_coarse, k_fine = jax.random.split(k_rest)
    if cfg.N_importance > 0:  # coarse-to-fine (`rendering.py:326-348`)
        xyz_coarse = rays_o[:, None] + rays_d[:, None] * zs[..., None]
        inference(params["coarse"], "coarse", xyz_coarse, zs, (), k_coarse)

        # the reference keys det off the EFFECTIVE perturb — 0 at test
        # time regardless of the training setting (`rendering.py:337,344`
        # with eval's perturb=0 default) — so test-time draws are the
        # evenly-spaced u's, not random
        det = perturb == 0
        zs_static = sample_pdf(
            k_pdf_s, zs_mid,
            jax.lax.stop_gradient(results["static_weights_coarse"][:, 1:-1]),
            cfg.N_importance, det=det)
        zs_list = [zs, zs_static]
        if test_time:
            results["static_zs_fine"] = zs_static
        if output_transient:
            zs_transient = sample_pdf(
                k_pdf_t, zs_mid,
                jax.lax.stop_gradient(
                    results["transient_weights_coarse"][:, 1:-1]),
                cfg.N_importance, det=det)
            zs_list.append(zs_transient)
            if test_time:
                results["transient_zs_fine"] = zs_transient
        zs = jnp.sort(jnp.concatenate(zs_list, -1), -1)

    xyz_fine = rays_o[:, None] + rays_d[:, None] * zs[..., None]
    inference(params["fine"], "fine", xyz_fine, zs, flow, k_fine)
    return results


@functools.partial(jax.jit, static_argnames=("w", "h"))
def _interp_pre(xyzs, flows_fw, flows_bw, rgba_t, rgba_tp1, dt, K, c2w,
                *, w, h):
    """Everything in `interpolate` upstream of the splat, as ONE compiled
    program: per-plane projected optical flows + the stacked transient
    MPI planes for both warp directions. Jitting matters because
    `interpolate` runs eagerly (the splat's bucket probe needs concrete
    flows) and per-op dispatch latency over a remote-device link otherwise
    dominates the compute.

    Everything is emitted PLANAR — planes (2S, 4, h, w), flow components
    (2S, h, w) — so the splat's vector lanes ride the 512-wide image
    axis, not the 4-wide channel axis (see softsplat_sum_rolls_planar)."""
    S = xyzs.shape[1]

    # projection matrix ("right up back" -> "right down forward",
    # rendering.py:390-394)
    c2w4 = jnp.eye(4).at[:3].set(c2w)
    w2c = jnp.linalg.inv(c2w4)[:3]
    w2c = w2c * jnp.array([[1.0], [-1.0], [-1.0]])
    P = jnp.asarray(K) @ w2c  # (3, 4)

    def comps(a):  # (hw, S, C) -> C planar (S, h, w) components
        return tuple(a.transpose(2, 1, 0).reshape(a.shape[2], -1, h, w))

    X, Y, Z = comps(xyzs)
    kfx, kfy = K[0, 0], K[1, 1]
    kcx, kcy = K[0, 2], K[1, 2]
    eps = 1e-6

    def ndc2world_c(x, y, z):
        """Componentwise `ray_ops.ndc2world` (ray_utils.py:127-151) —
        struct-of-arrays so every op runs on lane-friendly (S, h, w)
        planes instead of minor-dim-3 point lists."""
        rz = 2.0 / (z - 1 - eps)
        return -rz * x * kcx / kfx, -rz * y * kcy / kfy, rz

    def plane_flow(flows_3d, scale):
        """3D scene flow -> per-plane 2D optical flow via projection
        (rendering.py:404-414); returns planar (S, h, w) components."""
        fx3, fy3, fz3 = comps(flows_3d)
        wx, wy, wz = ndc2world_c(X, Y, Z)
        dx, dy, dz = ndc2world_c(X + fx3, Y + fy3, Z + fz3)
        wx, wy, wz = (wx + scale * (dx - wx), wy + scale * (dy - wy),
                      wz + scale * (dz - wz))
        u = P[0, 0] * wx + P[0, 1] * wy + P[0, 2] * wz + P[0, 3]
        v = P[1, 0] * wx + P[1, 1] * wy + P[1, 2] * wz + P[1, 3]
        d = P[2, 0] * wx + P[2, 1] * wy + P[2, 2] * wz + P[2, 3]
        fx = u / d - jnp.arange(w, dtype=jnp.float32)[None, None, :]
        fy = v / d - jnp.arange(h, dtype=jnp.float32)[None, :, None]
        return fx, fy

    def planes(rgba):  # (hw, S, 4) -> (S, 4, h, w)
        return rgba.transpose(1, 2, 0).reshape(S, 4, h, w)

    fx_t, fy_t = plane_flow(flows_fw, dt)
    fx_p, fy_p = plane_flow(flows_bw, 1.0 - dt)
    planes_cat = jnp.concatenate([planes(rgba_t), planes(rgba_tp1)], 0)
    return (planes_cat, jnp.concatenate([fx_t, fx_p], 0),
            jnp.concatenate([fy_t, fy_p], 0))


@jax.jit
def _interp_post(warped, static_rgb_flat, static_a_flat, zs_flat, dt):
    """Blend + over-composite downstream of the splat (one program,
    planar layout; see `_interp_pre`). Reference: rendering.py:450-458."""
    S2, _, h, w = warped.shape
    S = S2 // 2
    warped_fw, warped_bw = warped[:S], warped[S:]  # (S, 4, h, w)
    static_rgb = static_rgb_flat.transpose(1, 2, 0).reshape(S, 3, h, w)
    static_a = static_a_flat.T.reshape(S, h, w)[:, None]

    # per-plane blend (rendering.py:450-455)
    composed_rgb = (warped_fw[:, :3] * warped_fw[:, 3:] * (1 - dt)
                    + warped_bw[:, :3] * warped_bw[:, 3:] * dt
                    + static_rgb * static_a)
    composed_a = 1.0 - (1.0 - (warped_fw[:, 3:] * (1 - dt)
                               + warped_bw[:, 3:] * dt)) * (1.0 - static_a)
    composed_a = composed_a[:, 0]  # (S, h, w)

    # front-to-back over-compositing (rendering.py:456-458) as one
    # exclusive cumprod over planes
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(composed_a[:1]),
                         1.0 - composed_a[:-1]], 0), 0)  # (S, h, w)
    rgb = jnp.sum(trans[:, None] * composed_rgb, 0)  # (3, h, w)
    zs = zs_flat.T.reshape(S, h, w)
    depth = jnp.sum(trans * composed_a * zs, 0)
    return rgb.transpose(1, 2, 0), depth


def interpolate(results_t, results_tp1, dt, K, c2w, img_wh):
    """Space-time interpolation between two rendered frames t and t+1.

    Re-design of the reference `interpolate` (`rendering.py:365-460`):
    each depth sample forms an MPI plane; the transient planes of frame t
    are forward-warped by their (dt-scaled, camera-projected) scene flow
    with average-mode softmax splatting, frame t+1's planes backward-warped
    by (1-dt), and the blended result is over-composited front-to-back with
    the static planes. Where the reference loops planes on the GPU with
    per-plane CPU<->GPU shipping (`rendering.py:439-449`), this vmaps the
    splat over all planes and composes with one exclusive cumprod — a
    single jit-friendly program that stays on device.

    Inputs:
        results_t / results_tp1: full-image render dicts (test_time=True,
            output_transient_flow=('fw','bw')) with (h*w, S, .) entries
        dt: float in (0, 1)
        K: (3, 3) intrinsics; c2w: (3, 4) pose (same for both frames)
        img_wh: (w, h)
    Outputs:
        rgb: (h, w, 3); depth: (h, w) in NDC
    """
    from nsff_pl_tpu.ops.softsplat import softsplat_batched_planar

    w, h = img_wh
    dt = jnp.float32(dt)  # traced scalar: no recompile per dt value

    def rgba(res):
        return jnp.concatenate(
            [res["transient_rgbs_fine"],
             res["transient_alphas_fine"][..., None]], -1)  # (hw, S, 4)

    # one batched splat call for both directions: halves the probe
    # fetches and lets matching-range fw/bw planes share bucket groups
    planes_cat, fx_cat, fy_cat = _interp_pre(
        results_t["xyzs_fine"], results_t["transient_flows_fw"],
        results_tp1["transient_flows_bw"], rgba(results_t),
        rgba(results_tp1), dt, jnp.asarray(K), c2w, w=w, h=h)
    warped = softsplat_batched_planar(planes_cat, fx_cat, fy_cat,
                                      "average")
    return _interp_post(warped, results_t["static_rgbs_fine"],
                        results_t["static_alphas_fine"],
                        results_t["zs_fine"], dt)
