"""The jitted training / rendering steps.

Replaces `NSFFSystem.training_step` + `forward` (`train.py:99-123,178-198`):
one fused XLA program does (device-side batch gather) -> render with
scene-flow warping -> 8-term loss -> grads -> optax update. Under a
`jax.sharding.Mesh` the ray batch is sharded over chips and XLA inserts
the gradient all-reduce + the collectives for batch-global loss statistics
(median/MAD/disocc means/top-k), replacing Lightning DDP over NCCL
(`train.py:294-301`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nsff_pl_tpu.data.pipeline import _sample_batch
from nsff_pl_tpu.models.raymarch import (LANE_REASON,
                                         planar_unapplicable_reasons,
                                         render_train_planar)
from nsff_pl_tpu.models.rendering import RenderConfig, render_rays
from nsff_pl_tpu.parallel import mesh as mesh_lib
from nsff_pl_tpu.training.loss import (LossConfig, compute_losses,
                                       compute_losses_planar, total_loss)


class TrainState(NamedTuple):
    params: Any  # {'nerf_fine', 'nerf_coarse'?, 'embedding_a'?, 'embedding_t'?}
    opt_state: Any
    step: jnp.ndarray


def _replicated_io(mesh) -> dict:
    """Extra jit kwargs for a multi-process mesh: pin every input/output
    to the fully-replicated sharding. Inside the program the ray batch is
    re-sharded onto the data axis (`shard_batch`), so only the batch-dim
    compute and its collectives span processes; params/tables/metrics stay
    replicated — the multi-node analog of DDP's replicated model
    (train.py:294-301). Process-local host values (numpy) are accepted as
    replicated global values by pjit; outputs come back fully replicated
    so every process can fetch them. No-op (empty) for single-process
    meshes, where sharding inference already does the right thing."""
    if mesh is None or jax.process_count() == 1:
        return {}
    from nsff_pl_tpu.parallel.distributed import replicated

    s = replicated(mesh)
    return {"in_shardings": s, "out_shardings": s}


def _split_params(params):
    """Model params pytree -> (models dict, embeddings dict) as the
    renderer expects."""
    models = {"fine": params["nerf_fine"]}
    if "nerf_coarse" in params:
        models["coarse"] = params["nerf_coarse"]
    embeddings = {}
    if "embedding_a" in params:
        embeddings["a"] = params["embedding_a"]
    if "embedding_t" in params:
        embeddings["t"] = params["embedding_t"]
    return models, embeddings


def make_train_step(
    render_cfg: RenderConfig,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    *,
    output_transient: bool,
    output_transient_flow: Tuple[str, ...],
    steps_per_epoch: int,
    batch_size: int,
    hard_sampling: bool = False,
    mesh=None,
    donate: bool = True,
    scan_steps: int = 1,
):
    """Build the jitted train step.

    With `scan_steps == 1` the returned function has signature
        train_step(state, table, weights, Ks, Ps, rng, t) -> (state, metrics)
    where `table` is the HBM-resident ray table, `weights` the
    hard-sampling distribution, `t` the scheduler-chosen frame, and
    metrics contains the per-term losses + PSNR (`train.py:187-196`).

    With `scan_steps == K > 1` it instead runs K successive train steps
    in ONE dispatch via `lax.scan` (identical per-step semantics; see the
    rationale at `multi_fn` below):
        multi_step(state, tmp_rgb, table, weights, Ks, Ps, rng, ts)
            -> (state, tmp_rgb, metrics)
    where `ts` is the (K,) frame schedule, `rng` is split into the K
    per-step keys inside the program, metrics arrive stacked (K,), and
    `tmp_rgb` is the hard-sampling render buffer ((N_frames, H*W, 3);
    pass a dummy (1, 1, 3) array when `hard_sampling` is off — it is
    carried through untouched).
    """
    # planar fused path: dense-boundary kernels + component-plane loss
    # (models/raymarch.py); covers the flagship recipe when the Pallas
    # train backend would be active (or is forced via fused_train='on')
    if render_cfg.fused_train not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused_train {render_cfg.fused_train!r}")
    tb = render_cfg.train_backend
    pallas_active = (tb == "pallas"
                     or (tb == "auto" and jax.default_backend() != "cpu"
                         and render_cfg.compute_dtype == "bfloat16"))
    reasons = planar_unapplicable_reasons(render_cfg, output_transient,
                                          output_transient_flow)
    applicable = not reasons
    use_planar = (applicable
                  and (render_cfg.fused_train == "on"
                       or (render_cfg.fused_train == "auto"
                           and pallas_active)))
    if ((render_cfg.warp_subsample > 1 or render_cfg.warp_importance > 0)
            and not use_planar):
        which = (f"warp_subsample={render_cfg.warp_subsample}"
                 if render_cfg.warp_subsample > 1
                 else f"warp_importance={render_cfg.warp_importance}")
        raise ValueError(
            f"{which} is only implemented on the planar fused train path"
            + (f" (unavailable here: {'; '.join(reasons)})" if reasons
               else " (enable it: fused_train='on'/'auto' with the "
                    "Pallas train backend)"))
    if not applicable and render_cfg.fused_train in ("on", "auto"):
        # the planar fused path is ~20% faster than the packed kernels at
        # the flagship recipe; make the fallback loud instead of silent
        # (ADVICE r2 / VERDICT r2 #8)
        msg = (f"planar fused train path unavailable "
               f"({'; '.join(reasons)}); falling back to the "
               f"packed-boundary kernels (~20% slower at the flagship "
               f"recipe shapes)")
        if render_cfg.fused_train == "on":
            # a user forcing 'on' must not silently get the slow path
            raise ValueError(f"fused_train='on' but {msg}")
        if all(LANE_REASON in r for r in reasons):
            # under 'auto' only the lane constraint is a surprise: the
            # config IS the flagship recipe except for N_samples, so the
            # user following e.g. --N_samples 64 hits a silent 20% cliff
            import warnings

            warnings.warn(msg, stacklevel=2)
            print(f"[nsff] {msg}", flush=True)

    def step_fn(state: TrainState, table, weights, Ks, Ps, rng, t):
        k_sample, k_render = jax.random.split(rng)
        batch = _sample_batch(table, weights, k_sample, t, batch_size,
                              hard_sampling)
        if mesh is not None:
            batch = mesh_lib.shard_batch(mesh, batch)
        epoch = state.step // steps_per_epoch

        def loss_fn(params):
            models, embeddings = _split_params(params)
            if use_planar:
                results = render_train_planar(
                    models["fine"], embeddings, batch["rays"],
                    batch["ts"], k_render, render_cfg,
                    params_coarse=models.get("coarse"), mesh=mesh)
                loss_d = compute_losses_planar(
                    results, batch, loss_cfg, epoch=epoch, Ks=Ks, Ps=Ps)
            else:
                results = render_rays(
                    models, embeddings, batch["rays"],
                    batch["ts"] if output_transient else None,
                    k_render, render_cfg,
                    test_time=False,
                    output_transient=output_transient,
                    output_transient_flow=output_transient_flow,
                    mesh=mesh)
                loss_d = compute_losses(
                    results, batch, loss_cfg, epoch=epoch,
                    output_transient_flow=output_transient_flow,
                    Ks=Ks, Ps=Ps)
            loss = total_loss(loss_d)
            mse = jnp.mean((results["rgb_fine"] - batch["rgbs"]) ** 2)
            return loss, (loss_d, mse, results["rgb_fine"], batch["rand_idx"])

        (loss, (loss_d, mse, rgb_fine, rand_idx)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)

        metrics = dict(loss_d)
        metrics["loss"] = loss
        metrics["psnr"] = -10.0 * jnp.log10(mse)
        # expose the rendered rgb + ray ids for the hard-sampling buffer
        # (train.py:184-185)
        aux = {"rgb_fine": rgb_fine, "rand_idx": rand_idx, "t": t}
        return new_state, metrics, aux

    if scan_steps == 1:
        donate_argnums = (0,) if donate else ()
        return jax.jit(step_fn, donate_argnums=donate_argnums,
                       **_replicated_io(mesh))

    # ------------------------------------------------------------------
    # K-step dispatch: lax.scan over `scan_steps` identical train steps.
    # Semantics per step are EXACTLY step_fn's (one optimizer update per
    # `batch_size` rays; asserted against sequential calls in
    # tests/test_pipeline.py) — only the host<->device dispatch pattern
    # changes. Rationale: at batch 512 the device step is ~8.4 ms but
    # every host iteration pays ~2 ms of dispatch round trips (the
    # per-step jax.random.split + step POST on a tunneled backend), a
    # ~20% cliff at the reference's recipe batch (VERDICT r2 #2). The
    # scan runs K steps per dispatch, amortizing that fixed cost.
    # ------------------------------------------------------------------
    def multi_fn(state: TrainState, tmp_rgb, table, weights, Ks, Ps, rng,
                 ts):
        keys = jax.random.split(rng, scan_steps)

        def body(carry, xs):
            state, tmp_rgb = carry
            k, t = xs
            state, metrics, aux = step_fn(state, table, weights, Ks, Ps,
                                          k, t)
            if hard_sampling:
                # the reference's tmp_rgb buffer write (train.py:184-185),
                # folded into the scan so the refresh stays per-step
                tmp_rgb = tmp_rgb.at[aux["t"], aux["rand_idx"]].set(
                    aux["rgb_fine"])
            return (state, tmp_rgb), metrics

        (state, tmp_rgb), metrics = jax.lax.scan(
            body, (state, tmp_rgb), (keys, ts))
        return state, tmp_rgb, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(multi_fn, donate_argnums=donate_argnums,
                   **_replicated_io(mesh))


def make_render_fn(
    render_cfg: RenderConfig,
    *,
    test_time: bool = True,
    output_transient: bool,
    output_transient_flow: Tuple[str, ...] = (),
    with_visibility: bool = False,
    keys: Optional[Tuple[str, ...]] = None,
    mesh=None,
):
    """Jitted full-ray-batch renderer for validation / eval.

    The reference loops chunks with `.cpu()` round-trips
    (`train.py:105-123`, `eval.py:90-110`); here the whole ray set stays on
    device and the caller invokes this jitted fn per fixed-size chunk.
    `keys` optionally restricts the returned dict (saves HBM on full-image
    renders). Under a `mesh` the chunk's rays shard data-parallel across
    the chips (the reference's DDP is train-only — eval there is
    single-GPU, `eval.py:90-110`); the chunk size must divide by the mesh
    size."""

    @functools.partial(jax.jit, **_replicated_io(mesh))
    def render(params, rays, ts, rng, vis_poses=None, vis_K=None,
               view_dir=None):
        models, embeddings = _split_params(params)
        if mesh is not None:
            batch = {"rays": rays, "ts": ts}
            if view_dir is not None:
                batch["view_dir"] = view_dir
            sharded = mesh_lib.shard_batch(mesh, batch)
            rays = sharded["rays"]
            ts = sharded["ts"] if ts is not None else None
            view_dir = sharded.get("view_dir")
        out = render_rays(
            models, embeddings, rays, ts, rng, render_cfg,
            test_time=test_time,
            output_transient=output_transient,
            output_transient_flow=output_transient_flow,
            vis_poses=vis_poses if with_visibility else None,
            vis_K=vis_K if with_visibility else None,
            view_dir=view_dir,
            mesh=mesh,
            keys=keys)
        if keys is not None:
            out = {k: v for k, v in out.items() if k in keys}
        return out

    return render


# one scanned executable per render_fn (jit caches per chunk-count C
# inside it; the dict keeps the wrapper so repeated frames don't retrace)
_scan_render_cache: Dict[object, object] = {}


def render_full_image(render_fn, params, rays, ts, rng, chunk: int = 32768,
                      vis_poses=None, vis_K=None,
                      view_dir=None,
                      scan_chunks: bool = False) -> Dict[str, jnp.ndarray]:
    """Render H*W rays with a fixed-size chunked jitted fn (one compile).

    Pads the last chunk to `chunk` rays so every invocation reuses the same
    executable, then trims. `view_dir` optionally overrides the (N, 3)
    directions used for the view-dependence embedding, chunked alongside
    the rays (the reference chunks `kwargs['view_dir']` the same way,
    `eval.py:91-92`).

    `scan_chunks=True` runs the whole chunk loop inside ONE jitted
    `lax.scan` dispatch instead of one device call per chunk — the
    render analog of the train path's `--scan_steps` (round-5 v5e probe:
    +4-5% from removing per-chunk dispatch, tools/probe_render_floor.py).
    Single-process only: under a multi-process mesh the per-chunk host
    loop is what keeps chunk inputs host-replicated, so callers pass
    scan_chunks only when rays are device/jnp values."""
    n = rays.shape[0]
    # numpy inputs stay numpy through slicing/padding: under a
    # multi-process mesh the chunks must reach the jitted renderer as
    # host values (treated as replicated global values by pjit)
    xp = np if isinstance(rays, np.ndarray) else jnp
    if scan_chunks and n > chunk:
        # equalize chunk sizes: ceil(n / K) rounded up to a 1024-ray
        # boundary, so a frame that is K.5 chunks long doesn't burn a
        # half-chunk of padding (512x288 = 4.5 x 32768: equalized 5 x
        # 29696 pads 0.7% instead of 11%)
        K = -(-n // chunk)
        chunk = min(chunk, ((-(-n // K) + 1023) // 1024) * 1024)
        pad = (-n) % chunk
        r_all, t_all, vd_all = rays, ts, view_dir
        if pad:
            r_all = xp.concatenate(
                [r_all, xp.broadcast_to(r_all[-1:], (pad, r_all.shape[1]))])
            if t_all is not None:
                t_all = xp.concatenate(
                    [t_all, xp.broadcast_to(t_all[-1:], (pad,))])
            if vd_all is not None:
                vd_all = xp.concatenate(
                    [vd_all,
                     xp.broadcast_to(vd_all[-1:], (pad, vd_all.shape[1]))])
        C = r_all.shape[0] // chunk
        r_g = jnp.reshape(jnp.asarray(r_all), (C, chunk, r_all.shape[1]))
        t_g = (jnp.reshape(jnp.asarray(t_all), (C, chunk))
               if t_all is not None else None)
        vd_g = (jnp.reshape(jnp.asarray(vd_all), (C, chunk, 3))
                if vd_all is not None else None)

        scanned = _scan_render_cache.get(render_fn)
        if scanned is None:
            @jax.jit
            def scanned(params, r_g, t_g, vd_g, rng, vis_poses, vis_K):
                def body(_, x):
                    r, t, vd = x
                    return None, render_fn(params, r, t, rng, vis_poses,
                                           vis_K, vd)
                _, outs = jax.lax.scan(body, None, (r_g, t_g, vd_g))
                return outs
            _scan_render_cache[render_fn] = scanned
        outs = scanned(params, r_g, t_g, vd_g, rng, vis_poses, vis_K)
        return {k: jnp.reshape(v, (C * chunk,) + v.shape[2:])[:n]
                for k, v in outs.items()}
    outs = []
    for i in range(0, n, chunk):
        r = rays[i:i + chunk]
        t = ts[i:i + chunk] if ts is not None else None
        vd = view_dir[i:i + chunk] if view_dir is not None else None
        pad = chunk - r.shape[0]
        if pad > 0:
            r = xp.concatenate([r, xp.broadcast_to(r[-1:], (pad, r.shape[1]))])
            if t is not None:
                t = xp.concatenate([t, xp.broadcast_to(t[-1:], (pad,))])
            if vd is not None:
                vd = xp.concatenate(
                    [vd, xp.broadcast_to(vd[-1:], (pad, vd.shape[1]))])
        out = render_fn(params, r, t, rng, vis_poses, vis_K, vd)
        if pad > 0:
            out = {k: v[:chunk - pad] for k, v in out.items()}
        outs.append(out)
    return {k: jnp.concatenate([o[k] for o in outs], 0) for k in outs[0]}
