"""Ray generation and NDC geometry in JAX.

Functionally equivalent to the reference's `datasets/ray_utils.py` but
written for XLA: fully vectorized, static shapes, no in-place mutation.
Conventions (identical to the reference):

- camera space is "right up back" (OpenGL): rays look down -z
  (`ray_utils.py:29`), with no +0.5 pixel centering (`ray_utils.py:26-29`)
- NDC cube maps the frustum from the near plane to z in [0, 1] after the
  origin shift (`ray_utils.py:62-106`)
"""
from __future__ import annotations

import jax.numpy as jnp


def get_ray_directions(H: int, W: int, K, flatten: bool = True,
                       return_uv: bool = False):
    """Per-pixel ray directions in camera coordinates.

    Matches `ray_utils.py:7-36`: d = ((i-cx)/fx, -(j-cy)/fy, -1), no pixel
    centering. `K` is a (3, 3) intrinsics matrix.

    Returns (H*W, 3) (or (H, W, 3) if not flatten), plus the (u, v) pixel
    grid if `return_uv`.
    """
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    directions = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)
    grid = jnp.stack([i, j], -1)
    if flatten:
        directions = directions.reshape(-1, 3)
        grid = grid.reshape(-1, 2)
    if return_uv:
        return directions, grid
    return directions


def get_rays(directions, c2w):
    """World-space ray origins and normalized directions.

    Matches `ray_utils.py:39-59`. `c2w` is (3, 4).
    """
    c2w = jnp.asarray(c2w)
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o, rays_d


def get_ndc_rays(K, near, shift_near, rays_o, rays_d):
    """Project world rays into NDC with origins shifted to the near plane.

    Matches `ray_utils.py:62-106`. `near`/`shift_near` may be scalars or
    per-ray (N,) arrays.
    """
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    t = -(shift_near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (cx / fx) * ox_oz
    o1 = -1.0 / (cy / fy) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (cx / fx) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (cy / fy) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def world2ndc(xyz, K):
    """World -> NDC coordinates. Matches `ray_utils.py:109-124`."""
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ndc_x = -fx / cx * xyz[..., 0] / xyz[..., 2]
    ndc_y = -fy / cy * xyz[..., 1] / xyz[..., 2]
    ndc_z = 1 + 2 / xyz[..., 2]
    return jnp.stack([ndc_x, ndc_y, ndc_z], -1)


def ndc2world(xyz, K, eps: float = 1e-6):
    """NDC -> world coordinates. Matches `ray_utils.py:127-151`.

    `xyz`: (..., 3). `K`: (3, 3), or (N, 3, 3) matched against an
    (N, ..., 3) `xyz` (per-ray intrinsics as in the loss,
    `losses.py:99-101`). Unlike the reference this is a single broadcasted
    expression covering both ranks.
    """
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]
    if K.ndim == 3 and xyz.ndim == 3:
        # (N,) intrinsics against (N, M, 3) points
        fx, fy, cx, cy = (v[:, None] for v in (fx, fy, cx, cy))
    rz = 2.0 / (xyz[..., 2] - 1 - eps)
    rx = -rz * xyz[..., 0] * cx / fx
    ry = -rz * xyz[..., 1] * cy / fy
    return jnp.stack([rx, ry, rz], -1)


def compute_world_visibility(xyz_w, K, H: int, W: int, c2ws):
    """Visibility ("inside frustum") of world points against training cameras.

    Vectorized replacement for the reference's in-place per-camera loop
    (`ray_utils.py:154-181` driven by `models/rendering.py:191-200`): takes
    ALL camera poses at once and returns the summed visibility count.

    Inputs:
        xyz_w: (N, 3) world points
        K: (3, 3) intrinsics
        H, W: image size
        c2ws: (C, 3, 4) camera-to-world poses
    Outputs:
        (N,) float visibility counts (0 => seen by no camera)
    """
    c2ws = jnp.asarray(c2ws)
    C = c2ws.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (C, 4, 4))
    c2w4 = eye.at[:, :3].set(c2ws)
    w2c = jnp.linalg.inv(c2w4)  # (C, 4, 4)
    R, t = w2c[:, :3, :3], w2c[:, :3, 3]  # (C, 3, 3), (C, 3)

    # (C, N, 3) camera-space points
    xyz_cam = jnp.einsum("cij,nj->cni", R, xyz_w) + t[:, None]
    in_front = xyz_cam[..., 2] < 0  # front is the negative z axis
    # flip to "right down front" for projection (ray_utils.py:176)
    xyz_proj = xyz_cam * jnp.array([1.0, -1.0, -1.0])
    uvd = jnp.einsum("ij,cnj->cni", jnp.asarray(K), xyz_proj)
    denom = jnp.where(jnp.abs(uvd[..., 2]) < 1e-8,
                      jnp.sign(uvd[..., 2]) * 1e-8 + 1e-12, uvd[..., 2])
    u = uvd[..., 0] / denom
    v = uvd[..., 1] / denom
    inside = (u >= 0) & (u < W) & (v >= 0) & (v < H) & in_front
    return jnp.sum(inside.astype(jnp.float32), axis=0)
