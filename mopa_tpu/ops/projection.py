"""On-device spherical range projection + occlusion-consistent removal.

Jittable counterpart of the host version in
``mopa_tpu/data/utils/augmentation_3d.py`` (reference
``mopa/data/utils/augmentation_3d.py:161-280``): used inside the VGI engine to
drop scan points shadowed by an inserted object. The reference's O(N*M) GPU
pixel-equality join becomes two segment-min scatters over a static pixel grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_pixels(points, fov_up, fov_down, proj_w, proj_h):
    """Per-point (pixel_id, depth). points (N, 3)."""
    depth = jnp.linalg.norm(points, axis=-1)
    yaw = -jnp.arctan2(points[:, 1], points[:, 0])
    pitch = jnp.arcsin(jnp.clip(points[:, 2] / jnp.maximum(depth, 1e-12), -1, 1))
    fov = abs(fov_down) + abs(fov_up)
    px = 0.5 * (yaw / jnp.pi + 1.0) * proj_w
    py = (1.0 - (pitch + abs(fov_down)) / fov) * proj_h
    px = jnp.clip(jnp.floor(px), 0, proj_w - 1).astype(jnp.int32)
    py = jnp.clip(jnp.floor(py), 0, proj_h - 1).astype(jnp.int32)
    return py * proj_w + px, depth


def occlusion_removal(points, valid, obj_mask, fov_up, fov_down, proj_w, proj_h):
    """Presence mask after inserting an object (jit version of the reference's
    ``range_projection(..., obj_mask=...)`` path).

    A pixel is *claimed* by the object's nearest own point; every point on a
    claimed pixel competes by depth and only the closest survives.

    Returns pres (N,) bool (False also for invalid points).
    """
    n_pix = proj_w * proj_h
    pix, depth = project_pixels(points[:, :3], fov_up, fov_down, proj_w, proj_h)
    big = jnp.float32(1e30)

    # object self-occlusion: nearest object point per pixel
    obj_depth = jnp.where(valid & obj_mask, depth, big)
    obj_min = jnp.full((n_pix,), big).at[pix].min(obj_depth)
    claimed = obj_min < big

    contested = claimed[pix] & valid
    cont_depth = jnp.where(contested, depth, big)
    cont_min = jnp.full((n_pix,), big).at[pix].min(cont_depth)
    # survivor on a contested pixel = the unique closest point. Break depth
    # ties by point index to keep exactly one survivor.
    is_min = contested & (depth <= cont_min[pix])
    # tie-break: smallest index among minima
    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    idx_of_min = jnp.full((n_pix,), jnp.iinfo(jnp.int32).max).at[pix].min(
        jnp.where(is_min, idx, jnp.iinfo(jnp.int32).max))
    survivor = is_min & (idx == idx_of_min[pix])

    pres = jnp.where(contested, survivor, valid)
    return pres
