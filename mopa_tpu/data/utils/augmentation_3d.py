"""Host-side 3D augmentation and spherical range projection (numpy).

Behavioural re-implementation of the reference utilities
(``mopa/data/utils/augmentation_3d.py:6-280``), used by the CPU data workers.
The on-device (jit) counterparts used by the VGI engine live in
``mopa_tpu.ops.projection``.

All randomness flows through an explicit ``numpy.random.Generator`` instead of
the global numpy state, so workers are reproducible and seedable per sample.
"""

from __future__ import annotations

import numpy as np


def make_rotation(rng: np.random.Generator, noisy_rot=0.0, flip_x=0.0,
                  flip_y=0.0, rot_z=0.0):
    """The reference's noisy rotation + axis flips + z-rotation composite
    (augmentation_3d.py:26-45). Returns a 3x3 matrix or None."""
    if not (noisy_rot > 0 or flip_x > 0 or flip_y > 0 or rot_z > 0):
        return None
    rot = np.eye(3, dtype=np.float32)
    if noisy_rot > 0:
        rot += rng.standard_normal((3, 3)).astype(np.float32) * noisy_rot
    if flip_x > 0:
        rot[0][0] *= int(rng.integers(0, 2)) * 2 - 1
    if flip_y > 0:
        rot[1][1] *= int(rng.integers(0, 2)) * 2 - 1
    if rot_z > 0:
        theta = float(rng.random()) * rot_z
        z_rot = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ], dtype=np.float32)
        rot = rot.dot(z_rot)
    return rot


def augment_and_scale_3d(points, scale, full_scale, rng=None, noisy_rot=0.0,
                         flip_x=0.0, flip_y=0.0, rot_z=0.0, transl=False):
    """Augment points (meters) and scale into voxel coordinates.

    Matches reference augment_and_scale_3d (:6-78): rotate/flip, multiply by
    ``scale`` (20 -> 5 cm voxels), shift to the positive octant, optional
    random translation inside the ``full_scale`` receptive field.

    Accepts a single (N, 3) array or a list of arrays that share one rotation
    and translation draw (the reference list branch, used by VGI post_process).

    Returns (coords float, aug_points) like the reference (caller casts and
    applies the in-receptive-field filter).
    """
    rng = rng or np.random.default_rng()
    rot = make_rotation(rng, noisy_rot, flip_x, flip_y, rot_z)

    if not isinstance(points, list):
        pts = points.dot(rot) if rot is not None else points
        coords = np.round(pts * scale)
        coords -= coords.min(0)
        if transl:
            offset = np.clip(full_scale - coords.max(0) - 0.001, a_min=0,
                             a_max=None) * rng.random(3)
            coords += offset
        return coords, pts

    transl_vec = rng.random(3)
    coords_ls, pts_ls = [], []
    for p in points:
        p = p.dot(rot) if rot is not None else p
        pts_ls.append(p)
        c = p * scale
        c -= c.min(0)
        if transl:
            offset = np.clip(full_scale - c.max(0) - 0.001, a_min=0,
                             a_max=None) * transl_vec
            c += offset
        coords_ls.append(c)
    return coords_ls, pts_ls


def occlusion_detector(proj_yx: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """Mark duplicate range-image pixels, keeping the closest point.

    Returns a bool mask that is True for points that are *occluded* (i.e. a
    nearer point projects to the same pixel). Matches the reference
    ``occulusion_detector`` lexsort dedup (:81-111).
    """
    order = np.lexsort((depth, proj_yx[:, 1], proj_yx[:, 0]))
    sorted_yx = proj_yx[order]
    first = np.concatenate(
        [[True], np.any(np.diff(sorted_yx, axis=0) != 0, axis=1)])
    occluded_sorted = ~first
    out = np.zeros(proj_yx.shape[0], dtype=bool)
    out[order] = occluded_sorted
    return out


def range_projection(points: np.ndarray, fov_up: float, fov_down: float,
                     proj_W: int, proj_H: int, obj_mask: np.ndarray = None) -> dict:
    """Spherical range-image projection with occlusion-consistent removal.

    Matches the reference SalsaNext-style projection (:161-280): computes
    per-point pixel coordinates; when ``obj_mask`` marks inserted object
    points, returns ``pres_idx`` — True for points that survive after (a)
    dropping scan points that land on pixels an inserted object wins by depth
    and (b) deduping by depth within those pixels.

    Pure numpy (the reference bounced the pixel-equality join through CUDA;
    here a flat-pixel-id hash join does it on the host in O(N)).
    """
    pts = points[:, :3]
    depth = np.linalg.norm(pts, 2, axis=1)
    yaw = -np.arctan2(pts[:, 1], pts[:, 0])
    pitch = np.arcsin(np.clip(pts[:, 2] / np.maximum(depth, 1e-12), -1, 1))
    fov = abs(fov_down) + abs(fov_up)

    proj_x = 0.5 * (yaw / np.pi + 1.0) * proj_W
    proj_y = (1.0 - (pitch + abs(fov_down)) / fov) * proj_H
    proj_x = np.clip(np.floor(proj_x), 0, proj_W - 1).astype(np.int32)
    proj_y = np.clip(np.floor(proj_y), 0, proj_H - 1).astype(np.int32)

    out = {"proj_x": proj_x, "proj_y": proj_y, "depth": depth}
    if obj_mask is None:
        return out

    pix = proj_y.astype(np.int64) * proj_W + proj_x
    obj_pix = pix[obj_mask]
    obj_depth = depth[obj_mask]

    # self-occlusion inside the inserted object: keep nearest per pixel
    obj_yx = np.stack([proj_y[obj_mask], proj_x[obj_mask]], axis=1)
    obj_occluded = occlusion_detector(obj_yx, obj_depth)
    obj_pix_kept = obj_pix[~obj_occluded]

    # points (scan or object) landing on object-claimed pixels
    claimed = np.zeros(proj_H * proj_W, dtype=bool)
    claimed[obj_pix_kept] = True
    disc_idx = claimed[pix]

    # among contested points keep the closest per pixel, drop the rest
    contested_yx = np.stack([proj_y[disc_idx], proj_x[disc_idx]], axis=1)
    occluded = occlusion_detector(contested_yx, depth[disc_idx])
    disc = disc_idx.copy()
    disc[disc_idx] = occluded
    out["pres_idx"] = ~disc
    return out


def build_range_input(points: np.ndarray, fov_up: float, fov_down: float,
                      proj_W: int, proj_H: int):
    """SalsaNext-style network input: rasterise a scan into a (H, W, 5)
    range image (range, x, y, z, intensity; empty pixels = -1, nearest point
    wins contested pixels) plus per-point (row, col) pixels and ranges.

    Host-side counterpart of the range path the reference's SalsaNext TYPE
    expects at eval (``mopa/data/collate.py:44-123`` range_to_point inputs).
    """
    pr = range_projection(points, fov_up, fov_down, proj_W, proj_H)
    px, py, depth = pr["proj_x"], pr["proj_y"], pr["depth"]
    pix = py.astype(np.int64) * proj_W + px
    intensity = (points[:, 3] if points.shape[1] > 3
                 else np.zeros(len(points), np.float32))
    vals = np.concatenate([depth[:, None], points[:, :3],
                           intensity[:, None]], axis=1).astype(np.float32)
    img = np.full((proj_H * proj_W, 5), -1.0, np.float32)
    order = np.argsort(-depth)  # farthest first; nearest overwrites
    img[pix[order]] = vals[order]
    proj_xy = np.stack([py, px], axis=1).astype(np.int32)
    return img.reshape(proj_H, proj_W, 5), proj_xy, depth.astype(np.float32)
