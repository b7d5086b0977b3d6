"""Host-side VGI — Valid Ground-based Insertion in the data loader.

numpy twin of the on-device engine (``mopa_tpu/ops/mixmatch.py``), matching
the reference's host-side placement (``mopa/data/mixmatch_ss.py:42-559``,
invoked per iteration from ``train_xmuda_mopa.py:483-554``).

Why both exist: the device engine keeps VGI inside the jitted step (no host
dependency), but the in-step cat-domain PLAN BUILD it forces is ~1/3 of the
whole MoPA step on TPU (round-4 ab_step.py split: full 1030 ms vs no-vgi
495 ms, with SAM ~5 ms). Every input of VGI is host-resident in BOTH training
phases — ``ori_points``/``obj_pc``/``g_mask`` ship on the wire, and the scan
pseudo-labels (``ori_pseudo_label_3d``) are OFFLINE labels even in the EMA
phase (the teacher refreshes only the student-point ``pseudo_label_2d/3d``)
— so the insertion and the cat-domain voxel plan can run here, overlapped
with device compute like every other host plan, and the raw VGI inputs leave
the wire entirely.

Randomness comes from a per-batch ``np.random.Generator`` (the reference
also draws host RNG: ``np.random.choice`` in ``obj_on_road:411``); streams
differ from the device engine's jax.random but the distributions match.

Placement semantics are the device engine's (anchor ordering, blocked-disk
sequential draws, cylinder transform) — deterministic internals are
golden-tested against ``vgi_insert_sample(debug=True)`` in
``tests/test_vgi_host.py``.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from mopa_tpu.data.utils.augmentation_3d import range_projection

Z_BUDGET = 32  # must match ops/mixmatch.py


def _zprefix(occ):
    """(gx, gy, Z) occupancy -> (gx, gy, Z+1) prefix sums along z."""
    zp = np.zeros(occ.shape[:2] + (occ.shape[2] + 1,), np.int32)
    np.cumsum(occ, axis=2, out=zp[:, :, 1:])
    return zp


def _free_grid(zp, ext_box, gx_dim, gy_dim, z_budget):
    """Cells (x, y) where the ext_box-sized box anchored at (x, y, z0) is
    empty for z0 = 0 OR 1 — the anchor-placement free map.

    Arithmetic twin of the original per-cell ``_box_sum`` sweep over the 3D
    summed-area table, restructured for the 1-core host: one z-prefix diff
    selects the z-slab, a 2D summed-area table over that slab turns every
    box query into pure constant-offset SLICES (the fancy-indexed gather of
    8 full-grid index arrays was the loader's hottest numpy line)."""
    ex, ey, ez = int(ext_box[0]), int(ext_box[1]), int(ext_box[2])
    free = np.zeros((gx_dim, gy_dim), bool)
    if ex <= 0 or ey <= 0 or ez <= 0:
        return free
    nx, ny = gx_dim - ex + 1, gy_dim - ey + 1  # anchors where the box fits
    if nx <= 0 or ny <= 0:
        return free
    for z0 in (0, 1):
        if z0 + ez > z_budget:
            continue
        slab = zp[:, :, z0 + ez] - zp[:, :, z0]          # (gx, gy)
        sat2 = np.zeros((gx_dim + 1, gy_dim + 1), np.int32)
        np.cumsum(np.cumsum(slab, 0), 1, out=sat2[1:, 1:])
        box = (sat2[ex:ex + nx, ey:ey + ny] - sat2[:nx, ey:ey + ny]
               - sat2[ex:ex + nx, :ny] + sat2[:nx, :ny])
        free[:nx, :ny] |= box == 0
    return free


def vgi_insert_sample_np(points, pvalid, g_mask, objs, ovalid, obj_labels,
                         proj_matrix, img_size, rng: np.random.Generator, *,
                         voxel_size, search_range, z_min, front_axis_x,
                         insert_mode="ground", fv_z_disc=-0.324, debug=False):
    """numpy twin of ``ops.mixmatch.vgi_insert_sample`` (see its docstring
    for the reference mapping). Returns {"new_obj": (K, O, 3),
    "inserted": (K,)}."""
    objs = np.asarray(objs, np.float32)
    ovalid = np.asarray(ovalid, bool)
    k_objs = objs.shape[0]

    if insert_mode == "fv":
        shifted_z = objs[:, :, 2] - fv_z_disc
        om = np.where(ovalid[:, :, None], objs[:, :, :3], 0.0)
        cnt = np.maximum(ovalid.sum(1).astype(np.float32), 1.0)
        ctr = om.sum(1) / cnt[:, None]
        r = np.sqrt(ctr[:, 0] ** 2 + ctr[:, 1] ** 2)
        theta = np.arccos(np.clip(ctr[:, 1] / np.maximum(r, 1e-9), -1.0, 1.0))
        c2, s2 = np.cos(2.0 * theta), np.sin(2.0 * theta)
        x, y = objs[:, :, 0], objs[:, :, 1]
        xr = x * c2[:, None] + y * s2[:, None]
        yr = -x * s2[:, None] + y * c2[:, None]
        mirror = (ctr[:, 0] < 0)[:, None]
        new_obj = np.stack([np.where(mirror, xr, x),
                            np.where(mirror, yr, y), shifted_z], axis=-1)
        return {"new_obj": new_obj.astype(np.float32),
                "inserted": ovalid.sum(1) > 0}

    vs = voxel_size
    sx = int(search_range[0] / vs)
    sy = int(search_range[1] / vs)
    zmin_vox = int(math.floor(z_min / vs))
    gx_dim, gy_dim = 2 * sx, 2 * sy

    pts = np.asarray(points, np.float32)[:, :3]
    pvalid = np.asarray(pvalid, bool)
    vox = np.floor(pts / vs).astype(np.int32)
    off = (np.asarray([0, -sy, zmin_vox], np.int32) if front_axis_x
           else np.asarray([-sx, 0, zmin_vox], np.int32))
    gidx = vox - off
    inf = np.float32(1e30)

    inb = (pvalid
           & (gidx[:, 2] >= 0) & (gidx[:, 2] < Z_BUDGET)
           & (gidx[:, 0] >= 0) & (gidx[:, 0] < gx_dim)
           & (gidx[:, 1] >= 0) & (gidx[:, 1] < gy_dim))
    occ = np.zeros((gx_dim, gy_dim, Z_BUDGET), np.int32)
    occ[gidx[inb, 0], gidx[inb, 1], gidx[inb, 2]] = 1
    zp = _zprefix(occ)

    xs = np.arange(gx_dim, dtype=np.int32)
    ys = np.arange(gy_dim, dtype=np.int32)
    gxx, gyy = np.meshgrid(xs, ys, indexing="ij")

    g_sel = pvalid & np.asarray(g_mask, bool)
    g2d_ok = (g_sel & (gidx[:, 0] >= 0) & (gidx[:, 0] < gx_dim)
              & (gidx[:, 1] >= 0) & (gidx[:, 1] < gy_dim))
    gground = np.zeros((gx_dim, gy_dim), np.int32)
    gground[gidx[g2d_ok, 0], gidx[g2d_ok, 1]] = 1
    zmin_cell = np.full((gx_dim, gy_dim), inf, np.float32)
    np.minimum.at(zmin_cell, (gidx[g2d_ok, 0], gidx[g2d_ok, 1]),
                  pts[g2d_ok, 2])

    w = float(img_size[0])
    h = float(img_size[1])
    proj_matrix = np.asarray(proj_matrix, np.float32)

    valid_k = np.zeros((k_objs, gx_dim, gy_dim), bool)
    qx_k = np.zeros((k_objs, gx_dim, gy_dim), np.float32)
    qy_k = np.zeros((k_objs, gx_dim, gy_dim), np.float32)
    extent_k = np.zeros(k_objs, np.float32)
    center_k = np.zeros((k_objs, 3), np.float32)
    ominz_k = np.zeros(k_objs, np.float32)
    orange_k = np.zeros(k_objs, np.float32)
    extvox_k = np.zeros(k_objs, np.int32)
    cgx_k = np.zeros((k_objs, gx_dim, gy_dim), np.int32)
    cgy_k = np.zeros((k_objs, gx_dim, gy_dim), np.int32)

    for k in range(k_objs):
        ov = ovalid[k]
        obj = objs[k]
        om = np.where(ov[:, None], obj[:, :3], inf)
        omin_m = om.min(0)
        om = np.where(ov[:, None], obj[:, :3], -inf)
        omax_m = om.max(0)
        ovox_min = np.floor(omin_m / vs)
        ovox_max = np.floor(omax_m / vs)
        ext = (ovox_max - ovox_min + 1).astype(np.int64)
        ext_xy = int(np.ceil(np.sqrt(float(ext[0]) ** 2
                                     + float(ext[1]) ** 2)))
        ez = int(min(ext[2], Z_BUDGET - 2))
        ext_box = np.asarray([ext_xy, ext_xy, ez], np.int64)

        free = _free_grid(zp, ext_box, gx_dim, gy_dim, Z_BUDGET)

        cx = (gxx.astype(np.float32)
              + (float(ext_box[0]) - 1) / 2 + off[0]) * vs
        cy = (gyy.astype(np.float32)
              + (float(ext_box[1]) - 1) / 2 + off[1]) * vs
        qx = np.floor(cx / vs) * vs
        qy = np.floor(cy / vs) * vs

        valid = free & (cx > 0)
        cz = np.full_like(
            cx, (zmin_vox + 0.5 + (float(ext[2]) - 1) / 2) * vs)
        hom = np.stack([cx, cy, cz, np.ones_like(cx)], axis=-1)
        uvw = np.einsum("rc,xyc->xyr", proj_matrix, hom)
        den = np.where(np.abs(uvw[..., 2]) > 1e-6, uvw[..., 2], 1e-6)
        uu = uvw[..., 0] / den
        vv = uvw[..., 1] / den
        valid &= (uu > 0) & (uu < w) & (vv > 0) & (vv < h) & (uvw[..., 2] > 0)

        obj_center = (omax_m + omin_m) / 2
        ori_range = float(np.sqrt(obj_center[0] ** 2 + obj_center[1] ** 2))
        valid &= np.sqrt(cx ** 2 + cy ** 2) >= ori_range

        cgx = (np.floor(qx / vs) - off[0]).astype(np.int32)
        cgy = (np.floor(qy / vs) - off[1]).astype(np.int32)
        in_grid = (cgx >= 0) & (cgx < gx_dim) & (cgy >= 0) & (cgy < gy_dim)
        cgx_c = np.clip(cgx, 0, gx_dim - 1)
        cgy_c = np.clip(cgy, 0, gy_dim - 1)
        valid &= in_grid & (gground[cgx_c, cgy_c] > 0)

        valid_k[k] = valid
        qx_k[k], qy_k[k] = qx, qy
        extent_k[k] = np.sqrt((omax_m[0] - omin_m[0]) ** 2
                              + (omax_m[1] - omin_m[1]) ** 2) \
            if np.any(ov) else -inf
        center_k[k] = obj_center
        ominz_k[k] = omin_m[2]
        orange_k[k] = ori_range
        extvox_k[k] = ext_xy
        cgx_k[k], cgy_k[k] = cgx_c, cgy_c

    nonempty_k = ovalid.sum(1) > 0
    has_valid_k = valid_k.any(axis=(1, 2)) & nonempty_k

    order = np.argsort(-np.where(nonempty_k, extent_k, -inf), kind="stable")
    has_sorted = has_valid_k[order]
    any_success = bool(has_valid_k.any())
    pos_success = int(np.argmax(has_sorted)) if any_success else 0
    anchor = int(order[pos_success])
    rank = np.zeros(k_objs, np.int32)
    rank[order] = np.arange(k_objs, dtype=np.int32)
    inserted = any_success & (rank >= pos_success) & nonempty_k

    anchor_valid = valid_k[anchor]
    r_block = int(extvox_k[anchor])

    blocked = np.zeros((gx_dim, gy_dim), bool)
    pick = np.zeros(k_objs, np.int64)
    drew = np.zeros(k_objs, bool)
    for i in range(k_objs):
        k = int(order[i])
        if rank[k] < pos_success:
            continue
        avail = anchor_valid & ~blocked
        flat_avail = np.flatnonzero(avail.reshape(-1))
        if flat_avail.size == 0:
            continue
        p = int(rng.choice(flat_avail))
        pick[k] = p
        drew[k] = True
        px, py = p // gy_dim, p % gy_dim
        disk = ((np.abs(xs - px) <= r_block)[:, None]
                & (np.abs(ys - py) <= r_block)[None, :])
        blocked |= disk
    inserted = inserted & drew
    px, py = pick // gy_dim, pick % gy_dim

    new_cx = qx_k[anchor][px, py]
    new_cy = qy_k[anchor][px, py]
    ccx = cgx_k[anchor][px, py]
    ccy = cgy_k[anchor][px, py]
    road_z = np.where(np.isfinite(zmin_cell[ccx, ccy]), zmin_cell[ccx, ccy],
                      np.float32(z_min))

    theta_obj = np.arctan2(center_k[:, 1], center_k[:, 0])
    r_obj = orange_k
    theta_new = np.arctan2(new_cy, new_cx)
    r_new = np.sqrt(new_cx ** 2 + new_cy ** 2)
    d_r = r_new - r_obj
    d_theta = theta_new - theta_obj
    zjit = rng.uniform(0.0, 1.0, k_objs).astype(np.float32)
    z_disc = road_z - ominz_k + zjit * 0.1
    t = np.stack([d_r * np.cos(theta_obj), d_r * np.sin(theta_obj),
                  z_disc], axis=-1).astype(np.float32)
    c, s = np.cos(d_theta), np.sin(d_theta)
    zero = np.zeros_like(c)
    one = np.ones_like(c)
    rot = np.stack([
        np.stack([c, -s, zero], -1),
        np.stack([s, c, zero], -1),
        np.stack([zero, zero, one], -1)], -2).astype(np.float32)
    new_obj = np.einsum("kod,krd->kor", objs[:, :, :3] + t[:, None], rot)
    out = {"new_obj": new_obj.astype(np.float32), "inserted": inserted}
    if debug:
        out.update(valid_cells=valid_k, qx=qx_k, qy=qy_k, anchor=anchor,
                   road_z=road_z)
    return out


def vgi_host_batch(points, pvalid, scan_label, g_mask, objs, ovalid,
                   obj_labels, proj_matrix, img_size,
                   rng: np.random.Generator, *, pc_mm, aug, scale, full_scale,
                   front_axis_x) -> Dict[str, np.ndarray]:
    """numpy twin of ``ops.mixmatch.vgi_insert_batch`` (insert + occlusion +
    shared-draw augmentation + voxel quantize), producing the flat cat-domain
    arrays the trainer's VGI loss consumes.

    Args mirror the collated batch: points (B, P, 4) float, pvalid (B, P),
    scan_label (B, P) int (-100 = no pseudo-labels), g_mask (B, P),
    objs (B, K, O, 4), ovalid (B, K, O), obj_labels (B, K),
    proj_matrix (B, 3, 4), img_size (B, 2); ``pc_mm``/``aug`` are the
    TRAIN.PC_MM cfg node and the target dataset's augmentation dict.

    Returns {coords (B*N, 3) i32, valid (B*N,), label (B*N,) i32,
    obj_mask (B*N,), inserted (B, K)} with N = P + K*O.
    """
    b, p = np.asarray(pvalid).shape
    k_objs, o = np.asarray(ovalid).shape[1:3]
    points = np.asarray(points, np.float32)

    new_obj = np.zeros((b, k_objs, o, 3), np.float32)
    inserted = np.zeros((b, k_objs), bool)
    for i in range(b):
        ins = vgi_insert_sample_np(
            points[i], pvalid[i], g_mask[i], objs[i], ovalid[i],
            obj_labels[i], proj_matrix[i], img_size[i], rng,
            voxel_size=float(pc_mm.search_voxel_size),
            search_range=tuple(pc_mm.search_range),
            z_min=float(pc_mm.search_z_min),
            front_axis_x=front_axis_x,
            insert_mode=str(pc_mm.get("insert_mode", "ground")),
            fv_z_disc=-0.324)
        new_obj[i] = ins["new_obj"]
        inserted[i] = ins["inserted"]

    ko = k_objs * o
    obj_pts = new_obj.reshape(b, ko, 3)
    obj_pt_valid = (np.asarray(ovalid, bool)
                    & inserted[:, :, None]).reshape(b, ko)
    obj_pt_label = np.broadcast_to(
        np.asarray(obj_labels, np.int32)[:, :, None],
        (b, k_objs, o)).reshape(b, ko)
    any_inserted = inserted.any(axis=1)
    cat_pts = np.concatenate([points[:, :, :3], obj_pts], axis=1)
    obj_mask = np.concatenate([np.zeros((b, p), bool), obj_pt_valid], axis=1)
    cat_valid = np.concatenate(
        [np.asarray(pvalid, bool) & any_inserted[:, None], obj_pt_valid],
        axis=1)
    scan_label = np.asarray(scan_label, np.int32)
    cat_label = np.concatenate(
        [np.where(any_inserted[:, None], scan_label, -100),
         np.where(obj_pt_valid, obj_pt_label, -100)], axis=1)

    if pc_mm.use_proj:
        for i in range(b):
            # only VALID points contest pixels (padding rows sit at the
            # origin with depth ~0 and would otherwise win every contested
            # pixel) — same masking as the device occlusion_removal
            sel = np.flatnonzero(cat_valid[i])
            if sel.size == 0:
                continue
            rp = range_projection(cat_pts[i][sel], float(pc_mm.fov_up),
                                  float(pc_mm.fov_down), int(pc_mm.proj_W),
                                  int(pc_mm.proj_H),
                                  obj_mask=obj_mask[i][sel])
            cat_valid[i][sel] = rp["pres_idx"]

    # shared-draw augmentation (same draw structure as the device engine)
    rot = np.eye(3, dtype=np.float32)
    noisy_rot = float(aug.get("noisy_rot", 0.0))
    rot_z = float(aug.get("rot_z", 0.0))
    flip_x = float(aug.get("flip_x", 0.0))
    flip_y = float(aug.get("flip_y", 0.0))
    if noisy_rot > 0:
        rot = rot + noisy_rot * rng.normal(0.0, 1.0, (3, 3)).astype(np.float32)
    if flip_x > 0 or flip_y > 0:
        sign = rng.integers(0, 2, 2) * 2 - 1
        fx = sign[0] if flip_x > 0 else 1
        fy = sign[1] if flip_y > 0 else 1
        rot = rot * np.asarray([fx, fy, 1], np.float32)[:, None]
    if rot_z > 0:
        theta = float(rng.uniform(0.0, 1.0)) * rot_z
        cz, sz = np.cos(theta), np.sin(theta)
        rot = rot @ np.asarray([[cz, -sz, 0.0], [sz, cz, 0.0],
                                [0.0, 0.0, 1.0]], np.float32)
    aug_pts = np.einsum("bpc,cd->bpd", cat_pts, rot)

    coords = aug_pts * scale
    big = np.float32(1e30)
    cmin = np.min(np.where(cat_valid[..., None], coords, big), axis=1,
                  keepdims=True)
    coords = coords - np.where(np.isfinite(cmin), cmin, 0.0)
    if bool(aug.get("transl", False)):
        cmax = np.max(np.where(cat_valid[..., None], coords, -big), axis=1,
                      keepdims=True)
        offset = np.clip(full_scale - cmax - 0.001, 0, None) \
            * rng.uniform(0.0, 1.0, (b, 1, 3)).astype(np.float32)
        coords = coords + offset
    coords = np.round(coords).astype(np.int32)
    rf = (coords.min(axis=-1) >= 0) & (coords.max(axis=-1) < full_scale)
    cat_valid = cat_valid & rf

    return {
        "coords": coords.reshape(b * (p + ko), 3),
        "valid": cat_valid.reshape(-1),
        "label": np.where(cat_valid, cat_label, -100).reshape(-1)
        .astype(np.int32),
        "obj_mask": obj_mask.reshape(-1),
        "inserted": inserted,
    }
