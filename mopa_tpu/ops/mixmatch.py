"""VGI — Valid Ground-based Insertion, as a jit-compiled batched transform.

TPU-native re-design of the reference's host-side per-sample VGI engine
(``mopa/data/mixmatch_ss.py:42-559``), which ping-pongs CPU<->GPU every
iteration (``train_xmuda_mopa.py:483-554``). Here the whole pipeline runs
inside the train step with static shapes, vmapped over the batch:

1. **Collision check** (reference ``check_overlap`` :215-331): scan occupancy
   over the search window; instead of an F.conv3d with an object-sized
   all-ones kernel (dynamic shape — not jittable), a **summed-area table**
   gives the box-occupancy sum for every candidate start position in O(1),
   with the object's dynamic voxel extent handled by 8 SAT gathers. A start
   is collision-free iff its box sum is 0 — bit-identical to conv==0.
2. **FOV + range conditions** (:143-160): centers must project into the image
   frustum and lie farther than the object's original range.
3. **Ground intersection + placement** (``obj_on_road`` :355-455): candidate
   (x, y) cells must contain Patchwork-ground voxels; one valid cell is drawn
   uniformly (masked categorical); the object is moved by a cylinder
   translation preserving its azimuthal orientation (delta-r along the
   original azimuth + delta-theta z-rotation) and z-snapped to the local
   road height + U(0, 0.1) jitter.
4. **Occlusion-consistent removal** (``post_process`` :458-559 +
   ``range_projection``): scan points shadowed by the inserted object on the
   range image are dropped via segment-min scatters (ops.projection).
5. Shared-draw 3D augmentation + receptive-field filter, emitting a padded
   flat batch for the 3D network.

Samples with no valid insertion contribute nothing (all labels -100), exactly
like the reference's skip branch (:206-211).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mopa_tpu.ops.projection import occlusion_removal

# static budget for the occupancy window's z size (voxels of search_voxel_size;
# 32 * 0.5m = 16m above search_z_min — taller than any insertable object)
Z_BUDGET = 32


def _sat3(occ):
    """Inclusive 3D summed-area table, zero-padded at the front."""
    sat = jnp.cumsum(jnp.cumsum(jnp.cumsum(occ, 0), 1), 2)
    return jnp.pad(sat, ((1, 0), (1, 0), (1, 0)))


def _box_sum(sat, s, ext):
    """Occupancy sum of boxes [s, s+ext) for a (..., 3) grid of starts."""
    e = s + ext

    def g(ix, iy, iz):
        return sat[ix, iy, iz]

    x0, y0, z0 = s[..., 0], s[..., 1], s[..., 2]
    x1, y1, z1 = e[..., 0], e[..., 1], e[..., 2]
    return (g(x1, y1, z1) - g(x0, y1, z1) - g(x1, y0, z1) - g(x1, y1, z0)
            + g(x0, y0, z1) + g(x0, y1, z0) + g(x1, y0, z0) - g(x0, y0, z0))


def vgi_insert_sample(points, pvalid, ps_label, g_mask, objs, ovalid,
                      obj_labels, proj_matrix, img_size, rng, *, voxel_size,
                      search_range, z_min, front_axis_x,
                      insert_mode="ground", fv_z_disc=-0.324, debug=False):
    """Place K candidate objects into one scan. All shapes static.

    Multi-object semantics follow the reference's "ground" insert mode
    (``mixmatch_ss.py:107-192`` + ``obj_on_road`` :355-455): objects are
    ranked by xy-diagonal extent; the largest object with a non-empty
    valid-center set becomes the *anchor*. Larger objects that failed before
    the anchor are skipped; the anchor and every smaller object each draw an
    independent ground center from the anchor's valid-center set and get
    their own orientation-preserving cylinder transform (the reference does
    not re-check collisions between inserted objects).

    Args:
        points: (P, 4) unaugmented scan (xyzi).
        pvalid: (P,) scan padding mask.
        ps_label: (P,) int32 pseudo-labels for scan points (-100 allowed).
        g_mask: (P,) bool Patchwork ground mask.
        objs: (K, O, 4) object points; ovalid: (K, O).
        obj_labels: (K,) int32 class per object.
        proj_matrix: (3, 4) lidar->image projection.
        img_size: (2,) (W, H).
        front_axis_x: python bool — KITTI (x fwd) vs nuScenes (y fwd) window.

    Returns dict: new_obj (K, O, 3) transformed points, inserted (K,) bool.
    """
    import math

    single = objs.ndim == 2  # legacy (O, 4) single-object layout
    if single:
        objs = objs[None]
        ovalid = ovalid[None]
        obj_labels = jnp.asarray(obj_labels).reshape(1)

    if insert_mode == "fv":
        # Front-view mirror insertion (reference ``mixmatch_ss.py:83-105``):
        # no collision / ground / frustum checks — every non-empty object is
        # inserted; z shifts by -z_disc (sensor-height alignment) and objects
        # whose centroid lies behind the sensor (x < 0) are mirrored to the
        # front by right-multiplying with Rz(2*theta), theta = angle of the
        # centroid from the +y axis (arccos(cy / |cxy|)).
        shifted_z = objs[:, :, 2] - fv_z_disc
        om = jnp.where(ovalid[:, :, None], objs[:, :, :3], 0.0)
        cnt = jnp.maximum(jnp.sum(ovalid.astype(jnp.float32), axis=1), 1.0)
        ctr = jnp.sum(om, axis=1) / cnt[:, None]                  # (K, 3)
        r = jnp.sqrt(ctr[:, 0] ** 2 + ctr[:, 1] ** 2)
        theta = jnp.arccos(jnp.clip(
            ctr[:, 1] / jnp.maximum(r, 1e-9), -1.0, 1.0))
        c2, s2 = jnp.cos(2.0 * theta), jnp.sin(2.0 * theta)
        x, y = objs[:, :, 0], objs[:, :, 1]
        # row-vector right-multiplication: [x y] @ [[c, -s], [s, c]]
        xr = x * c2[:, None] + y * s2[:, None]
        yr = -x * s2[:, None] + y * c2[:, None]
        mirror = (ctr[:, 0] < 0)[:, None]
        new_obj = jnp.stack([jnp.where(mirror, xr, x),
                             jnp.where(mirror, yr, y), shifted_z], axis=-1)
        inserted = jnp.sum(ovalid, axis=1) > 0
        if single:
            return {"new_obj": new_obj[0], "inserted": inserted[0]}
        return {"new_obj": new_obj, "inserted": inserted}

    vs = voxel_size
    sx = int(search_range[0] / vs)
    sy = int(search_range[1] / vs)
    zmin_vox = int(math.floor(z_min / vs))
    gx_dim, gy_dim = 2 * sx, 2 * sy
    k_objs = objs.shape[0]

    pts = points[:, :3]
    vox = jnp.floor(pts / vs).astype(jnp.int32)

    if front_axis_x:
        off = jnp.asarray([0, -sy, zmin_vox], jnp.int32)
    else:
        off = jnp.asarray([-sx, 0, zmin_vox], jnp.int32)
    gidx = vox - off
    inf = jnp.float32(1e30)

    # ----- scan-level (object-independent) structures -----
    # occupancy over the full z budget; per-object z windows are enforced by
    # the box query's extent
    inb = (pvalid
           & (gidx[:, 2] >= 0) & (gidx[:, 2] < Z_BUDGET)
           & (gidx[:, 0] >= 0) & (gidx[:, 0] < gx_dim)
           & (gidx[:, 1] >= 0) & (gidx[:, 1] < gy_dim))
    flat = jnp.where(inb, (gidx[:, 0] * gy_dim + gidx[:, 1]) * Z_BUDGET
                     + jnp.clip(gidx[:, 2], 0, Z_BUDGET - 1),
                     gx_dim * gy_dim * Z_BUDGET)
    occ = jnp.zeros(gx_dim * gy_dim * Z_BUDGET + 1, jnp.int32).at[flat].max(
        inb.astype(jnp.int32))
    occ = occ[:-1].reshape(gx_dim, gy_dim, Z_BUDGET)
    sat = _sat3(occ)

    xs = jnp.arange(gx_dim, dtype=jnp.int32)
    ys = jnp.arange(gy_dim, dtype=jnp.int32)
    gxx, gyy = jnp.meshgrid(xs, ys, indexing="ij")

    # ground support: 2D ground-cell grid + min point z per cell
    g_sel = pvalid & g_mask
    g2d_ok = (g_sel & (gidx[:, 0] >= 0) & (gidx[:, 0] < gx_dim)
              & (gidx[:, 1] >= 0) & (gidx[:, 1] < gy_dim))
    flat2d = jnp.where(g2d_ok, gidx[:, 0] * gy_dim + gidx[:, 1],
                       gx_dim * gy_dim)
    gground = jnp.zeros(gx_dim * gy_dim + 1, jnp.int32).at[flat2d].max(
        g2d_ok.astype(jnp.int32))[:-1].reshape(gx_dim, gy_dim)
    zmin_cell = jnp.full(gx_dim * gy_dim + 1, inf).at[flat2d].min(
        jnp.where(g2d_ok, pts[:, 2], inf))[:-1].reshape(gx_dim, gy_dim)

    w = img_size[0].astype(jnp.float32)
    h = img_size[1].astype(jnp.float32)

    # ----- per-object candidate-cell masks -----
    def obj_valid_cells(obj, ov):
        # object extent in voxels (circumscribed xy circle for free rotation)
        om = jnp.where(ov[:, None], obj[:, :3], inf)
        omin_m = jnp.min(om, axis=0)
        om = jnp.where(ov[:, None], obj[:, :3], -inf)
        omax_m = jnp.max(om, axis=0)
        ovox_min = jnp.floor(omin_m / vs)
        ovox_max = jnp.floor(omax_m / vs)
        ext = (ovox_max - ovox_min + 1).astype(jnp.int32)
        ext_xy = jnp.ceil(jnp.sqrt(ext[0] ** 2 + ext[1] ** 2)).astype(jnp.int32)
        # box z extent = object z extent; with z-start in {0, 1} the query
        # never reads above the reference's [zmin, zmin + ez + 2) window
        ez = jnp.minimum(ext[2], Z_BUDGET - 2)
        ext_box = jnp.stack([ext_xy, ext_xy, ez])

        def collision_free(z0):
            s = jnp.stack([gxx, gyy, jnp.full_like(gxx, z0)], axis=-1)
            fits = ((s[..., 0] + ext_box[0] <= gx_dim)
                    & (s[..., 1] + ext_box[1] <= gy_dim)
                    & (z0 + ext_box[2] <= Z_BUDGET))
            e_cl = jnp.minimum(s + ext_box,
                               jnp.asarray([gx_dim, gy_dim, Z_BUDGET]))
            s_cl = jnp.minimum(s, e_cl)
            box = _box_sum(sat, s_cl, e_cl - s_cl)
            return fits & (box == 0)

        free = collision_free(0) | collision_free(1)  # (gx, gy)

        # centers in meters for (x, y) cells (z-agnostic; ground supplies z)
        cx = (gxx.astype(jnp.float32)
              + (ext_box[0].astype(jnp.float32) - 1) / 2 + off[0]) * vs
        cy = (gyy.astype(jnp.float32)
              + (ext_box[1].astype(jnp.float32) - 1) / 2 + off[1]) * vs
        # reference quantizes chosen centers back to the voxel lattice
        qx = jnp.floor(cx / vs) * vs
        qy = jnp.floor(cy / vs) * vs

        # condition 1: front half + image frustum (reference :143-153)
        valid = free & (cx > 0)
        # conv-derived z center (reference check_overlap :320-326:
        # z_start + (ext_z - 1)/2 in the [zmin, zmin+2] window; z_start
        # averaged over the {0, 1} starts checked above)
        cz = jnp.full_like(
            cx, (zmin_vox + 0.5 + (ext[2].astype(jnp.float32) - 1) / 2) * vs)
        ones = jnp.ones_like(cx)
        hom = jnp.stack([cx, cy, cz, ones], axis=-1)  # (gx, gy, 4)
        uvw = jnp.einsum("rc,xyc->xyr", proj_matrix, hom)
        den = jnp.where(jnp.abs(uvw[..., 2]) > 1e-6, uvw[..., 2], 1e-6)
        uu = uvw[..., 0] / den
        vv = uvw[..., 1] / den
        valid = valid & (uu > 0) & (uu < w) & (vv > 0) & (vv < h) \
            & (uvw[..., 2] > 0)

        # condition 2: farther than the object's original center (:155-160)
        obj_center = (omax_m + omin_m) / 2
        ori_range = jnp.sqrt(obj_center[0] ** 2 + obj_center[1] ** 2)
        valid = valid & (jnp.sqrt(cx ** 2 + cy ** 2) >= ori_range)

        # condition 3: ground support at the CENTER voxel — the reference
        # intersects floor(center/vs) with ground voxels (obj_on_road
        # :394-401), not the box start corner
        cgx = (jnp.floor(qx / vs) - off[0]).astype(jnp.int32)
        cgy = (jnp.floor(qy / vs) - off[1]).astype(jnp.int32)
        in_grid = ((cgx >= 0) & (cgx < gx_dim)
                   & (cgy >= 0) & (cgy < gy_dim))
        cgx_c = jnp.clip(cgx, 0, gx_dim - 1)
        cgy_c = jnp.clip(cgy, 0, gy_dim - 1)
        valid = valid & in_grid & (gground[cgx_c, cgy_c] > 0)

        extent_diag = jnp.sqrt((omax_m[0] - omin_m[0]) ** 2
                               + (omax_m[1] - omin_m[1]) ** 2)
        return (valid, qx, qy, extent_diag, obj_center, omin_m[2], ori_range,
                ext_xy, cgx_c, cgy_c)

    (valid_k, qx_k, qy_k, extent_k, center_k, ominz_k, orange_k,
     extvox_k, cgx_k, cgy_k) = jax.vmap(obj_valid_cells)(objs, ovalid)

    nonempty_k = jnp.sum(ovalid, axis=1) > 0
    has_valid_k = jnp.any(valid_k, axis=(1, 2)) & nonempty_k

    # anchor selection: descending xy-diagonal extent (reference :110-124)
    order = jnp.argsort(-jnp.where(nonempty_k, extent_k, -inf))
    has_sorted = has_valid_k[order]
    any_success = jnp.any(has_valid_k)
    pos_success = jnp.argmax(has_sorted)  # first True position
    anchor = order[pos_success]
    # rank of each object in the anchor order
    rank = jnp.zeros(k_objs, jnp.int32).at[order].set(
        jnp.arange(k_objs, dtype=jnp.int32))
    inserted = any_success & (rank >= pos_success) & nonempty_k

    anchor_valid = valid_k[anchor]  # (gx, gy) — shared candidate set
    anchor_qx = qx_k[anchor]
    anchor_qy = qy_k[anchor]

    # uniform draw per object over the anchor's valid cells. The reference
    # draws independently (np.random.choice per object, obj_on_road :411),
    # which can overlap two inserted objects; here draws are sequential in
    # anchor order and each placed object blocks a Chebyshev disk of the
    # anchor's xy extent — since the anchor is the largest inserted object,
    # blocked distance >= (ext_j + ext_k)/2 for every pair, so inserted
    # objects never overlap each other.
    gkey, zkey = jax.random.split(rng)
    gumbel = jax.random.gumbel(gkey, (k_objs,) + anchor_valid.shape)
    r_block = extvox_k[anchor]

    def draw_body(i, carry):
        blocked, picks, drew = carry
        k = order[i]
        avail = anchor_valid & ~blocked
        want = rank[k] >= pos_success
        has = jnp.any(avail) & want
        score = jnp.where(avail, gumbel[k], -jnp.inf)
        pick = jnp.argmax(score)
        px, py = pick // gy_dim, pick % gy_dim
        near_x = jnp.abs(xs - px) <= r_block
        near_y = jnp.abs(ys - py) <= r_block
        disk = near_x[:, None] & near_y[None, :]
        blocked = blocked | (disk & has)
        return (blocked, picks.at[k].set(pick), drew.at[k].set(has))

    _, pick, drew = jax.lax.fori_loop(
        0, k_objs, draw_body,
        (jnp.zeros((gx_dim, gy_dim), bool),
         jnp.zeros(k_objs, jnp.int32), jnp.zeros(k_objs, bool)))
    inserted = inserted & drew
    px, py = pick // gy_dim, pick % gy_dim

    new_cx = anchor_qx[px, py]
    new_cy = anchor_qy[px, py]
    # road height at the CENTER voxel's (x, y) column (reference obj_on_road
    # :434-446 reads the matched ground voxel at new_center)
    ccx = cgx_k[anchor][px, py]
    ccy = cgy_k[anchor][px, py]
    road_z = jnp.where(jnp.isfinite(zmin_cell[ccx, ccy]), zmin_cell[ccx, ccy],
                       z_min)

    # cylinder-coordinate translation per object (reference :417-451)
    theta_obj = jnp.arctan2(center_k[:, 1], center_k[:, 0])
    r_obj = orange_k
    theta_new = jnp.arctan2(new_cy, new_cx)
    r_new = jnp.sqrt(new_cx ** 2 + new_cy ** 2)
    d_r = r_new - r_obj
    d_theta = theta_new - theta_obj
    zjit = jax.random.uniform(zkey, (k_objs,))
    z_disc = road_z - ominz_k + zjit * 0.1
    t = jnp.stack([d_r * jnp.cos(theta_obj), d_r * jnp.sin(theta_obj),
                   z_disc], axis=-1)  # (K, 3)
    c, s = jnp.cos(d_theta), jnp.sin(d_theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rot = jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1)], -2)  # (K, 3, 3)
    # FIRST translate THEN rotate (reference :448-451)
    new_obj = jnp.einsum("kod,krd->kor", objs[:, :, :3] + t[:, None], rot)
    out = {"new_obj": new_obj, "inserted": inserted}
    if debug:  # candidate internals for equivalence tests (static flag)
        out.update(valid_cells=valid_k, qx=qx_k, qy=qy_k,
                   anchor=anchor, road_z=road_z)
    if single:
        return {k: v[0] if k not in ("anchor",) else v
                for k, v in out.items()}
    return out


def vgi_insert_batch(cfg, batch_trg: Dict, pl_3d, rng) -> Dict:
    """Full VGI branch for a batch: insert, occlusion-remove, augment, pack.

    Returns a dict with flat (B*(P+O)) arrays: coords, batch_idx, valid,
    feats, label, obj_mask — the input of the extra 3D forward
    (reference ``post_process`` + cat forward, train_xmuda_mopa.py:541-576).
    """
    pc_mm = cfg.TRAIN.PC_MM
    dataset_cfg = cfg.get("DATASET_TARGET")
    dkw = dataset_cfg.get(dataset_cfg.TYPE, {})
    aug = dkw.get("augmentation", {})
    scale = float(dkw.get("scale", 20))
    full_scale = int(dkw.get("full_scale", 4096))
    front_axis_x = "SEMANTICKITTI" in dataset_cfg.TYPE.upper() or \
        dataset_cfg.TYPE == "SyntheticSCN"

    points = batch_trg["ori_points"]          # (B, P, 4)
    pvalid = batch_trg["ori_points_valid"]    # (B, P)
    if "g_mask" in batch_trg:
        g_mask = batch_trg["g_mask"]
    else:
        # online ground segmentation fallback (reference obj_on_road runs
        # Patchwork++ on the host when no offline g_indices exist,
        # mixmatch_ss.py:381-388) — here the batched JAX ground op
        from mopa_tpu.ops.ground import estimate_ground

        g_mask = jax.vmap(lambda p, v: estimate_ground(p[:, :3], v))(
            points, pvalid)
    obj = batch_trg["obj_pc"]                 # (B, K, O, 4)
    ovalid = batch_trg["obj_valid"]           # (B, K, O)
    obj_label = batch_trg["obj_label"]        # (B, K)
    if obj.ndim == 3:                         # single-object legacy layout
        obj, ovalid, obj_label = (obj[:, None], ovalid[:, None],
                                  obj_label[:, None])
    proj = batch_trg["proj_matrix"]           # (B, 3, 4)
    img_size = batch_trg["img_size"]          # (B, 2)
    b, p = pvalid.shape
    k_objs, o = ovalid.shape[1], ovalid.shape[2]

    if pl_3d is None:
        scan_label = jnp.full((b, p), -100, jnp.int32)
    else:
        scan_label = batch_trg.get("ori_pseudo_label_3d",
                                   jnp.full((b, p), -100, jnp.int32))

    keys = jax.random.split(rng, b + 1)
    sample_keys, aug_key = keys[:b], keys[b]

    ins = jax.vmap(
        lambda pts, pv, psl, gm, ob, ov, ol, pm, isz, k: vgi_insert_sample(
            pts, pv, psl, gm, ob, ov, ol, pm, isz, k,
            voxel_size=float(pc_mm.search_voxel_size),
            search_range=tuple(pc_mm.search_range),
            z_min=float(pc_mm.search_z_min),
            front_axis_x=front_axis_x,
            insert_mode=str(pc_mm.get("insert_mode", "ground")),
            # point_mixmatch's z_disc default (reference mixmatch_ss.py:47 —
            # the train loop never forwards TRAIN.PC_MM.z_disc)
            fv_z_disc=-0.324)
    )(points, pvalid, scan_label, g_mask, obj, ovalid, obj_label, proj,
      img_size, sample_keys)

    inserted = ins["inserted"]                      # (B, K)
    new_obj = ins["new_obj"]                        # (B, K, O, 3)

    # concat scan + all inserted objects per sample
    ko = k_objs * o
    obj_pts = new_obj.reshape(b, ko, 3)
    obj_pt_valid = (ovalid & inserted[:, :, None]).reshape(b, ko)
    obj_pt_label = jnp.broadcast_to(
        obj_label[:, :, None].astype(jnp.int32), (b, k_objs, o)).reshape(b, ko)
    any_inserted = jnp.any(inserted, axis=1)        # (B,)
    cat_pts = jnp.concatenate([points[:, :, :3], obj_pts], axis=1)  # (B,P+KO,3)
    obj_mask = jnp.concatenate(
        [jnp.zeros((b, p), bool), obj_pt_valid], axis=1)
    cat_valid = jnp.concatenate(
        [pvalid & any_inserted[:, None], obj_pt_valid], axis=1)
    cat_label = jnp.concatenate(
        [jnp.where(any_inserted[:, None], scan_label, -100),
         jnp.where(obj_pt_valid, obj_pt_label, -100)], axis=1)

    # occlusion-consistent removal (use_proj)
    if pc_mm.use_proj:
        pres = jax.vmap(lambda pts, v, om: occlusion_removal(
            pts, v, om, float(pc_mm.fov_up), float(pc_mm.fov_down),
            int(pc_mm.proj_W), int(pc_mm.proj_H)))(cat_pts, cat_valid, obj_mask)
        cat_valid = cat_valid & pres

    # shared-draw augmentation (reference post_process list variant)
    k_rot, k_noise, k_flip, k_transl = jax.random.split(aug_key, 4)
    rot = jnp.eye(3)
    noisy_rot = float(aug.get("noisy_rot", 0.0))
    rot_z = float(aug.get("rot_z", 0.0))
    flip_x = float(aug.get("flip_x", 0.0))
    flip_y = float(aug.get("flip_y", 0.0))
    if noisy_rot > 0:
        rot = rot + noisy_rot * jax.random.normal(k_noise, (3, 3))
    if flip_x > 0 or flip_y > 0:
        sign = jax.random.randint(k_flip, (2,), 0, 2) * 2 - 1
        fx = sign[0] if flip_x > 0 else 1
        fy = sign[1] if flip_y > 0 else 1
        rot = rot * jnp.asarray([fx, fy, 1])[:, None].astype(rot.dtype)
    if rot_z > 0:
        theta = jax.random.uniform(k_rot) * rot_z
        cz, sz = jnp.cos(theta), jnp.sin(theta)
        rot = rot @ jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    aug_pts = jnp.einsum("bpc,cd->bpd", cat_pts, rot)

    coords = aug_pts * scale
    big = jnp.float32(1e30)
    cmin = jnp.min(jnp.where(cat_valid[..., None], coords, big), axis=1,
                   keepdims=True)
    coords = coords - jnp.where(jnp.isfinite(cmin), cmin, 0.0)
    transl = bool(aug.get("transl", False))
    if transl:
        cmax = jnp.max(jnp.where(cat_valid[..., None], coords, -big), axis=1,
                       keepdims=True)
        offset = jnp.clip(full_scale - cmax - 0.001, 0, None) \
            * jax.random.uniform(k_transl, (b, 1, 3))
        coords = coords + offset
    coords = jnp.round(coords).astype(jnp.int32)
    rf = (jnp.min(coords, axis=-1) >= 0) & (jnp.max(coords, axis=-1) < full_scale)
    cat_valid = cat_valid & rf

    n = p + ko
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32)[:, None], n, axis=1)
    return {
        "coords": coords.reshape(b * n, 3),
        "batch_idx": batch_idx.reshape(b * n),
        "valid": cat_valid.reshape(b * n),
        "feats": jnp.ones((b * n, 1), jnp.float32),
        "label": jnp.where(cat_valid, cat_label, -100).reshape(b * n),
        "obj_mask": obj_mask.reshape(b * n),
        "inserted": inserted,
    }
