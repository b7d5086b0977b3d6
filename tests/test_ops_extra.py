"""Tests for ground fitting, KNN post-processing, on-device projection and
the jittable VGI insertion."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.ops import ground, knn, mixmatch, projection


def test_estimate_ground_plane_scene():
    rng = np.random.default_rng(0)
    n_g, n_o = 3000, 800
    gx = rng.uniform(2, 60, n_g)
    gtheta = rng.uniform(-np.pi, np.pi, n_g)
    gpts = np.stack([gx * np.cos(gtheta), gx * np.sin(gtheta),
                     rng.normal(-1.73, 0.02, n_g)], 1)
    # boxes above the ground
    opts = np.stack([rng.uniform(5, 30, n_o), rng.uniform(-10, 10, n_o),
                     rng.uniform(-1.0, 2.0, n_o)], 1)
    pts = np.concatenate([gpts, opts]).astype(np.float32)
    valid = np.ones(pts.shape[0], bool)
    mask = np.asarray(ground.estimate_ground(jnp.asarray(pts), jnp.asarray(valid)))
    g_recall = mask[:n_g].mean()
    obj_fp = mask[n_g:].mean()
    assert g_recall > 0.85, g_recall
    assert obj_fp < 0.1, obj_fp


def test_knn_majority_vote_smooths_outlier():
    h, w = 8, 16
    proj_range = np.full((h, w), 10.0, np.float32)
    proj_label = np.full((h, w), 2, np.int32)
    proj_label[4, 8] = 7  # lone wrong label
    # 9 points at ~10m around pixel (4, 8)
    px = np.array([8, 7, 9, 8, 8, 7, 9, 7, 9], np.int32)
    py = np.array([4, 4, 4, 3, 5, 3, 5, 5, 3], np.int32)
    unproj_range = np.full(9, 10.0, np.float32)
    valid = np.ones(9, bool)
    out = np.asarray(knn.knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_label), jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(valid), nclasses=8))
    # the point at the outlier pixel gets voted to the neighborhood label
    assert out[0] == 2
    assert np.all(out == 2)


def test_occlusion_removal_matches_host():
    from mopa_tpu.data.utils.augmentation_3d import range_projection

    rng = np.random.default_rng(1)
    n = 500
    pts = np.stack([rng.uniform(3, 40, n),
                    rng.uniform(-8, 8, n),
                    rng.uniform(-1.5, 1.5, n)], 1).astype(np.float32)
    obj_mask = np.zeros(n, bool)
    obj_mask[:60] = True
    pts4 = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
    host = range_projection(pts4, 0.05235, -0.43633, 256, 32,
                            obj_mask=obj_mask)["pres_idx"]
    dev = np.asarray(projection.occlusion_removal(
        jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(obj_mask),
        0.05235, -0.43633, 256, 32))
    # identical up to depth ties (host keeps lexsort-first, device keeps
    # first-index; both keep exactly one per contested pixel)
    agree = (host == dev).mean()
    assert agree > 0.99, agree


@pytest.mark.slow
def test_vgi_insert_sample_places_on_ground():
    rng = np.random.default_rng(2)
    n = 2000
    # flat ground scene in front (x fwd)
    gx = rng.uniform(2, 40, n)
    gy = gx * rng.uniform(-0.45, 0.45, n)
    pts = np.stack([gx, gy, np.full(n, -1.7)], 1).astype(np.float32)
    pts4 = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
    pvalid = np.ones(n, bool)
    g_mask = np.ones(n, bool)
    ps_label = np.full(n, -100, np.int32)
    m = 200
    obj = np.concatenate([
        np.stack([rng.uniform(4, 5, m), rng.uniform(-0.5, 0.5, m),
                  rng.uniform(-1.7, -0.2, m)], 1),
        np.ones((m, 1))], 1).astype(np.float32)
    ovalid = np.ones(m, bool)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32)
    # lidar x fwd -> cam z fwd basis
    basis = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                     np.float32)
    proj = proj @ basis
    img_size = np.array([480, 302], np.int32)

    out = jax.jit(lambda k: mixmatch.vgi_insert_sample(
        jnp.asarray(pts4), jnp.asarray(pvalid), jnp.asarray(ps_label),
        jnp.asarray(g_mask), jnp.asarray(obj), jnp.asarray(ovalid),
        jnp.asarray(3), jnp.asarray(proj), jnp.asarray(img_size), k,
        voxel_size=0.5, search_range=(25.0, 25.0), z_min=-2.0,
        front_axis_x=True))(jax.random.PRNGKey(0))
    assert bool(out["inserted"])
    new_obj = np.asarray(out["new_obj"])
    # object stays object-shaped: the transform is rigid (translation +
    # z-rotation), so pairwise distances are preserved exactly (axis-aligned
    # extents are NOT rotation-invariant, so compare distances instead)
    d_old = np.linalg.norm(obj[None, :50, :3] - obj[:50, None, :3], axis=-1)
    d_new = np.linalg.norm(new_obj[None, :50] - new_obj[:50, None], axis=-1)
    np.testing.assert_allclose(d_new, d_old, atol=1e-3)
    ext_old = obj[:, :3].max(0) - obj[:, :3].min(0)
    ext_new = new_obj.max(0) - new_obj.min(0)
    np.testing.assert_allclose(ext_old[2], ext_new[2], rtol=1e-3)
    # placed near the ground plane and farther than the original
    assert new_obj[:, 2].min() > -1.9 and new_obj[:, 2].min() < -1.4
    r_new = np.linalg.norm((new_obj.max(0) + new_obj.min(0))[:2] / 2)
    r_old = np.linalg.norm((obj[:, :3].max(0) + obj[:, :3].min(0))[:2] / 2)
    assert r_new >= r_old * 0.95
    # orientation preserved: azimuthal extent similar after cylinder move
    # (checked implicitly by extent preservation above)


@pytest.mark.slow
def test_vgi_insert_respects_collisions():
    # scene fully occupied near ground level -> no valid insertion:
    # one point at the center of EVERY 0.5m voxel in the search window
    xs = np.arange(0.25, 25.0, 0.5)
    ys = np.arange(-24.75, 25.0, 0.5)
    zs = np.arange(-1.75, 0.5, 0.5)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    gx, gy, gz = gx.ravel(), gy.ravel(), gz.ravel()
    n = gx.shape[0]
    rng = np.random.default_rng(3)
    pts4 = np.stack([gx, gy, gz, np.ones(n)], 1).astype(np.float32)
    pvalid = np.ones(n, bool)
    g_mask = np.ones(n, bool)
    ps_label = np.full(n, -100, np.int32)
    m = 100
    obj = np.concatenate([
        np.stack([rng.uniform(3, 4, m), rng.uniform(-0.5, 0.5, m),
                  rng.uniform(-1.7, -0.7, m)], 1), np.ones((m, 1))], 1
    ).astype(np.float32)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32) @ np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    out = jax.jit(lambda k: mixmatch.vgi_insert_sample(
        jnp.asarray(pts4), jnp.asarray(pvalid), jnp.asarray(ps_label),
        jnp.asarray(g_mask), jnp.asarray(obj), jnp.ones(m, bool),
        jnp.asarray(3), jnp.asarray(proj), jnp.asarray(np.array([480, 302])),
        k, voxel_size=0.5, search_range=(25.0, 25.0), z_min=-2.0,
        front_axis_x=True))(jax.random.PRNGKey(1))
    assert not bool(out["inserted"])


def test_vgi_online_ground_fallback():
    """Without offline g_mask, VGI segments ground on device and can insert."""
    from mopa_tpu.config.xmuda import cfg

    c = cfg.clone()
    c.DATASET_TARGET.TYPE = "SyntheticSCN"
    rng = np.random.default_rng(4)
    b, p, o = 2, 1500, 64
    gx = rng.uniform(2, 40, (b, p))
    gy = gx * rng.uniform(-0.45, 0.45, (b, p))
    pts = np.stack([gx, gy, np.full((b, p), -1.7),
                    np.ones((b, p))], -1).astype(np.float32)
    obj = np.concatenate([
        np.stack([rng.uniform(4, 5, (b, o)), rng.uniform(-0.5, 0.5, (b, o)),
                  rng.uniform(-1.7, -0.8, (b, o))], -1),
        np.ones((b, o, 1))], -1).astype(np.float32)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32) @ np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    batch = {
        "ori_points": jnp.asarray(pts),
        "ori_points_valid": jnp.ones((b, p), bool),
        "obj_pc": jnp.asarray(obj),
        "obj_valid": jnp.ones((b, o), bool),
        "obj_label": jnp.full((b,), 3, jnp.int32),
        "proj_matrix": jnp.asarray(np.tile(proj[:3, :4], (b, 1, 1))),
        "img_size": jnp.asarray(np.tile([480, 302], (b, 1)).astype(np.int32)),
        # note: NO g_mask key -> online ground fallback
    }
    out = jax.jit(lambda bt, k: mixmatch.vgi_insert_batch(c, bt, None, k))(
        batch, jax.random.PRNGKey(0))
    inserted = np.asarray(out["inserted"])
    assert inserted.any(), "online ground fallback produced no insertions"


@pytest.mark.slow
def test_vgi_multi_object_insertion_no_overlap():
    """multi_objs: >=2 objects inserted in one scan, pairwise non-overlapping
    (reference point_mixmatch iterates obj_pc_ls, mixmatch_ss.py:110-212)."""
    rng = np.random.default_rng(7)
    n = 4000
    gx = rng.uniform(2, 45, n)
    gy = gx * rng.uniform(-0.45, 0.45, n)
    pts = np.stack([gx, gy, np.full(n, -1.7)], 1).astype(np.float32)
    pts4 = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
    k, m = 3, 150
    objs = []
    for i in range(k):
        sz = 0.4 + 0.4 * i  # distinct extents -> unambiguous anchor order
        o = np.stack([rng.uniform(4, 4 + sz, m), rng.uniform(-sz, sz, m),
                      rng.uniform(-1.7, -0.6, m)], 1)
        objs.append(np.concatenate([o, np.ones((m, 1))], 1))
    objs = np.stack(objs).astype(np.float32)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32) @ np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)

    out = jax.jit(lambda kk: mixmatch.vgi_insert_sample(
        jnp.asarray(pts4), jnp.ones(n, bool),
        jnp.full(n, -100, jnp.int32), jnp.ones(n, bool),
        jnp.asarray(objs), jnp.ones((k, m), bool),
        jnp.asarray([1, 2, 3], jnp.int32), jnp.asarray(proj),
        jnp.asarray(np.array([480, 302], np.int32)), kk,
        voxel_size=0.5, search_range=(25.0, 25.0), z_min=-2.0,
        front_axis_x=True))(jax.random.PRNGKey(5))

    inserted = np.asarray(out["inserted"])
    new_obj = np.asarray(out["new_obj"])
    assert inserted.sum() >= 2, inserted
    # pairwise xy separation: circumscribed-extent disks must not intersect
    ins = np.where(inserted)[0]
    centers = [(new_obj[i].max(0)[:2] + new_obj[i].min(0)[:2]) / 2 for i in ins]
    radii = [np.linalg.norm(new_obj[i].max(0)[:2] - new_obj[i].min(0)[:2]) / 2
             for i in ins]
    for a in range(len(ins)):
        for bb in range(a + 1, len(ins)):
            d = np.linalg.norm(centers[a] - centers[bb])
            assert d > radii[a] + radii[bb] - 0.5, (d, radii[a], radii[bb])
    # every inserted object keeps its rigid shape (pairwise distances; the
    # cylinder move z-rotates the object, so bbox extents are NOT invariant)
    for i in ins:
        d_old = np.linalg.norm(objs[i][:50, :3] - objs[i][50:100, :3], axis=1)
        d_new = np.linalg.norm(new_obj[i][:50] - new_obj[i][50:100], axis=1)
        np.testing.assert_allclose(d_old, d_new, rtol=1e-3, atol=1e-3)


def test_vgi_batch_multi_object_layout():
    """vgi_insert_batch consumes the (B, K, O, 4) collate layout and labels
    each object's points with its own class."""
    from mopa_tpu.config.xmuda import cfg

    c = cfg.clone()
    c.DATASET_TARGET.TYPE = "SyntheticSCN"
    rng = np.random.default_rng(9)
    b, k, o, p = 2, 2, 64, 1500
    gx = rng.uniform(2, 40, (b, p))
    gy = gx * rng.uniform(-0.45, 0.45, (b, p))
    pts = np.stack([gx, gy, np.full((b, p), -1.7),
                    np.ones((b, p))], -1).astype(np.float32)
    obj = np.concatenate([
        np.stack([rng.uniform(4, 5, (b, k, o)),
                  rng.uniform(-0.5, 0.5, (b, k, o)),
                  rng.uniform(-1.7, -0.8, (b, k, o))], -1),
        np.ones((b, k, o, 1))], -1).astype(np.float32)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32) @ np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    batch = {
        "ori_points": jnp.asarray(pts),
        "ori_points_valid": jnp.ones((b, p), bool),
        "g_mask": jnp.ones((b, p), bool),
        "obj_pc": jnp.asarray(obj),
        "obj_valid": jnp.ones((b, k, o), bool),
        "obj_label": jnp.asarray(np.tile([2, 3], (b, 1)), jnp.int32),
        "proj_matrix": jnp.asarray(np.tile(proj[:3, :4], (b, 1, 1))),
        "img_size": jnp.asarray(np.tile([480, 302], (b, 1)).astype(np.int32)),
    }
    out = jax.jit(lambda bt, kk: mixmatch.vgi_insert_batch(c, bt, None, kk))(
        batch, jax.random.PRNGKey(1))
    assert out["coords"].shape == (b * (p + k * o), 3)
    lab = np.asarray(out["label"]).reshape(b, p + k * o)
    om = np.asarray(out["obj_mask"]).reshape(b, p + k * o)
    val = np.asarray(out["valid"]).reshape(b, p + k * o)
    ins = np.asarray(out["inserted"])
    assert ins.any()
    # object points carry their own class labels
    sel0 = om[:, p:p + o] & val[:, p:p + o]
    sel1 = om[:, p + o:] & val[:, p + o:]
    if sel0.any():
        assert set(np.unique(lab[:, p:p + o][sel0])) <= {2}
    if sel1.any():
        assert set(np.unique(lab[:, p + o:][sel1])) <= {3}


def test_vgi_fv_insert_mode_matches_reference_formula():
    """insert_mode='fv' vs a numpy port of reference mixmatch_ss.py:83-105:
    z shift by -z_disc, Rz(2*theta) mirror for objects behind the sensor."""
    rng = np.random.default_rng(9)
    n, m, k = 500, 60, 3
    pts4 = np.concatenate([rng.uniform(-20, 20, (n, 3)),
                           np.ones((n, 1))], 1).astype(np.float32)
    objs = np.zeros((k, m, 4), np.float32)
    # one object clearly behind (x < 0), one in front, one straddling behind
    centers = [(-8.0, 3.0), (6.0, -2.0), (-4.0, -5.0)]
    for i, (cx, cy) in enumerate(centers):
        objs[i, :, 0] = cx + rng.uniform(-0.5, 0.5, m)
        objs[i, :, 1] = cy + rng.uniform(-0.5, 0.5, m)
        objs[i, :, 2] = rng.uniform(-1.7, -0.3, m)
        objs[i, :, 3] = 1.0
    ovalid = np.ones((k, m), bool)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32)
    img_size = np.array([480, 302], np.int32)
    z_disc = -0.324

    out = jax.jit(lambda key: mixmatch.vgi_insert_sample(
        jnp.asarray(pts4), jnp.ones(n, bool), jnp.full(n, -100, jnp.int32),
        jnp.ones(n, bool), jnp.asarray(objs), jnp.asarray(ovalid),
        jnp.asarray([3, 3, 3]), jnp.asarray(proj), jnp.asarray(img_size), key,
        voxel_size=0.5, search_range=(25.0, 25.0), z_min=-2.0,
        front_axis_x=True, insert_mode="fv",
        fv_z_disc=z_disc))(jax.random.PRNGKey(1))
    assert np.asarray(out["inserted"]).all()
    got = np.asarray(out["new_obj"])

    # numpy port of the reference branch
    for i in range(k):
        obj_pc = objs[i].copy()
        obj_pc[:, 2] = obj_pc[:, 2] - z_disc
        ctr = np.average(obj_pc, axis=0)
        if ctr[0] < 0:
            th = np.arccos(ctr[1] / np.sqrt(ctr[0] ** 2 + ctr[1] ** 2))
            rot = np.array([[np.cos(2 * th), -np.sin(2 * th), 0],
                            [np.sin(2 * th), np.cos(2 * th), 0],
                            [0, 0, 1]], np.float32)
            obj_pc[:, :3] = obj_pc[:, :3].dot(rot)
        np.testing.assert_allclose(got[i], obj_pc[:, :3], rtol=1e-4, atol=1e-4)


def _ref_valid_center_voxels(points, obj, g_pts, proj, img_w, img_h,
                             vs=0.5, srange=(25.0, 25.0), z_min=-2.0):
    """Numpy port of the reference valid-center pipeline: check_overlap
    (mixmatch_ss.py:215-331, F.conv3d == 0 over the occupancy grid),
    point_mixmatch conditions 1-2 (:143-160) and obj_on_road's ground
    intersection (:394-401). Returns the set of (x, y) center voxels."""
    sx, sy = int(srange[0] / vs), int(srange[1] / vs)
    zmin_v = int(np.floor(z_min / vs))
    pvox = np.unique(np.floor(points / vs), axis=0)
    ovox = np.floor(obj / vs)
    omin, omax = ovox.min(0), ovox.max(0)
    ext = (omax - omin + 1).astype(int)
    kx = ky = int(np.ceil(np.sqrt(ext[0] ** 2 + ext[1] ** 2)))
    kz = int(ext[2])
    gz = int((omax[2] - omin[2] + 2))  # grid z size (= kz + 1 -> 2 z starts)
    grid = np.zeros((2 * sx, 2 * sy, gz))
    off = np.array([0, -sy, zmin_v])
    keep = ((pvox[:, 0] >= 0) & (pvox[:, 0] < 2 * sx)
            & (pvox[:, 1] >= -sy) & (pvox[:, 1] < sy)
            & (pvox[:, 2] >= zmin_v) & (pvox[:, 2] < gz + zmin_v))
    iv = (pvox[keep] - off).astype(int)
    grid[iv[:, 0], iv[:, 1], iv[:, 2]] = 1
    # ground voxel (x, y) columns
    gvox = np.unique(np.floor(g_pts / vs), axis=0)
    g_xy = set(map(tuple, gvox[:, :2].astype(int)))
    obj_center = (obj.max(0) + obj.min(0)) / 2
    ori_range = np.hypot(obj_center[0], obj_center[1])

    out = set()
    csum = np.cumsum(np.cumsum(np.cumsum(grid, 0), 1), 2)
    csum = np.pad(csum, ((1, 0), (1, 0), (1, 0)))
    for xs in range(2 * sx - kx + 1):
        for ys in range(2 * sy - ky + 1):
            for zs in range(gz - kz + 1):
                s = (csum[xs + kx, ys + ky, zs + kz]
                     - csum[xs, ys + ky, zs + kz] - csum[xs + kx, ys, zs + kz]
                     - csum[xs + kx, ys + ky, zs] + csum[xs, ys, zs + kz]
                     + csum[xs, ys + ky, zs] + csum[xs + kx, ys, zs]
                     - csum[xs, ys, zs])
                if s != 0:
                    continue
                cx = (xs + (kx - 1) / 2 + off[0]) * vs
                cy = (ys + (ky - 1) / 2 + off[1]) * vs
                cz = (zs + (kz - 1) / 2 + off[2]) * vs
                if cx <= 0:                        # condition 1a: front half
                    continue
                uvw = proj @ np.array([cx, cy, cz, 1.0])
                if uvw[2] <= 0:
                    continue
                u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
                if not (0 < u < img_w and 0 < v < img_h):  # 1b: frustum
                    continue
                if np.hypot(cx, cy) < ori_range:   # condition 2: farther
                    continue
                cvx, cvy = int(np.floor(cx / vs)), int(np.floor(cy / vs))
                if (cvx, cvy) not in g_xy:         # condition 3: on ground
                    continue
                out.add((cvx, cvy))
    return out


def _vgi_scene(kind, rng):
    """Small scan geometries for the VGI equivalence test."""
    n_g = 3000
    gx = rng.uniform(0.5, 45, n_g)
    gy = rng.uniform(-20, 20, n_g)
    if kind == "flat":
        gz = np.full(n_g, -1.7)
    elif kind == "sloped":
        gz = -1.7 + 0.02 * gx
    else:  # corridor: flat ground, obstacle walls added below
        gz = np.full(n_g, -1.7)
    ground = np.stack([gx, gy, gz], 1)
    obstacles = []
    if kind == "corridor":
        for wy in (-6.0, 6.0):
            m = 800
            obstacles.append(np.stack([
                rng.uniform(2, 40, m), wy + rng.uniform(-0.4, 0.4, m),
                rng.uniform(-1.7, 1.0, m)], 1))
    else:
        for _ in range(6):
            m = 300
            cx, cy = rng.uniform(5, 35), rng.uniform(-15, 15)
            obstacles.append(np.stack([
                cx + rng.uniform(-1, 1, m), cy + rng.uniform(-1, 1, m),
                rng.uniform(-1.7, 0.0, m)], 1))
    pts = np.concatenate([ground] + obstacles).astype(np.float32)
    g_mask = np.zeros(len(pts), bool)
    g_mask[:n_g] = True
    return pts, g_mask


@pytest.mark.slow
def test_vgi_valid_center_set_matches_reference_algorithm():
    """The SAT-based candidate grid must produce EXACTLY the reference's
    valid-center voxel set (conv3d==0 semantics + conditions 1-3) on several
    scan geometries — including the 2-z-start window, which the reference's
    conv output also has (grid z size = obj extent + 2, kernel = extent + 1
    -> output z dim exactly 2; mixmatch_ss.py:258-262,315)."""
    rng = np.random.default_rng(21)
    m = 150
    obj = np.stack([6 + rng.uniform(-0.8, 0.8, m),
                    2 + rng.uniform(-0.6, 0.6, m),
                    rng.uniform(-1.6, -0.4, m)], 1).astype(np.float32)
    proj = np.array([[300, 0, 240, 0], [0, 300, 150, 0], [0, 0, 1, 0]],
                    np.float32)
    basis = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                      [0, 0, 0, 1]], np.float32)
    proj = proj @ basis
    img_size = np.array([480, 302], np.int32)

    for kind in ("flat", "corridor", "sloped"):
        pts, g_mask = _vgi_scene(kind, rng)
        pts4 = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        out = jax.jit(lambda k, p4, gm: mixmatch.vgi_insert_sample(
            p4, jnp.ones(len(pts), bool), jnp.full(len(pts), -100, jnp.int32),
            gm, jnp.asarray(obj[None]),
            jnp.ones((1, m), bool), jnp.asarray([3]), jnp.asarray(proj),
            jnp.asarray(img_size), k, voxel_size=0.5,
            search_range=(25.0, 25.0), z_min=-2.0, front_axis_x=True,
            debug=True))(jax.random.PRNGKey(0), jnp.asarray(pts4),
                         jnp.asarray(g_mask))
        valid = np.asarray(out["valid_cells"][0])
        qx = np.asarray(out["qx"][0])
        qy = np.asarray(out["qy"][0])
        got = {(int(np.floor(x / 0.5)), int(np.floor(y / 0.5)))
               for x, y, v in zip(qx.ravel(), qy.ravel(), valid.ravel()) if v}
        want = _ref_valid_center_voxels(pts, obj, pts[g_mask], proj,
                                        480, 302)
        assert got == want, (kind, len(got), len(want),
                             sorted(got - want)[:5], sorted(want - got)[:5])
        assert len(want) > 10, (kind, len(want))  # non-trivial scene
