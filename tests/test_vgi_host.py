"""Host-side VGI (data/vgi_host.py) vs the device engine (ops/mixmatch.py).

The two engines share placement semantics (anchor ordering, candidate-cell
conditions, cylinder transform); RNG streams differ (numpy vs jax.random), so
parity is asserted on the DETERMINISTIC internals: candidate-cell masks,
quantized centers, anchor choice — plus end-to-end structural checks of the
shipped cat wire.
"""

import numpy as np
import pytest


def _scene(seed=0, n=1500, k_objs=2, o=160):
    """Ground plane + a wall + K small objects away from the origin."""
    rng = np.random.default_rng(seed)
    n_ground = n * 2 // 3
    gx = rng.uniform(0.5, 40.0, n_ground)
    gy = rng.uniform(-15.0, 15.0, n_ground)
    gz = rng.normal(-1.7, 0.01, n_ground)
    wall_n = n - n_ground
    wx = rng.uniform(20.0, 21.0, wall_n)
    wy = rng.uniform(-3.0, 3.0, wall_n)
    wz = rng.uniform(-1.7, 2.0, wall_n)
    pts = np.concatenate([
        np.stack([gx, gy, gz], 1), np.stack([wx, wy, wz], 1)]).astype(
        np.float32)
    pvalid = np.ones(n, bool)
    pvalid[-37:] = False  # padding tail
    g_mask = np.zeros(n, bool)
    g_mask[:n_ground] = True

    objs = np.zeros((k_objs, o, 4), np.float32)
    ovalid = np.zeros((k_objs, o), bool)
    for k in range(k_objs):
        c = np.asarray([6.0 + 3 * k, 1.5 * k, -1.4])
        objs[k, :, :3] = c + rng.uniform(-0.5, 0.5, (o, 3))
        objs[k, :, 3] = rng.uniform(0, 1, o)
        ovalid[k, : o - 10 * k] = True
    obj_labels = np.asarray([3, 7][:k_objs], np.int32)

    # simple pinhole looking down +x: u = (32x - 60y)/x, v = (24x - 60z)/x
    w, h = 64, 48
    proj = np.asarray([[32.0, -60.0, 0.0, 0.0],
                       [24.0, 0.0, -60.0, 0.0],
                       [1.0, 0.0, 0.0, 0.0]], np.float32)
    img_size = np.asarray([w, h], np.int32)
    return pts, pvalid, g_mask, objs, ovalid, obj_labels, proj, img_size


# z_min sits just above the road plane (reference default -2.0 with ground at
# z ~ -1.7): the z0=1 collision window then starts above the road layer
PARAMS = dict(voxel_size=0.5, search_range=(20.0, 20.0), z_min=-2.0,
              front_axis_x=True)


def test_valid_cells_match_device():
    import jax
    import jax.numpy as jnp

    from mopa_tpu.data.vgi_host import vgi_insert_sample_np
    from mopa_tpu.ops.mixmatch import vgi_insert_sample

    pts, pvalid, g_mask, objs, ovalid, obj_labels, proj, img_size = _scene()
    points4 = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], 1)

    host = vgi_insert_sample_np(points4, pvalid, g_mask, objs, ovalid,
                                obj_labels, proj, img_size,
                                np.random.default_rng(0), debug=True,
                                **PARAMS)
    dev = vgi_insert_sample(jnp.asarray(points4), jnp.asarray(pvalid),
                            jnp.full(pts.shape[0], -100, jnp.int32),
                            jnp.asarray(g_mask), jnp.asarray(objs),
                            jnp.asarray(ovalid), jnp.asarray(obj_labels),
                            jnp.asarray(proj),
                            jnp.asarray(img_size),
                            jax.random.PRNGKey(0), debug=True, **PARAMS)

    dv = np.asarray(dev["valid_cells"])
    assert dv.any(), "scene must yield candidate cells"
    np.testing.assert_array_equal(host["valid_cells"], dv)
    np.testing.assert_allclose(host["qx"], np.asarray(dev["qx"]), atol=1e-5)
    np.testing.assert_allclose(host["qy"], np.asarray(dev["qy"]), atol=1e-5)
    assert int(host["anchor"]) == int(np.asarray(dev["anchor"]))
    assert bool(host["inserted"].any()) == bool(
        np.asarray(dev["inserted"]).any())


def test_insert_transform_properties():
    """Inserted objects keep their shape (rigid transform), land on valid
    candidate cells, and sit on the local road height."""
    from mopa_tpu.data.vgi_host import vgi_insert_sample_np

    pts, pvalid, g_mask, objs, ovalid, obj_labels, proj, img_size = _scene()
    points4 = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], 1)
    out = vgi_insert_sample_np(points4, pvalid, g_mask, objs, ovalid,
                               obj_labels, proj, img_size,
                               np.random.default_rng(3), debug=True, **PARAMS)
    assert out["inserted"].any()
    for k in np.flatnonzero(out["inserted"]):
        ov = ovalid[k]
        d_old = np.linalg.norm(
            objs[k, ov, :2][None] - objs[k, ov, :2][:, None], axis=-1)
        d_new = np.linalg.norm(
            out["new_obj"][k, ov, :2][None]
            - out["new_obj"][k, ov, :2][:, None], axis=-1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-2)
        # z-snap: object min z == road height + U(0, 0.1)
        zlift = out["new_obj"][k, ov, 2].min() - float(
            np.asarray(out["road_z"]).reshape(-1)[k])
        assert -1e-4 <= zlift <= 0.1 + 1e-4


def test_fv_mode_mirror():
    from mopa_tpu.data.vgi_host import vgi_insert_sample_np

    rng = np.random.default_rng(1)
    o = 64
    objs = np.zeros((1, o, 4), np.float32)
    objs[0, :, :3] = np.asarray([-5.0, 2.0, -1.2]) + rng.uniform(
        -0.3, 0.3, (o, 3))
    ovalid = np.ones((1, o), bool)
    out = vgi_insert_sample_np(
        np.zeros((8, 4), np.float32), np.zeros(8, bool), np.zeros(8, bool),
        objs, ovalid, np.asarray([2]), np.eye(3, 4, dtype=np.float32),
        np.asarray([64, 48]), rng, insert_mode="fv", **PARAMS)
    assert out["inserted"][0]
    # mirrored to the front: centroid x flips sign (z only shifts)
    assert out["new_obj"][0, :, 0].mean() > 0
    r_old = np.linalg.norm(objs[0, :, :2].mean(0))
    r_new = np.linalg.norm(out["new_obj"][0, :, :2].mean(0))
    np.testing.assert_allclose(r_new, r_old, rtol=1e-3)


def test_host_batch_structure():
    from mopa_tpu.common.config import CfgNode
    from mopa_tpu.data.vgi_host import vgi_host_batch

    pts, pvalid, g_mask, objs, ovalid, obj_labels, proj, img_size = _scene()
    points4 = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], 1)
    b = 2
    pc_mm = CfgNode({
        "search_voxel_size": 0.5, "search_range": (20.0, 20.0),
        "search_z_min": -2.0, "insert_mode": "ground", "use_proj": True,
        "fov_up": 0.05235, "fov_down": -0.43633, "proj_W": 256, "proj_H": 32,
    })
    scan_label = np.full((b, pts.shape[0]), 4, np.int32)
    out = vgi_host_batch(
        np.stack([points4] * b), np.stack([pvalid] * b), scan_label,
        np.stack([g_mask] * b), np.stack([objs] * b), np.stack([ovalid] * b),
        np.stack([obj_labels] * b), np.stack([proj] * b),
        np.stack([img_size] * b), np.random.default_rng(0),
        pc_mm=pc_mm, aug={"rot_z": 6.2831, "flip_y": 0.5, "transl": True},
        scale=20, full_scale=4096, front_axis_x=True)

    p, ko = pts.shape[0], objs.shape[0] * objs.shape[1]
    n = p + ko
    assert out["coords"].shape == (b * n, 3)
    assert out["inserted"].shape == (b, objs.shape[0])
    v = out["valid"].reshape(b, n)
    lab = out["label"].reshape(b, n)
    om = out["obj_mask"].reshape(b, n)
    # in-bounds coords for valid points
    cc = out["coords"].reshape(b, n, 3)
    assert (cc[v] >= 0).all() and (cc[v] < 4096).all()
    # object points carry their class; valid scan points keep pseudo-labels
    for i in range(b):
        if out["inserted"][i].any():
            sel = om[i] & v[i]
            assert sel.any()
            assert set(np.unique(lab[i][sel])) <= set(obj_labels.tolist())
            scan_sel = v[i] & ~om[i]
            assert (lab[i][scan_sel] == 4).all()
    # occlusion can only remove points, never add
    assert v.sum() <= (np.stack([pvalid] * b).sum()
                       + (np.stack([ovalid] * b)).sum())


def test_collate_ships_cat_wire_and_strips_raw_inputs():
    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.data.build import build_dataloader

    c = cfg.clone()
    c.merge_from_file("configs/synthetic/mopa_smoke.yaml")
    c.TRAIN.BATCH_SIZE = 2
    c.TPU.POINT_BUDGET = 1024
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 1500
        d.image_size = (64, 48)
        d.length = 4
    c.DATALOADER.NUM_WORKERS = 0
    trg = next(iter(build_dataloader(c, "train", "target")))
    if "hp_rankn" not in trg:
        pytest.skip("native plan builder unavailable")
    for k in ("hp_cat_rankn", "cat_valid", "cat_label", "cat_obj_mask",
              "vgi_inserted", "_hp_cat_true_nums", "_hp_cat_caps"):
        assert k in trg, k
    # raw VGI inputs left the wire
    for k in ("ori_points", "obj_pc", "proj_matrix", "img_size", "g_mask",
              "ori_pseudo_label_3d"):
        assert k not in trg, k
    # capacity audit: the shipped schedule holds the true unique counts
    nums = np.asarray(trg["_hp_cat_true_nums"])
    caps = np.asarray(trg["_hp_cat_caps"])
    assert (nums <= caps[None, : nums.shape[1]]).all()
    # host VGI off -> device fallback wire (raw inputs present)
    c2 = c.clone()
    c2.TPU.HOST_VGI = False
    trg2 = next(iter(build_dataloader(c2, "train", "target")))
    assert "hp_cat_rankn" not in trg2 and "ori_points" in trg2
