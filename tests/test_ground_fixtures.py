"""Patchwork++-fidelity fixtures for ops/ground.py.

The reference links the real Patchwork++ library for ground extraction
(``mopa/data/mixmatch_ss.py:16-18``, ``data/semantic_kitti/preprocess.py:17-19``).
These labelled synthetic scenes pin the behaviours that matter for VGI
placement quality: flat road, inclined ramp, curb+sidewalk, a vertical wall
(never ground), reflected noise below the ground (RNR), and an elevated flat
deck inside the inner rings (GLE elevation gate).
"""

import jax.numpy as jnp
import numpy as np

from mopa_tpu.ops import ground

GROUND_Z = -1.73  # sensor height above ground (KITTI convention)


def _disk(rng, n, r0, r1, z, z_sigma=0.03, th0=-np.pi, th1=np.pi):
    """Annulus sector of road-like points at height z."""
    r = np.sqrt(rng.uniform(r0 ** 2, r1 ** 2, n))
    th = rng.uniform(th0, th1, n)
    pts = np.stack([r * np.cos(th), r * np.sin(th),
                    z + rng.normal(0, z_sigma, n)], 1)
    return pts.astype(np.float32)


def _iou(pred, gt):
    inter = np.sum(pred & gt)
    union = np.sum(pred | gt)
    return inter / max(union, 1)


def _run(pts):
    return np.asarray(ground.estimate_ground(
        jnp.asarray(pts), jnp.ones(len(pts), bool)))


def test_flat_road_with_objects():
    rng = np.random.default_rng(0)
    road = _disk(rng, 8000, 2.0, 40.0, GROUND_Z)
    # car-like boxes above the ground
    objs = []
    for cx, cy in ((8.0, 3.0), (-12.0, -5.0), (20.0, 10.0)):
        o = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        o[:, 0] = cx + o[:, 0] * 1.8
        o[:, 1] = cy + o[:, 1] * 0.8
        o[:, 2] = GROUND_Z + 0.3 + (o[:, 2] + 1) * 0.6  # 0.3..1.5 m up
        objs.append(o)
    pts = np.concatenate([road] + objs)
    gt = np.zeros(len(pts), bool)
    gt[: len(road)] = True

    pred = _run(pts)
    assert _iou(pred, gt) > 0.9
    assert pred[len(road):].mean() < 0.05  # objects never ground


def test_ramp_still_ground():
    """An 8-degree uphill ramp beyond 10 m stays ground (uprightness allows
    it; the elevation gate only binds the inner rings)."""
    rng = np.random.default_rng(1)
    flat = _disk(rng, 5000, 2.0, 10.0, GROUND_Z)
    ramp = _disk(rng, 5000, 10.0, 35.0, 0.0)
    r = np.sqrt(ramp[:, 0] ** 2 + ramp[:, 1] ** 2)
    ramp[:, 2] = GROUND_Z + np.tan(np.deg2rad(8.0)) * (r - 10.0) \
        + rng.normal(0, 0.03, len(ramp)).astype(np.float32)
    pts = np.concatenate([flat, ramp])
    pred = _run(pts)
    assert pred[: len(flat)].mean() > 0.9
    assert pred[len(flat):].mean() > 0.85


def test_curb_sidewalk_and_wall():
    rng = np.random.default_rng(2)
    road = _disk(rng, 6000, 2.0, 30.0, GROUND_Z, th0=-np.pi / 2, th1=np.pi / 2)
    road = road[road[:, 1] < 5.0]
    # sidewalk 15 cm up, beyond y = 5.3
    side = _disk(rng, 6000, 2.0, 30.0, GROUND_Z + 0.15,
                 th0=-np.pi / 2, th1=np.pi / 2)
    side = side[side[:, 1] > 5.3]
    # building wall: vertical plane at x = 18, 2.5 m tall
    wall = np.stack([
        np.full(800, 18.0) + rng.normal(0, 0.02, 800),
        rng.uniform(-8, 4, 800),
        rng.uniform(GROUND_Z, GROUND_Z + 2.5, 800)], 1).astype(np.float32)
    pts = np.concatenate([road, side, wall])
    pred = _run(pts)
    n_r, n_s = len(road), len(side)
    assert pred[:n_r].mean() > 0.85               # road is ground
    assert pred[n_r:n_r + n_s].mean() > 0.7       # sidewalk is ground too
    assert pred[n_r + n_s:].mean() < 0.2          # wall never ground


def test_reflected_noise_rejected_and_seeds_uncorrupted():
    """RNR: mirror-reflection returns below the true ground must not be
    labelled ground AND must not drag the per-bin seeds down (pre-RNR, the
    lowest-z seeding latched onto them and the road's inliers vanished)."""
    rng = np.random.default_rng(3)
    road = _disk(rng, 8000, 2.0, 30.0, GROUND_Z)
    # reflections: a patch of road mirrored ~2-4 m below the surface
    noise = _disk(rng, 1200, 4.0, 12.0, GROUND_Z - 3.0, z_sigma=0.5)
    pts = np.concatenate([road, noise])
    pred = _run(pts)
    assert pred[len(road):].mean() == 0.0          # reflections never ground
    assert pred[: len(road)].mean() > 0.9          # road recall survives


def test_elevated_deck_rejected_inner_rings():
    """GLE elevation gate: a flat horizontal deck 1.2 m above the ground in
    the inner rings (e.g. a truck bed occluding the road) is upright and flat
    but sits too high to be ground."""
    rng = np.random.default_rng(4)
    road = _disk(rng, 8000, 2.0, 30.0, GROUND_Z)
    # remove road under the deck footprint (occluded)
    keep = ~((road[:, 0] > 3) & (road[:, 0] < 7)
             & (road[:, 1] > 0) & (road[:, 1] < 4))
    road = road[keep]
    deck = np.stack([rng.uniform(3, 7, 900), rng.uniform(0, 4, 900),
                     np.full(900, GROUND_Z + 1.2)
                     + rng.normal(0, 0.02, 900)], 1).astype(np.float32)
    pts = np.concatenate([road, deck])
    pred = _run(pts)
    assert pred[len(road):].mean() < 0.1
    assert pred[: len(road)].mean() > 0.85


def test_estimate_ground_np_indices():
    rng = np.random.default_rng(5)
    road = _disk(rng, 4000, 2.0, 20.0, GROUND_Z)
    idx = ground.estimate_ground_np(road)
    assert idx.dtype == np.int32
    assert len(idx) > 0.9 * len(road)
