"""Real-scan capacity-audit hook (mopa_tpu/data/capacity_audit.py)."""

import json
import os

import numpy as np

from mopa_tpu.data.capacity_audit import (SplitAuditor, coords_occupancy,
                                          scan_occupancy)


def _lidar_like(rng, n=24000):
    """Ring-structured LiDAR geometry (the dedup-realistic generator the
    capacity schedule was derived from — data/synthetic.py)."""
    from mopa_tpu.data.synthetic import SyntheticSCN

    ds = SyntheticSCN(n_points=n)
    pts, _, _ = ds._scan(rng)
    return pts


def test_scan_occupancy_shape_and_range():
    rng = np.random.default_rng(0)
    occ = scan_occupancy(_lidar_like(rng), scale=20, full_scale=4096,
                         point_budget=16384)
    assert occ.shape == (7,)
    assert np.all(occ > 0)
    # the default schedule must hold on LiDAR-like dedup (the whole point)
    assert occ.max() <= 1.0, occ


def test_overflow_detected_on_non_deduping_coords():
    # random-uniform coords barely dedup across levels: deep-level counts
    # stay near the budget and MUST overflow the LiDAR-curve capacities
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 4096, size=(16384, 3))
    occ = coords_occupancy(coords, point_budget=16384)
    assert occ.max() > 1.0, occ


def test_split_auditor_report_and_save(tmp_path):
    rng = np.random.default_rng(2)
    a = SplitAuditor("val", scale=20, full_scale=4096, point_budget=16384)
    for _ in range(3):
        a.add(_lidar_like(rng, n=20000))
    path = os.path.join(str(tmp_path), "audit.json")
    rep = a.save(path)
    assert rep["n_scans"] == 3
    assert len(rep["occupancy_max_per_level"]) == 7
    assert rep["projected_overflow"] is False
    with open(path) as f:
        assert json.load(f)["split"] == "val"
