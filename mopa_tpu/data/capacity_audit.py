"""Real-scan voxel-capacity audit.

The fixed-capacity voxel tables (``scn_unet.CAP_FACTORS``) were derived from
the TRUE per-level dedup curve of synthetic LiDAR-geometry scans
(BASELINE.md rounds 3-4); real KITTI/nuScenes/A2D2 scans at the runtime
point budget may dedup differently, and a capacity overflow silently drops
voxels (round-2 postmortem). This module projects the runtime occupancy of
REAL scans the moment real data exists:

* the offline preprocess pipelines run a :class:`SplitAuditor` over (a
  stride of) each split's scans and write ``capacity_audit_<split>.json``
  next to the pkl, failing LOUDLY on projected overflow
  (reference preprocess: ``mopa/data/semantic_kitti/preprocess.py:140-234``);
* ``tools/parity_check.py`` audits the scan it evaluates and embeds the
  occupancy in its report.

The dedup count is computed independently of the plan builder
(``collate._true_level_nums`` — the builder's own counts clamp at capacity
and can never reveal overflow).
"""

from __future__ import annotations

import json

import numpy as np

from mopa_tpu.models.scn_unet import CAP_FACTORS


def coords_occupancy(coords: np.ndarray, *, point_budget: int = 16384,
                     cap_factors=None, num_levels: int = 7,
                     rng: "np.random.Generator | None" = None) -> np.ndarray:
    """Projected per-level occupancy of one scan's VOXEL coords (already
    scaled ints, e.g. a parity golden's ``coords``) at runtime settings:
    subsample uniformly to ``point_budget`` (``collate``'s budget policy),
    then divide each level's TRUE unique count by its capacity. Values > 1.0
    mean the runtime tables would overflow-drop voxels."""
    from mopa_tpu.data.collate import _true_level_nums

    rng = rng or np.random.default_rng(0)
    coords = np.asarray(coords, np.int64)
    if coords.shape[0] > point_budget:
        sel = rng.choice(coords.shape[0], point_budget, replace=False)
        coords = coords[sel]
    factors = tuple(cap_factors) if cap_factors else CAP_FACTORS[:num_levels]
    caps = np.asarray([max(int(point_budget * f), 128) for f in factors],
                      np.float64)
    nums = _true_level_nums(coords, np.ones(coords.shape[0], bool),
                            len(factors))
    return nums.astype(np.float64) / caps


def scan_occupancy(points_xyz: np.ndarray, *, scale: float = 20.0,
                   full_scale: int = 4096, point_budget: int = 16384,
                   cap_factors=None, num_levels: int = 7,
                   rng: "np.random.Generator | None" = None) -> np.ndarray:
    """Projected per-level occupancy of one raw scan at runtime settings.

    Mirrors the runtime path with augmentation OFF: voxelize at ``scale``
    (``augmentation_3d.augment_and_scale_3d``), keep the in-receptive-field
    points, then :func:`coords_occupancy`.
    """
    pts = np.asarray(points_xyz, np.float64)[:, :3]
    coords = np.round(pts * scale)
    coords -= coords.min(0)
    keep = (coords.min(1) >= 0) & (coords.max(1) < full_scale)
    return coords_occupancy(coords[keep], point_budget=point_budget,
                            cap_factors=cap_factors, num_levels=num_levels,
                            rng=rng)


class SplitAuditor:
    """Accumulates per-scan occupancies for one split and reports the
    envelope the capacity schedule must cover."""

    def __init__(self, split_name: str, **kw):
        self.split_name = split_name
        self.kw = kw
        self.occ = []

    def add(self, points_xyz: np.ndarray) -> None:
        self.occ.append(scan_occupancy(points_xyz, **self.kw))

    def report(self) -> dict:
        if not self.occ:
            return {"split": self.split_name, "n_scans": 0}
        occ = np.stack(self.occ)  # (N, L)
        return {
            "split": self.split_name,
            "n_scans": int(occ.shape[0]),
            "point_budget": int(self.kw.get("point_budget", 16384)),
            "occupancy_max_per_level": [round(float(x), 4)
                                        for x in occ.max(0)],
            "occupancy_p99_per_level": [
                round(float(x), 4) for x in np.percentile(occ, 99, axis=0)],
            "occupancy_mean_per_level": [round(float(x), 4)
                                         for x in occ.mean(0)],
            "projected_overflow": bool(occ.max() > 1.0),
            "overflow_scan_fraction": round(
                float((occ.max(1) > 1.0).mean()), 4),
        }

    def save(self, path: str, print_fn=print) -> dict:
        rep = self.report()
        with open(path, "w") as f:
            json.dump(rep, f, indent=1)
        if rep.get("projected_overflow"):
            print_fn(
                "[capacity_audit] *** PROJECTED VOXEL OVERFLOW on split "
                "'{}': occupancy max {} — raise TPU.CAP_FACTORS or the "
                "point budget, or deep UNet levels will silently see a "
                "lexicographic prefix of each scene ({}).".format(
                    self.split_name, rep["occupancy_max_per_level"], path))
        else:
            print_fn("[capacity_audit] split '{}': no projected overflow "
                     "(max occupancy {}) -> {}".format(
                         self.split_name,
                         rep.get("occupancy_max_per_level"), path))
        return rep
