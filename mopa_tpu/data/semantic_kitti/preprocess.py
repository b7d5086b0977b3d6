#!/usr/bin/env python
"""Offline SemanticKITTI preprocessing (reference
``mopa/data/semantic_kitti/preprocess.py:140-234``):

* ``preprocess`` — per split, front-of-car frustum filtering and path/calib
  collection into ``preprocess/<split>.pkl`` (the runtime loader reads scans
  scan-by-scan; the pkl is a path index).
* ``get_kitti_ground`` — per-scan ground indices to ``g_indices/<seq>/<frame>.bin``
  (int32). The reference shells out to the pypatchworkpp C++ module; here the
  batched JAX ground op (``mopa_tpu.ops.ground``) runs the plane fitting.

Usage: python -m mopa_tpu.data.semantic_kitti.preprocess --root_dir <dir>
         [--out_dir <dir>] [--splits train val test] [--ground]
"""

import argparse
import glob
import os
import os.path as osp
import pickle

import numpy as np

from mopa_tpu.data.semantic_kitti import splits as split_defs
from mopa_tpu.data.semantic_kitti.semantic_kitti_dataloader import (
    SemanticKITTIBase, select_points_in_frustum)


def _frames(root_dir, scenes):
    for scene in scenes:
        cam_paths = sorted(glob.glob(
            osp.join(root_dir, "dataset", "sequences", scene, "image_2", "*.png")))
        calib = SemanticKITTIBase.read_calib(
            osp.join(root_dir, "dataset", "sequences", scene, "calib.txt"))
        proj_matrix = (calib["P2"] @ calib["Tr"]).astype(np.float32)
        for cam_path in cam_paths:
            frame_id = osp.splitext(osp.basename(cam_path))[0]
            yield {
                "camera_path": cam_path,
                "lidar_path": osp.join(root_dir, "dataset", "sequences", scene,
                                       "velodyne", frame_id + ".bin"),
                "label_path": osp.join(root_dir, "dataset", "sequences", scene,
                                       "labels", frame_id + ".label"),
                "proj_matrix": proj_matrix,
                "scene": scene,
                "frame_id": frame_id,
            }


def preprocess(split_name, root_dir, out_dir, audit_stride=25):
    scenes = getattr(split_defs, split_name)
    pkl_data = []
    for data_dict in _frames(root_dir, scenes):
        pkl_data.append(dict(data_dict))
    os.makedirs(out_dir, exist_ok=True)
    save_path = osp.join(out_dir, "{}.pkl".format(split_name))
    with open(save_path, "wb") as f:
        pickle.dump(pkl_data, f)
    print("Wrote preprocessed data to " + save_path)
    if audit_stride:
        audit_split(split_name, pkl_data, out_dir, audit_stride)


def audit_split(split_name, pkl_data, out_dir, stride):
    """Project runtime voxel-table occupancy on REAL scans (every
    ``stride``-th frame, front-camera frustum like the runtime loader) and
    write ``capacity_audit_<split>.json`` — fails loudly on projected
    overflow (see ``mopa_tpu.data.capacity_audit``)."""
    from mopa_tpu.data.capacity_audit import SplitAuditor

    auditor = SplitAuditor(split_name, scale=20, full_scale=4096)
    for data_dict in pkl_data[::max(int(stride), 1)]:
        points = np.fromfile(data_dict["lidar_path"],
                             dtype=np.float32).reshape(-1, 4)[:, :3]
        keep_idx = points[:, 0] > 0  # front of car (runtime loader policy)
        pts_h = np.concatenate(
            [points[keep_idx], np.ones([int(keep_idx.sum()), 1], np.float32)],
            axis=1)
        img_points = (data_dict["proj_matrix"] @ pts_h.T).T
        img_points = img_points[:, :2] / img_points[:, 2:3]
        keep_img = select_points_in_frustum(img_points, 0, 0, 1226, 370)
        auditor.add(points[keep_idx][keep_img])
    auditor.save(osp.join(out_dir,
                          "capacity_audit_{}.json".format(split_name)))


def get_kitti_ground(split_name, root_dir, g_dir_name="g_indices"):
    """Per-scan ground indices via the JAX Patchwork-style op."""
    from mopa_tpu.ops.ground import estimate_ground_np

    scenes = getattr(split_defs, split_name)
    for scene in scenes:
        out_dir = osp.join(root_dir, g_dir_name, scene)
        os.makedirs(out_dir, exist_ok=True)
        lidar_paths = sorted(glob.glob(
            osp.join(root_dir, "dataset", "sequences", scene, "velodyne", "*.bin")))
        for lidar_path in lidar_paths:
            scan = np.fromfile(lidar_path, dtype=np.float32).reshape(-1, 4)
            g_indices = estimate_ground_np(scan)
            frame_id = osp.splitext(osp.basename(lidar_path))[0]
            g_indices.tofile(osp.join(out_dir, frame_id + ".bin"))
        print("Ground indices for sequence {} -> {}".format(scene, out_dir))


def main():
    parser = argparse.ArgumentParser(description="SemanticKITTI preprocessing")
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--ground", action="store_true",
                        help="also extract Patchwork-style ground indices")
    parser.add_argument("--audit-stride", type=int, default=25,
                        help="capacity-audit every Nth scan (0 disables)")
    args = parser.parse_args()
    out_dir = args.out_dir or osp.join(args.root_dir, "preprocess")
    for split_name in args.splits:
        print("Preprocessing split " + split_name)
        preprocess(split_name, args.root_dir, out_dir,
                   audit_stride=args.audit_stride)
        if args.ground:
            get_kitti_ground(split_name, args.root_dir)


if __name__ == "__main__":
    main()
