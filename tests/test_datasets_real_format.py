"""End-to-end dataset tests against miniature on-disk replicas of the real
file formats (velodyne .bin / .label / calib.txt / images / preprocess .pkl),
exercising glob, calibration, frustum projection, crops, pseudo-labels,
ground masks, SAM masks, VGI object banks and collate."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest
from PIL import Image

from mopa_tpu.data.collate import collate_padded


def make_fake_kitti(root, scenes=("00", "07"), frames=2, n_points=400,
                    img_wh=(200, 120), with_extras=True):
    rng = np.random.default_rng(0)
    w, h = img_wh
    for scene in scenes:
        seq = osp.join(root, "dataset", "sequences", scene)
        for d in ("velodyne", "labels", "image_2"):
            os.makedirs(osp.join(seq, d), exist_ok=True)
        # calib: simple pinhole, lidar x fwd -> cam z fwd
        p2 = np.array([[100, 0, w / 2, 0], [0, 100, h / 2, 0], [0, 0, 1, 0]],
                      np.float64)
        tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64)
        with open(osp.join(seq, "calib.txt"), "w") as f:
            f.write("P2: " + " ".join(str(x) for x in p2.reshape(-1)) + "\n")
            f.write("Tr: " + " ".join(str(x) for x in tr.reshape(-1)) + "\n")
        with open(osp.join(seq, "poses.txt"), "w") as f:
            for _ in range(frames):
                f.write(" ".join(str(x) for x in np.eye(3, 4).reshape(-1)) + "\n")
        for fi in range(frames):
            fid = "{:06d}".format(fi)
            pts = np.stack([
                rng.uniform(2, 30, n_points),
                rng.uniform(-3, 3, n_points),
                rng.uniform(-1.8, 1.0, n_points),
                rng.uniform(0, 1, n_points),
            ], 1).astype(np.float32)
            pts.tofile(osp.join(seq, "velodyne", fid + ".bin"))
            lab = rng.choice([40, 48, 50, 70, 10], n_points).astype(np.uint32)
            lab = lab | (np.uint32(3) << np.uint32(16))  # instance bits
            lab.tofile(osp.join(seq, "labels", fid + ".label"))
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8)).save(
                osp.join(seq, "image_2", fid + ".png"))
            if with_extras:
                os.makedirs(osp.join(root, "g_indices", scene), exist_ok=True)
                g = np.arange(0, n_points, 3, dtype=np.int32)
                g.tofile(osp.join(root, "g_indices", scene, fid + ".bin"))
                os.makedirs(osp.join(root, "img_mask", scene), exist_ok=True)
                rng.integers(0, 12, (h, w), np.uint8).tofile(
                    osp.join(root, "img_mask", scene, fid + ".bin"))
    if with_extras:
        # rare-object bank
        for cls in ("person", "bicycle", "motorcycle"):
            d = osp.join(root, "objects", cls)
            os.makedirs(d, exist_ok=True)
            for i in range(2):
                m = 50
                obj = np.concatenate([
                    np.stack([rng.uniform(4, 6, m), rng.uniform(-1, 1, m),
                              rng.uniform(-1.7, -0.5, m)], 1),
                    rng.uniform(0, 1, (m, 1))], 1).astype(np.float32)
                obj.tofile(osp.join(d, "{:05d}.bin".format(i)))
    return root


def test_semantic_kitti_scn_full_pipeline(tmp_path):
    from mopa_tpu.data.semantic_kitti.semantic_kitti_dataloader import \
        SemanticKITTISCN

    root = make_fake_kitti(str(tmp_path))
    ds = SemanticKITTISCN(
        split=("train",), root_dir=root, merge_classes=True,
        bottom_crop=(96, 64), fliplr=0.5, color_jitter=(0.4, 0.4, 0.4),
        noisy_rot=0.1, flip_y=0.5, rot_z=6.2831, transl=True,
        use_pc_mm=True, obj_name_ls=["person", "bicycle", "motorcycle"],
        obj_root_dir=osp.join(root, "objects"),
        g_indices_dir="g_indices", sam_mask_dir="img_mask", ema_input=True,
        rng=np.random.default_rng(1))
    # train split covers sequences 00..06,09,10 -> only 00 exists here
    assert len(ds) == 2
    s = ds[0]
    n = s["coords"].shape[0]
    assert s["coords"].shape == (n, 3) and n > 0
    assert s["seg_label"].shape == (n,)
    assert s["img_indices"].shape == (n, 2)
    assert s["img"].shape == (64, 96, 3)
    assert s["sam_mask"].shape == (64, 96)
    assert s["ori_obj_pc"][0].shape[1] == 4
    assert s["ori_points"].shape[1] == 4
    assert s["g_indices"].dtype == bool
    assert s["ema_map"].shape == (n,)
    assert (np.asarray(s["seg_label"]) < 10).all()
    # class-merge sanity: road(40)->4, car(10)->0
    assert set(np.unique(s["seg_label"])) <= {-100, 0, 2, 4, 6, 7, 8}

    batch = collate_padded([ds[0], ds[1]], point_budget=512, obj_budget=64,
                           mask_budget=12)
    assert batch["coords"].shape == (2 * 512, 3)
    assert batch["obj_pc"].shape == (2, 1, 64, 4)
    assert batch["g_mask"].shape == (2, 512)


def test_semantic_kitti_eval_mode(tmp_path):
    from mopa_tpu.data.semantic_kitti.semantic_kitti_dataloader import \
        SemanticKITTISCN

    root = make_fake_kitti(str(tmp_path), with_extras=False)
    ds = SemanticKITTISCN(split=("val",), root_dir=root, merge_classes=True,
                          bottom_crop=(96, 64), output_orig=True,
                          rng=np.random.default_rng(2))
    s = ds[0]
    assert "orig_seg_label" in s and "orig_points_idx" in s
    assert "ori_keep_idx" in s and "ori_img_points" in s


def test_nuscenes_scn_pkl_pipeline(tmp_path):
    from mopa_tpu.data.nuscenes.nuscenes_dataloader import NuScenesSCN

    rng = np.random.default_rng(3)
    root = str(tmp_path)
    n = 300
    w, h = 400, 225  # resize target equals original here? use bigger original
    ow, oh = 800, 450
    os.makedirs(osp.join(root, "samples", "CAM_FRONT"), exist_ok=True)
    os.makedirs(osp.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(osp.join(root, "preprocess"), exist_ok=True)
    samples = []
    for i in range(3):
        cam = "samples/CAM_FRONT/img{}.jpg".format(i)
        Image.fromarray(rng.integers(0, 255, (oh, ow, 3), np.uint8)).save(
            osp.join(root, cam))
        pts = np.stack([rng.uniform(-10, 10, n), rng.uniform(3, 40, n),
                        rng.uniform(-1.8, 1.5, n)], 1).astype(np.float32)
        points_img = np.stack([rng.uniform(0, oh - 1, n),
                               rng.uniform(0, ow - 1, n)], 1).astype(np.float32)
        samples.append({
            "points": pts,
            "seg_labels": rng.integers(0, 11, n).astype(np.uint8),
            "points_img": points_img,
            "lidar_path": "samples/LIDAR_TOP/scan{}.bin".format(i),
            "camera_path": cam,
            "valid_mask": np.ones(2 * n, bool)[:n],
            "proj_matrix": np.eye(4, dtype=np.float32),
        })
    with open(osp.join(root, "preprocess", "train_usa.pkl"), "wb") as f:
        pickle.dump(samples, f)

    ds = NuScenesSCN(split=("train_usa",),
                     preprocess_dir=osp.join(root, "preprocess"),
                     nuscenes_dir=root, label_mode="object",
                     merge_classes=True, resize=(400, 225), fliplr=0.5,
                     color_jitter=(0.4, 0.4, 0.4), noisy_rot=0.1, flip_x=0.5,
                     rot_z=6.2831, transl=True, rng=np.random.default_rng(4))
    assert ds.class_names == ["vehicle", "pedestrian", "bike",
                              "traffic_boundary", "background"]
    s = ds[0]
    m = s["coords"].shape[0]
    assert s["img"].shape == (225, 400, 3)
    assert s["img_indices"].shape == (m, 2)
    assert (s["img_indices"][:, 0] < 225).all()
    assert (s["img_indices"][:, 1] < 400).all()
    assert set(np.unique(s["seg_label"])) <= set(range(5)) | {-100}


def test_a2d2_scn_pkl_pipeline(tmp_path):
    import json

    from mopa_tpu.data.a2d2.a2d2_dataloader import A2D2SCN, A2D2Base

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    os.makedirs(osp.join(root, "preprocess"), exist_ok=True)
    # class_list.json: 38 hex colors -> the reference class names
    names38 = [c for cat in A2D2Base.categories_s.values() for c in cat]
    extra = ["Sky", "Utility vehicle 1", "Utility vehicle 2", "Tractor",
             "Non-drivable street", "Blurred area", "Rain dirt"]
    all_names = names38 + extra
    class_list = {"#{:06x}".format(17 * (i + 1)): n
                  for i, n in enumerate(all_names)}
    with open(osp.join(root, "class_list.json"), "w") as f:
        json.dump(class_list, f)
    with open(osp.join(root, "cams_lidars.json"), "w") as f:
        json.dump({"cameras": {}}, f)

    n = 200
    ow, oh = 960, 604
    os.makedirs(osp.join(root, "imgs"), exist_ok=True)
    cam = "imgs/a.png"
    Image.fromarray(rng.integers(0, 255, (oh, ow, 3), np.uint8)).save(
        osp.join(root, cam))
    samples = [{
        "points": np.stack([rng.uniform(2, 40, n), rng.uniform(-5, 5, n),
                            rng.uniform(-1.8, 1.0, n)], 1).astype(np.float32),
        "seg_labels": rng.integers(0, len(all_names), n).astype(np.uint8),
        "points_img": np.stack([rng.uniform(0, oh - 1, n),
                                rng.uniform(0, ow - 1, n)], 1).astype(np.float32),
        "feats": rng.uniform(0, 1, (n, 1)).astype(np.float32),
        "camera_path": cam,
        "lidar_path": "lidar/a.npz",
    }]
    with open(osp.join(root, "preprocess", "train.pkl"), "wb") as f:
        pickle.dump(samples, f)

    ds = A2D2SCN(split=("train",), preprocess_dir=root, merge_classes=True,
                 resize=(480, 302), fliplr=0.5, noisy_rot=0.1, flip_y=0.5,
                 rot_z=6.2831, transl=True, rng=np.random.default_rng(6))
    assert len(ds.class_names) == 10
    s = ds[0]
    assert s["img"].shape == (302, 480, 3)
    assert (np.asarray(s["seg_label"]) < 10).all()
