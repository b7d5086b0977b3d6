import numpy as np
import pytest

from mopa_tpu.config.xmuda import cfg as default_cfg
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.data.collate import collate_padded, remap_mask_ids
from mopa_tpu.data.synthetic import SyntheticSCN
from mopa_tpu.data.utils.augmentation_3d import (augment_and_scale_3d,
                                                 occlusion_detector,
                                                 range_projection)
from mopa_tpu.data.utils.refine_pseudo_labels import refine_pseudo_labels


def _smoke_cfg(**target_overrides):
    c = default_cfg.clone()
    c.DATASET_SOURCE.TYPE = "SyntheticSCN"
    c.DATASET_SOURCE.TRAIN = ("train",)
    c.DATASET_TARGET.TYPE = "SyntheticSCN"
    c.DATASET_TARGET.TRAIN = ("train",)
    c.DATASET_TARGET.VAL = ("val",)
    c.DATASET_SOURCE.SyntheticSCN.length = 8
    c.DATASET_SOURCE.SyntheticSCN.n_points = 512
    c.DATASET_SOURCE.SyntheticSCN.image_size = (64, 48)
    c.DATASET_TARGET.SyntheticSCN.length = 8
    c.DATASET_TARGET.SyntheticSCN.n_points = 512
    c.DATASET_TARGET.SyntheticSCN.image_size = (64, 48)
    for k, v in target_overrides.items():
        c.DATASET_TARGET.SyntheticSCN[k] = v
    c.TRAIN.BATCH_SIZE = 2
    c.VAL.BATCH_SIZE = 2
    c.SCHEDULER.MAX_ITERATION = 3
    c.TPU.POINT_BUDGET = 512
    c.DATALOADER.NUM_WORKERS = 0
    return c


def test_augment_and_scale_3d_bounds():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    coords, aug = augment_and_scale_3d(pts, 20, 4096, rng=rng, noisy_rot=0.1,
                                       flip_y=0.5, rot_z=6.28, transl=True)
    assert coords.min() >= 0
    assert coords.shape == pts.shape
    # no augmentation: pure scaling + shift
    coords2, aug2 = augment_and_scale_3d(pts, 20, 4096, rng=rng)
    np.testing.assert_allclose(aug2, pts)
    assert np.all(coords2 == np.round(pts * 20) - np.round(pts * 20).min(0))


def test_augment_list_shares_transform():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    coords_ls, pts_ls = augment_and_scale_3d([pts, pts.copy()], 20, 4096,
                                             rng=rng, noisy_rot=0.1, rot_z=6.28,
                                             transl=True)
    np.testing.assert_allclose(pts_ls[0], pts_ls[1])
    np.testing.assert_allclose(coords_ls[0], coords_ls[1])


def test_occlusion_detector_keeps_nearest():
    yx = np.array([[0, 0], [0, 0], [1, 1], [0, 0]])
    depth = np.array([5.0, 2.0, 3.0, 7.0])
    occ = occlusion_detector(yx, depth)
    # nearest at pixel (0,0) is depth 2 -> kept; others at (0,0) occluded
    np.testing.assert_array_equal(occ, [True, False, False, True])


def test_range_projection_removes_shadowed_scan_points():
    # object point at range 5 along +x; scan point behind it at range 20 on
    # the same pixel must be removed; scan point in front (range 2) survives.
    pts = np.array([
        [5, 0, 0, 1],     # object
        [20, 0, 0, 1],    # scan, behind object -> removed
        [2, 0, 0, 1],     # scan, in front -> kept (object pixel, but nearest)
        [0, 10, 0, 1],    # scan, different pixel -> kept
    ], np.float32)
    obj_mask = np.array([True, False, False, False])
    out = range_projection(pts, fov_up=0.05235, fov_down=-0.43633,
                           proj_W=1024, proj_H=64, obj_mask=obj_mask)
    pres = out["pres_idx"]
    assert pres[2] and pres[3]
    assert not pres[1]
    # the object itself: occluded by the nearer scan point at the same pixel
    assert not pres[0]


def test_refine_pseudo_labels_median_threshold():
    probs = np.array([0.95, 0.8, 0.7, 0.6, 0.3, 0.2])
    labels = np.array([0, 0, 0, 1, 1, 1], np.int32)
    out = refine_pseudo_labels(probs, labels)
    # class 0: median 0.8 -> 0.7 dropped; class 1: median 0.3 -> 0.2 dropped
    np.testing.assert_array_equal(out, [0, 0, -100, 1, 1, -100])
    # cap at 0.9
    probs2 = np.array([0.99, 0.98, 0.91])
    labels2 = np.zeros(3, np.int32)
    out2 = refine_pseudo_labels(probs2, labels2)
    np.testing.assert_array_equal(out2, [0, 0, 0])


def test_refine_pseudo_labels_jax_matches_numpy():
    import jax.numpy as jnp

    from mopa_tpu.data.utils.refine_pseudo_labels import refine_pseudo_labels_jax

    rng = np.random.default_rng(2)
    n, c = 300, 5
    probs = rng.uniform(0.1, 1.0, n).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    valid = np.ones(n, bool)
    want = refine_pseudo_labels(probs, labels)
    got = np.asarray(refine_pseudo_labels_jax(
        jnp.asarray(probs), jnp.asarray(labels), jnp.asarray(valid), c))
    # torch median on even counts picks the lower middle; numpy interpolates.
    # Accept both threshold conventions: mismatches may only occur at points
    # whose prob equals one of the two middle order stats.
    mism = got != want
    assert mism.mean() < 0.02


def test_collate_padded_shapes_and_masks():
    ds = SyntheticSCN(length=4, n_points=600, image_size=(64, 48),
                      with_pseudo_labels=True, with_sam_mask=True,
                      with_vgi=True, with_ema=True, seed=1)
    samples = [ds[i] for i in range(3)]
    p = 512
    batch = collate_padded(samples, p, obj_budget=256, mask_budget=16)
    b = 3
    assert batch["coords"].shape == (b * p, 3)
    assert batch["img"].shape == (b, 48, 64, 3)
    assert batch["img_indices"].shape == (b, p, 2)
    assert batch["point_valid"].shape == (b, p)
    assert batch["seg_label"].shape == (b * p,)
    assert batch["sam_mask"].shape == (b, 48, 64)
    assert batch["obj_pc"].shape == (b, 1, 256, 4)
    assert batch["proj_matrix"].shape == (b, 3, 4)
    assert batch["ema_map"].shape == (b, p)
    # padding labels are ignore
    lab = batch["seg_label"].reshape(b, p)
    pv = batch["point_valid"]
    assert np.all(lab[~pv] == -100)
    # sam ids remapped into budget
    assert batch["sam_mask"].max() < 16
    assert set(np.unique(batch["sam_mask"])) <= set([-100] + list(range(16)))


def test_remap_mask_ids_prefers_large_masks():
    mask = np.zeros((10, 10), np.int32)
    mask[:, :6] = 3   # large
    mask[:, 6:8] = 7  # medium
    mask[:, 8:] = 9   # small
    out = remap_mask_ids(mask, budget=2)
    assert set(np.unique(out)) == {-100, 0, 1}
    assert (out == 0).sum() == 60 and (out == 1).sum() == 20


def test_build_dataloader_synthetic_roundtrip():
    c = _smoke_cfg(with_pseudo_labels=True, with_sam_mask=True,
                   with_vgi=True, with_ema=True)
    loader = build_dataloader(c, mode="train", domain="target")
    batches = list(iter(loader))
    assert len(batches) == 3
    batch = batches[0]
    assert batch["coords"].shape == (2 * 512, 3)
    assert "obj_pc" in batch and "sam_mask" in batch and "ema_map" in batch

    val_loader = build_dataloader(c, mode="val", domain="target")
    vb = next(iter(val_loader))
    assert "_meta" in vb and "orig_points_idx" in vb["_meta"]


def test_build_dataloader_resume_alignment():
    c = _smoke_cfg()
    l_full = build_dataloader(c, mode="train", domain="source")
    full = [b["num_points"].tolist() for b in l_full]
    l_resume = build_dataloader(c, mode="train", domain="source",
                                start_iteration=2)
    resumed = [b["num_points"].tolist() for b in l_resume]
    assert len(resumed) == 1


def test_multi_host_batch_sharding_disjoint_streams():
    """Fake 2 processes: each host takes a disjoint slice of every batch and
    the union recovers the full batch (global TRAIN.BATCH_SIZE semantics)."""
    from mopa_tpu.data.build import DataLoader
    from mopa_tpu.data.synthetic import SyntheticSCN

    ds = SyntheticSCN(length=8, n_points=300, image_size=(32, 32), seed=0)
    sampler = [np.arange(4), np.arange(4, 8)]
    loads = []
    for pi in (0, 1):
        dl = DataLoader(ds, sampler, point_budget=128, num_workers=0,
                        process_index=pi, process_count=2)
        loads.append([b for b in dl])
    for b0, b1 in zip(*loads):
        assert b0["img"].shape[0] == 2 and b1["img"].shape[0] == 2
        # disjoint: per-scan point counts come from different samples
        paths0 = b0["_meta"]["lidar_path"]
        paths1 = b1["_meta"]["lidar_path"]
        assert not set(paths0) & set(paths1)
    all_paths = sorted(
        p for ld in loads for b in ld for p in b["_meta"]["lidar_path"])
    assert all_paths == sorted(
        "synthetic/{:06d}.bin".format(i) for i in range(8))


def test_prefetch_overlaps_and_preserves_order():
    """Worker-pool prefetch yields the same batches in the same order as the
    synchronous path."""
    from mopa_tpu.data.build import DataLoader
    from mopa_tpu.data.synthetic import SyntheticSCN

    sampler = [np.arange(3), np.arange(3, 6), np.arange(6, 8)]
    sync = DataLoader(SyntheticSCN(length=8, n_points=300, image_size=(32, 32),
                                   seed=3),
                      sampler, point_budget=128, num_workers=0)
    pref = DataLoader(SyntheticSCN(length=8, n_points=300, image_size=(32, 32),
                                   seed=3),
                      sampler, point_budget=128, num_workers=3)
    got_sync = [b["_meta"]["lidar_path"] for b in sync]
    got_pref = [b["_meta"]["lidar_path"] for b in pref]
    assert got_sync == got_pref
    # early abandon must not hang
    it = iter(DataLoader(SyntheticSCN(length=8, n_points=300,
                                      image_size=(32, 32), seed=3),
                         sampler, point_budget=128, num_workers=2))
    next(it)
    del it


def test_true_level_nums_detects_overflow():
    """collate._true_level_nums must report TRUE unique counts (the builder's
    ``nums`` is clamped at capacity, and the clamp cascades into coarser
    levels — round-2 postmortem, BASELINE.md round 3). Fast: pure numpy."""
    from mopa_tpu.data.collate import _lexkey, _true_level_nums

    rng = np.random.default_rng(3)
    n, p = 900, 1024
    c = rng.integers(0, 64, size=(n, 3)).astype(np.int32)
    c = c[np.argsort(_lexkey(c), kind="stable")]
    c = np.concatenate([c, np.zeros((p - n, 3), np.int32)])
    valid = np.arange(p) < n
    got = _true_level_nums(c, valid, 3)

    want = []
    for lvl in range(3):
        cl = c[:n] >> lvl
        want.append(len(np.unique(cl, axis=0)))
    np.testing.assert_array_equal(got, np.asarray(want))
    # uniform-random points barely dedup: a tight cap MUST read as overflow
    assert got[1] > 300 and got[2] > 100


def test_host_only_keys_stripped_from_device_batch():
    """"_"-prefixed batch keys (audit fields, _meta) never ship to device."""
    from mopa_tpu.train.common import device_batch

    batch = {"img_indices": np.zeros((1, 8, 2), np.int32),
             "num_points": np.array([8], np.int32),
             "_meta": {"lidar_path": ["x"]},
             "_hp_true_nums": np.ones((1, 3), np.int32)}
    dev = device_batch(batch)
    assert not any(k.startswith("_") for k in dev)
    assert "img_indices" in dev
