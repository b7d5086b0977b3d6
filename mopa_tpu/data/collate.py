"""Padded batch assembly for TPU static shapes.

TPU-native replacement of the reference SCN collate
(``mopa/data/collate.py:125-294``): instead of ragged flat concatenation with
per-sample Python lists, every per-point tensor is padded/truncated to a
static per-sample budget P, so the whole batch is a pytree of fixed-shape
arrays that feeds one jitted train step. Batch indices still ride next to the
voxel coordinates (flattened (B*P, ...) layout for the 3D branch).

Output keys (superset, by feature availability — mirrors the reference's):

    img (B,H,W,3) NHWC          img_indices (B,P,2)      point_valid (B,P)
    coords (B*P,3) batch_idx (B*P,)  feats (B*P,Cin)     seg_label (B*P,)
    pseudo_label_2d/3d (B*P,)
    sam_mask (B,H,W) (ids remapped into a static budget)
    EMA:  ori_img (B,H,W,3)  ori_img_indices (B,P,2)  ori_coords (B*P,3)
          ori_batch_idx (B*P,)  ori_point_valid (B,P)  ori_feats (B*P,Cin)
          ema_map (B,P): student-point -> ori-point index (-1 pad)
    VGI:  ori_points (B,P,4)  ori_points_valid (B,P)  g_mask (B,P)
          obj_pc (B,K,O,4)  obj_valid (B,K,O)  obj_label (B,K)
          proj_matrix (B,3,4)  img_size (B,2)
    num_points (B,) true counts (diagnostics / overflow accounting)

Wire format: arrays are emitted in COMPACT dtypes so host->device transfers
ship the fewest bytes (the tunnel/PCIe link is the e2e bottleneck, VERDICT
r2 §weak-2): images as uint8 (exactly what the reference's PIL pipeline
holds before its /255, so the quantisation is parity-exact), voxel coords /
pixel indices / labels / mask ids as int16, feats as float16. The jitted
step widens them back via ``mopa_tpu.train.common.decode_batch``; datasets
configured with an ``image_normalizer`` keep float32 images (the wire
quantisation only applies to the [0, 1] un-normalized convention every
shipped config uses).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _int16_ok(*vals) -> bool:
    return all(-32768 <= int(v) <= 32767 for v in vals)


def _quantize_img(img: np.ndarray) -> np.ndarray:
    """[0, 1] float image -> uint8 wire image (lossless w.r.t. the reference,
    whose PIL pipeline holds uint8 until the final /255). Images outside
    [0, 1] (an ``image_normalizer`` is configured) stay float32."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    if img.min() >= 0.0 and img.max() <= 1.0 + 1e-6:
        return np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
    return img.astype(np.float32)


def _pad_to(arr: np.ndarray, budget: int, fill=0):
    n = arr.shape[0]
    if n >= budget:
        return arr[:budget], min(n, budget)
    pad_shape = (budget - n,) + arr.shape[1:]
    pad = np.full(pad_shape, fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0), n


def remap_mask_ids(mask: np.ndarray, budget: int) -> np.ndarray:
    """Remap raw SAM mask ids to dense [0, budget); invalid/overflow -> -100.

    The raw uint8 id-map has arbitrary ids; the mask-consistency loss needs a
    static id budget (``losses.mask_cons_loss``). Largest-area masks win the
    budget slots (area-descending, matching the reference's sort-by-area).
    """
    mask = mask.astype(np.int32)
    ids, inv, counts = np.unique(mask, return_inverse=True,
                                 return_counts=True)
    # rank only the non-negative ids by area (stable w.r.t. the old loop)
    pos = np.where(ids >= 0)[0]
    order = pos[np.argsort(-counts[pos], kind="stable")]
    newid = np.full(ids.shape[0], -100, np.int32)
    newid[order[:budget]] = np.arange(min(budget, order.shape[0]), dtype=np.int32)
    return newid[inv].reshape(mask.shape)


_POINT_KEYS = ("coords", "feats", "seg_label", "img_indices",
               "pseudo_label_2d", "pseudo_label_3d", "proj_xy", "points_xyz",
               "ema_map")
_ORI_KEYS = ("ori_coords", "ori_feats", "ori_img_indices")
_RAW_KEYS = ("ori_points", "ori_pseudo_label_3d", "g_indices")


def _strided_pick(n: int, budget: int) -> np.ndarray:
    """Evenly-spaced increasing indices (distinct since n > budget)."""
    return np.linspace(0, n - 1, budget).round().astype(np.int64)


def _fair_subsample(s: Dict, budget: int) -> Dict:
    """Downsample a sample's per-point groups to the static budget with an
    evenly-strided pick instead of take-first truncation.

    Take-first is SPATIALLY BIASED: train points arrive voxel-key-sorted
    (one lexicographic chunk of the scan) and eval points arrive in dataset
    order (synthetic/KITTI scans put ground first), so overflow used to drop
    whole regions or whole classes. A strided pick over either ordering is
    (near-)uniform over the scan. The three independent per-point groups —
    augmented set, EMA original voxel set (``ema_map`` values are remapped),
    raw original scan (VGI inputs) — each get their own pick; the eval
    restoration mask ``orig_points_idx`` is rebuilt to keep batch-row ->
    original-point order intact."""
    n = np.asarray(s["coords"]).shape[0] if "coords" in s else 0
    n_ori = np.asarray(s["ori_coords"]).shape[0] if "ori_coords" in s else 0
    n_raw = np.asarray(s["ori_points"]).shape[0] if "ori_points" in s else 0
    if n <= budget and n_ori <= budget and n_raw <= budget:
        return s
    s = dict(s)
    if n > budget:
        pick = _strided_pick(n, budget)
        for k in _POINT_KEYS:
            if k in s:
                s[k] = np.asarray(s[k])[pick]
        if "orig_points_idx" in s:
            mask = np.asarray(s["orig_points_idx"])
            kept = np.where(mask)[0][pick]
            new_mask = np.zeros_like(mask)
            new_mask[kept] = True
            s["orig_points_idx"] = new_mask
    if n_ori > budget:
        pick_o = _strided_pick(n_ori, budget)
        for k in _ORI_KEYS:
            if k in s:
                s[k] = np.asarray(s[k])[pick_o]
        if "ema_map" in s:
            inv = np.full(n_ori, -1, np.int64)
            inv[pick_o] = np.arange(budget)
            em = np.asarray(s["ema_map"])
            safe = np.clip(em, 0, n_ori - 1)
            s["ema_map"] = np.where((em >= 0) & (em < n_ori), inv[safe],
                                    -1).astype(em.dtype)
    if n_raw > budget:
        pick_r = _strided_pick(n_raw, budget)
        for k in _RAW_KEYS:
            if k in s:
                s[k] = np.asarray(s[k])[pick_r]
    return s


def _lexkey(coords):
    c = np.asarray(coords, np.int64)
    return (c[:, 0] * 4096 + c[:, 1]) * 4096 + c[:, 2]


def _sort_sample_points(s: Dict) -> Dict:
    """Reorder one sample's per-point arrays by the packed voxel key.

    Lets the device-side ``voxelize`` skip its input sort (the dominant cost
    of level-0 table builds): the host lexsort runs on the otherwise-idle
    CPU, overlapped with device compute. Pure permutation — voxel tables,
    losses and metrics are point-order-free. The EMA original set gets its
    own permutation, and ``ema_map`` values are remapped through it."""
    s = dict(s)
    perm = np.argsort(_lexkey(s["coords"]), kind="stable")
    for k in _POINT_KEYS:
        if k in s:
            s[k] = np.asarray(s[k])[perm]
    if "ori_coords" in s:
        operm = np.argsort(_lexkey(s["ori_coords"]), kind="stable")
        inv = np.empty(len(operm), np.int64)
        inv[operm] = np.arange(len(operm))
        for k in _ORI_KEYS:
            if k in s:
                s[k] = np.asarray(s[k])[operm]
        if "ema_map" in s:
            em = np.asarray(s["ema_map"])
            safe = np.clip(em, 0, max(len(inv) - 1, 0))
            s["ema_map"] = np.where((em >= 0) & (em < len(inv)),
                                    inv[safe], -1).astype(em.dtype)
    return s


def _true_level_nums(coords_s, valid_s, num_levels: int):
    """TRUE per-level unique-voxel counts of one sample, independent of the
    plan builder's capacity clamps (the builder's ``nums`` saturates at the
    capacity, and the clamp cascades into coarser levels). Points arrive
    voxel-key-sorted (``_sort_sample_points``), and ``coords >> l`` is a
    monotone map, so each level's count is just adjacent-key changes — no
    sort. Feeds the bench's self-auditing ``voxel_occupancy_max`` field
    (round-2 postmortem: silent overflow invalidated the headline number,
    BASELINE.md round 3)."""
    c = np.asarray(coords_s, np.int64)[np.asarray(valid_s, bool)]
    c = c[np.all((c >= 0) & (c < 4096), axis=1)]
    tn = np.zeros(num_levels, np.int32)
    key = (c[:, 0] << 24) | (c[:, 1] << 12) | c[:, 2]
    # level-0 keys arrive sorted; coarser levels dedup the (shrinking)
    # previous level's unique set — (x,y,z) >> 1 is NOT order-preserving
    # under the lex sort, so each coarse level re-sorts its packed keys
    for lvl in range(num_levels):
        if key.size == 0:
            break
        if lvl > 0:
            # halve each 12-bit field of the packed key, then dedup
            key = ((key >> 25 << 24) | ((key >> 13 & 0x7FF) << 12)
                   | ((key & 0xFFF) >> 1))
            key = np.unique(key)
        elif np.any(np.diff(key) < 0):  # defensive: unsorted input
            key = np.unique(key)
        else:
            key = key[np.concatenate(([True], np.diff(key) != 0))]
        tn[lvl] = key.size
    return tn


def _host_plan_batch(out: Dict, b: int, p: int, capacities, prefix: str,
                     coords_key: str, valid_key: str,
                     audit: bool = True) -> None:
    """Build per-sample UNet voxel plans on the host (native C++) and stack
    the compact-dtype arrays into the batch under ``prefix``. Silently a
    no-op when the native library is unavailable — the trainer then falls
    back to device-side plan builds. ``audit=False`` skips the
    builder-independent true-count audit (a pure diagnostic costing
    ~4 ms/sample/plan-set of the 1-core host's steady-state budget —
    DataLoader audits the first batches of each run and the bench/preprocess
    hooks audit explicitly)."""
    from mopa_tpu.data import native_loader

    coords = out[coords_key].reshape(b, p, 3)
    valid = out[valid_key].reshape(b, p)
    per = []
    for i in range(b):
        host = native_loader.build_plan_arrays(coords[i], valid[i], capacities)
        if host is None:
            return
        per.append(host)
    if audit:
        # host-only audit key (leading "_" keeps it off the device wire)
        out["_" + prefix + "true_nums"] = np.stack(
            [_true_level_nums(coords[i], valid[i], len(capacities))
             for i in range(b)])
    compact = {}
    if _int16_ok(p, int(max(capacities))):
        compact = {"inverse": np.int16, "counts": np.int16}
    for key in ("rankn", "ebits", "cbits", "downn", "downe", "f2c",
                "upoffn", "inverse", "counts", "nums", "fix"):
        stacked = np.stack([h[key] for h in per])
        out[prefix + key] = stacked.astype(compact.get(key, stacked.dtype))


def _host_vgi_batch(out: Dict, pts: np.ndarray, b: int, p: int,
                    obj_budget: int, vgi_host: Dict,
                    audit: bool = True) -> None:
    """Run VGI on the host (``data/vgi_host.py``) and ship the cat-domain
    wire: ``cat_valid/cat_label/cat_obj_mask/vgi_inserted`` + the
    ``hp_cat_*`` voxel plan, dropping the raw VGI inputs from the wire.
    Falls back silently (keys untouched) when the native plan builder is
    unavailable — the trainer then runs the device VGI engine as before."""
    from mopa_tpu.data.vgi_host import vgi_host_batch
    from mopa_tpu.models.scn_unet import capacity_schedule

    scan_label = out.get(
        "ori_pseudo_label_3d",
        np.full((b, p), -100, np.int32)).reshape(b, p).astype(np.int32)
    cat = vgi_host_batch(
        pts, out["ori_points_valid"], scan_label, out["g_mask"],
        out["obj_pc"], out["obj_valid"], out["obj_label"],
        out["proj_matrix"], out["img_size"], vgi_host["rng"],
        pc_mm=vgi_host["pc_mm"], aug=vgi_host["aug"],
        scale=vgi_host["scale"], full_scale=vgi_host["full_scale"],
        front_axis_x=vgi_host["front_axis_x"])
    k_max = out["obj_valid"].shape[1]
    n_cat = p + k_max * obj_budget
    cat_caps = capacity_schedule(n_cat, int(vgi_host["num_levels"]),
                                 factors=vgi_host.get("factors") or None)
    out["cat_valid"] = cat["valid"].reshape(b, n_cat)
    out["_cat_coords"] = cat["coords"]
    _host_plan_batch(out, b, n_cat, cat_caps, "hp_cat_",
                     "_cat_coords", "cat_valid", audit=audit)
    if "hp_cat_rankn" not in out:  # native lib missing -> device fallback
        del out["cat_valid"], out["_cat_coords"]
        return
    out["cat_label"] = cat["label"].reshape(b, n_cat).astype(np.int16)
    out["cat_obj_mask"] = cat["obj_mask"].reshape(b, n_cat)
    out["vgi_inserted"] = cat["inserted"]
    out["_hp_cat_caps"] = np.asarray(cat_caps, np.int32)
    # the device step reads only the precomputed cat arrays now
    for k in ("ori_points", "ori_points_valid", "vgi_num_points", "g_mask",
              "obj_pc", "obj_valid", "obj_label", "proj_matrix", "img_size",
              "ori_pseudo_label_3d"):
        out.pop(k, None)


def collate_padded(samples: List[Dict], point_budget: int,
                   obj_budget: int = 2048, mask_budget: int = 64,
                   sort_points: bool = False,
                   host_plan_capacities=None, vgi_host=None,
                   audit: bool = True) -> Dict:
    """Collate a list of per-sample dicts (from the dataset __getitem__) into
    one padded numpy batch. ``sort_points`` pre-sorts each sample by voxel
    key so device plan builds can skip their input sort (train mode only —
    eval keeps dataset order for the pseudo-label writer).
    ``host_plan_capacities`` additionally builds the full per-sample UNet
    voxel plans on the host (native C++, overlapped with device compute)
    and ships them with the batch (``hp_*`` / ``hp_ori_*`` keys).
    ``audit=False`` drops the per-sample capacity audit (``_hp_*true_nums``)
    from the batch — see ``_host_plan_batch``."""
    samples = [_fair_subsample(s, point_budget) for s in samples]
    if sort_points:
        samples = [_sort_sample_points(s) for s in samples]
    b = len(samples)
    out: Dict[str, np.ndarray] = {}
    p = point_budget

    def stack_points(key, fill, dtype=None, budget=p):
        arrs, counts = [], []
        for s in samples:
            a = np.asarray(s[key])
            if dtype is not None:
                a = a.astype(dtype)
            a, n = _pad_to(a, budget, fill)
            arrs.append(a)
            counts.append(n)
        return np.stack(arrs), np.asarray(counts, np.int32)

    # int16 wire dtypes hold as long as the voxel receptive field / point
    # budget / image dims stay below 32768 (full_scale is 4096 everywhere)
    idx_t = np.int16 if _int16_ok(p, 4096) else np.int32

    coords, num_points = stack_points("coords", 0, idx_t)
    out["coords"] = coords.reshape(b * p, 3)
    out["num_points"] = num_points
    batch_idx = np.repeat(np.arange(b, dtype=np.int32)[:, None], p, axis=1)
    out["batch_idx"] = batch_idx.reshape(b * p)
    pv = np.arange(p)[None, :] < num_points[:, None]
    out["point_valid"] = pv

    feats, _ = stack_points("feats", 0, np.float16)
    out["feats"] = feats.reshape(b * p, -1)

    if "seg_label" in samples[0]:
        lab, _ = stack_points("seg_label", -100, idx_t)
        out["seg_label"] = lab.reshape(b * p)

    if "img" in samples[0]:
        out["img"] = np.stack([_quantize_img(s["img"]) for s in samples])
        idx, _ = stack_points("img_indices", 0, idx_t)
        out["img_indices"] = idx

    for key in ("pseudo_label_2d", "pseudo_label_3d"):
        if key in samples[0]:
            lab, _ = stack_points(key, -100, idx_t)
            out[key] = lab.reshape(b * p)

    if "proj_in" in samples[0]:
        # SalsaNext range inputs: (B, H, W, 5) images + per-point pixels
        out["proj_in"] = np.stack(
            [np.asarray(s["proj_in"], np.float32) for s in samples])
        pxy, _ = stack_points("proj_xy", 0, np.int32)
        out["proj_xy"] = pxy

    if "points_xyz" in samples[0]:
        # metric sensor-frame points for eval-time KNN range projection
        pxyz, _ = stack_points("points_xyz", 0, np.float32)
        out["points_xyz"] = pxyz

    if "sam_mask" in samples[0]:
        # remapped ids live in [-100, mask_budget) — int8 wire when they fit
        mask_t = np.int8 if mask_budget <= 127 else idx_t
        out["sam_mask"] = np.stack(
            [remap_mask_ids(np.asarray(s["sam_mask"]), mask_budget)
             for s in samples]).astype(mask_t)

    # ----- EMA originals -----
    if "depth_label" in samples[0]:
        out["depth_label"] = np.stack(
            [np.asarray(s["depth_label"], np.float32) for s in samples])

    if "ori_img" in samples[0]:
        out["ori_img"] = np.stack([_quantize_img(s["ori_img"])
                                   for s in samples])
        oidx, _ = stack_points("ori_img_indices", 0, idx_t)
        out["ori_img_indices"] = oidx
        ocoords, onum = stack_points("ori_coords", 0, idx_t)
        out["ori_coords"] = ocoords.reshape(b * p, 3)
        out["ori_batch_idx"] = out["batch_idx"]
        out["ori_point_valid"] = np.arange(p)[None, :] < onum[:, None]
        out["ori_num_points"] = onum
        ofeats, _ = stack_points("ori_feats", 0, np.float16)
        out["ori_feats"] = ofeats.reshape(b * p, -1)
        emap, _ = stack_points("ema_map", -1, idx_t)
        out["ema_map"] = emap

    # ----- VGI inputs -----
    if "ori_points" in samples[0]:
        pts, vnum = stack_points("ori_points", 0, np.float32)
        # int16 fixed-point wire: 5 mm xyz resolution (+-163 m, well under
        # the 5 cm voxel and LiDAR noise), 2^-15 intensity; float32 fallback
        # for out-of-range data. Decoded in-graph by decode_batch.
        if (np.abs(pts[..., :3]).max(initial=0.0) < 163.0
                and np.abs(pts[..., 3:]).max(initial=0.0) <= 1.0):
            q = np.empty(pts.shape, np.int16)
            q[..., :3] = np.rint(pts[..., :3] * 200.0)
            q[..., 3:] = np.rint(pts[..., 3:] * 32000.0)
            out["ori_points"] = q
        else:
            out["ori_points"] = pts
        out["ori_points_valid"] = np.arange(p)[None, :] < vnum[:, None]
        out["vgi_num_points"] = vnum
        if "g_indices" in samples[0]:
            g, _ = stack_points("g_indices", 0, bool)
            out["g_mask"] = g
        if "ori_pseudo_label_3d" in samples[0]:
            opl, _ = stack_points("ori_pseudo_label_3d", -100, idx_t)
            out["ori_pseudo_label_3d"] = opl
        # K candidate objects per scan (K=1 for multi_objs=False); padded to
        # the max K in the batch so single- and multi-object configs share
        # one layout (B, K, O, 4)
        k_max = max(len(s["ori_obj_pc"]) for s in samples)
        objs, labels, ovalid = [], [], []
        for s in samples:
            s_objs, s_valid, s_labels = [], [], []
            for ki in range(k_max):
                if ki < len(s["ori_obj_pc"]):
                    opc = np.asarray(s["ori_obj_pc"][ki], np.float32)
                    opc, n = _pad_to(opc, obj_budget, 0)
                    lab = int(np.asarray(s["ori_obj_label"][ki]).flat[0])
                else:
                    opc, n, lab = np.zeros((obj_budget, 4), np.float32), 0, -100
                s_objs.append(opc)
                s_valid.append(np.arange(obj_budget) < n)
                s_labels.append(lab)
            objs.append(np.stack(s_objs))
            ovalid.append(np.stack(s_valid))
            labels.append(s_labels)
        out["obj_pc"] = np.stack(objs)                       # (B, K, O, 4)
        out["obj_valid"] = np.stack(ovalid)                  # (B, K, O)
        out["obj_label"] = np.asarray(labels, np.int32)      # (B, K)
        out["proj_matrix"] = np.stack(
            [np.asarray(s["proj_matrix"], np.float32)[:3, :4] for s in samples])
        out["img_size"] = np.stack(
            [np.asarray(s["ori_img_size"], np.int32) for s in samples])

        # ----- host-side VGI (insert + occlusion + aug + cat-domain plan) --
        # Runs here, overlapped with device compute, when the batch carries a
        # ground mask and the native plan builder is available; on success
        # the raw VGI inputs leave the wire and the device step consumes the
        # precomputed cat arrays + hp_cat_* plan instead of running
        # ops.mixmatch.vgi_insert_batch + an in-step plan build (~1/3 of the
        # full MoPA step, round-4 ab_step.py split).
        if vgi_host is not None and "g_mask" in out:
            _host_vgi_batch(out, pts, b, p, obj_budget, vgi_host, audit=audit)

    if host_plan_capacities is not None and sort_points:
        _host_plan_batch(out, b, p, host_plan_capacities, "hp_",
                         "coords", "point_valid", audit=audit)
        if "ori_coords" in out:
            _host_plan_batch(out, b, p, host_plan_capacities, "hp_ori_",
                             "ori_coords", "ori_point_valid", audit=audit)

    # host-side metadata (not shipped to device)
    meta = {}
    for key in ("lidar_path", "scan_pth"):
        if key in samples[0]:
            meta[key] = [s[key] for s in samples]
    for key in ("orig_seg_label", "orig_points_idx", "ori_keep_idx",
                "ori_img_points"):
        if key in samples[0]:
            meta[key] = [np.asarray(s[key]) for s in samples]
    if meta:
        out["_meta"] = meta
    return out
