#!/usr/bin/env python
"""Generate the executed logit-parity golden fixture.

Reference checkpoints cannot be fetched in this environment (no egress), so
checkpoint parity is pinned against the in-repo REPLICAS of the reference
architectures instead (the same ones the import machinery is output-parity
tested against in ``tests/test_torch_compat.py``):

  * a torch UNetResNet34 Net2DSeg replica of
    ``/root/reference/mopa/models/resnet34_unet.py:83-191`` +
    ``mopa/models/xmuda_arch.py:22-80``, evaluated with torch;
  * a reference-layout scn state_dict (``mopa/models/scn_unet.py:9-36``) at
    the PRODUCTION depth (m=16, 7 planes), evaluated with an independent
    numpy walk of the scn graph.

The golden ``.npz`` records one synthetic scan (coords/feats/img/indices/
labels) plus the replica logits (``ref_logit_2d/3d``) and a fingerprint of
the replica state dicts. ``tests/test_parity_golden.py`` regenerates the
state dicts from the same torch seed, imports them through the REAL
checkpoint-import path (``tools/parity_check.py::run_parity``), and asserts
per-point logit deltas — an executed parity number in CI, no assets needed.

Run:  JAX_PLATFORMS=cpu python tools/make_parity_golden.py
Writes tests/goldens/parity_scan.npz (~1 MB).
"""

import hashlib
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

# production 3D depth (MODEL_3D.SCN defaults); modest 2D/scan sizes keep the
# CI test under the fast-tier budget
M, NUM_PLANES, NCLS = 16, 7, 10
IMG_H, IMG_W = 96, 160
N_POINTS = 1800
SCALE = 256
TORCH_SEED = 1234


def make_scan(rng):
    """LiDAR-flavoured synthetic scan: a ground slab + a few box clusters so
    the voxel dedup curve roughly resembles a real scan (random-uniform
    coords barely dedup and would distort the capacity picture)."""
    parts = []
    n_ground = N_POINTS // 2
    gx = rng.uniform(0, SCALE, n_ground)
    gy = rng.uniform(0, SCALE, n_ground)
    gz = rng.uniform(4, 8, n_ground)
    parts.append(np.stack([gx, gy, gz], 1))
    n_rest = N_POINTS - n_ground
    n_box = 6
    per = n_rest // n_box
    for i in range(n_box):
        c = rng.uniform(20, SCALE - 20, 3)
        c[2] = rng.uniform(8, 40)
        parts.append(c + rng.normal(0, 4.0, (per, 3)))
    pts = np.concatenate(parts)[:N_POINTS]
    coords = np.clip(pts, 0, SCALE - 1).astype(np.int32)
    coords = np.unique(coords, axis=0)  # voxelized scans are unique-coord
    n = coords.shape[0]
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    img = rng.normal(size=(IMG_H, IMG_W, 3)).astype(np.float32)
    idx = np.stack([rng.integers(0, IMG_H, n), rng.integers(0, IMG_W, n)],
                   -1).astype(np.int32)
    labels = rng.integers(0, NCLS, n).astype(np.int64)
    return coords, feats, img, idx, labels


def state_dict_fingerprint(sd):
    h = hashlib.sha256()
    for k in sorted(sd):
        h.update(k.encode())
        h.update(np.ascontiguousarray(sd[k]).tobytes())
    return h.hexdigest()


def build_replicas():
    """Seeded reference-format state dicts + the torch modules (shared with
    tests/test_parity_golden.py so the test regenerates the exact dicts)."""
    import torch

    import test_torch_compat as ttc

    torch.manual_seed(TORCH_SEED)
    t2d = ttc.TNet2DSeg(num_classes=NCLS)
    for m in t2d.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.1)
            m.running_var.data.uniform_(0.5, 1.5)
    t2d.eval()
    planes = [(i + 1) * M for i in range(NUM_PLANES)]
    t3d = ttc.TNet3DSeg(M, planes, NCLS)
    # fan-in scaling: the test replica's raw randn*0.2 conv weights explode
    # exponentially over the production graph's 14-conv depth on a dense
    # scan (O(1e8) logits); rescale so activations stay O(1) — any values
    # work for import parity, sane ones make the deltas interpretable
    with torch.no_grad():
        for mod in t3d.modules():
            if isinstance(mod, ttc.SCNConv):
                kv, cin, _ = mod.weight.shape
                mod.weight *= 1.0 / (0.2 * np.sqrt(kv * cin))
    sd2d = {k: v.numpy() for k, v in t2d.state_dict().items()}
    sd3d = {k: v.numpy() for k, v in t3d.state_dict().items()}
    return t2d, sd2d, sd3d, planes


def main():
    import torch

    import test_torch_compat as ttc
    from mopa_tpu.ops.sparse_conv import kernel_offsets

    rng = np.random.default_rng(99)
    coords, feats, img, idx, labels = make_scan(rng)
    n = coords.shape[0]
    print("scan: {} unique voxels".format(n))

    t2d, sd2d, sd3d, planes = build_replicas()

    # --- 2D reference logits (torch replica, eval mode)
    with torch.no_grad():
        timg = torch.from_numpy(np.transpose(img[None], (0, 3, 1, 2)))
        feat2d = t2d.net_2d(timg).permute(0, 2, 3, 1).numpy()[0]
        lifted = feat2d[idx[:, 0], idx[:, 1]]
        ref_logit_2d = (lifted @ sd2d["linear.weight"].T
                        + sd2d["linear.bias"]).astype(np.float32)

    # --- 3D reference logits (independent numpy walk of the scn graph)
    offs27 = [tuple(o) for o in kernel_offsets(3)]
    offs8 = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    sites = [tuple(c) for c in coords]
    x = {tuple(c): f for c, f in zip(coords, feats)}
    x = ttc._np_subconv(x, sd3d["net_3d.sparseModel.1.weight"], sites, offs27)
    x = ttc._np_unet(x, sites, planes, sd3d, "net_3d.sparseModel.2",
                     offs27, offs8)
    x = ttc._np_bn(x, sd3d, "net_3d.sparseModel.3")
    feat_ref = np.stack([x[tuple(c)] for c in coords])
    ref_logit_3d = (feat_ref @ sd3d["linear.weight"].T
                    + sd3d["linear.bias"]).astype(np.float32)

    out = os.path.join(_ROOT, "tests", "goldens", "parity_scan.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, coords=coords, feats=feats, img=img, img_indices=idx,
        seg_label=labels, ref_logit_2d=ref_logit_2d, ref_logit_3d=ref_logit_3d,
        sd2d_sha256=np.bytes_(state_dict_fingerprint(sd2d).encode()),
        sd3d_sha256=np.bytes_(state_dict_fingerprint(sd3d).encode()),
        torch_seed=np.int64(TORCH_SEED), torch_version=np.bytes_(
            torch.__version__.encode()))
    print("wrote", out, os.path.getsize(out), "bytes")
    print("logit ranges: 2d |max|={:.2f}  3d |max|={:.2f}".format(
        np.abs(ref_logit_2d).max(), np.abs(ref_logit_3d).max()))


if __name__ == "__main__":
    main()
