"""Dense depth labels for the DEPTH_PRED auxiliary task.

The reference gates a depth-prediction loss on ``TRAIN.DEPTH_PRED``
(``mopa/train/train_xmuda_mopa.py:405-410``) reading
``data_batch_src['depth_label']``, but no reference dataset ever produces
that key (the feature is vestigial/broken upstream — it is off in every
shipped config). This rebuild defines the label as the natural construction:
the euclidean range of each LiDAR point rasterised at its image pixel,
zero where no point projects (duplicate pixels keep the nearer point).
"""

from __future__ import annotations

import numpy as np


def dense_depth_label(image_hw, img_indices, points) -> np.ndarray:
    """(H, W, 1) float32 range image from per-point pixel indices.

    Args:
        image_hw: (H, W).
        img_indices: (N, 2) int (row, col), already clipped to the image.
        points: (N, 3+) sensor-frame point coordinates.
    """
    h, w = int(image_hw[0]), int(image_hw[1])
    depth = np.zeros((h, w, 1), np.float32)
    if len(points) == 0:
        return depth
    rng = np.linalg.norm(np.asarray(points[:, :3], np.float32), axis=1)
    rows = np.asarray(img_indices[:, 0], np.int64)
    cols = np.asarray(img_indices[:, 1], np.int64)
    # nearest point wins duplicate pixels: write in decreasing-range order
    order = np.argsort(-rng, kind="stable")
    depth[rows[order], cols[order], 0] = rng[order]
    return depth
