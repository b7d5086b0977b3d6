"""Pseudo-label refinement (host numpy + device JAX variants).

Reference behaviours (``mopa/data/utils/refine_pseudo_labels.py``):

* :func:`refine_pseudo_labels` — per class, ignore the less-confident half
  (threshold = min(median, 0.9)) (:5-22).
* :func:`refine_sam_2Dlabels` — densify sparse 2D pseudo-labels over SAM
  masks by probability-sum vote, skipping masks covering >10% of the image
  (:25-69).
* :func:`refine_sam_mask` — invalidate oversized masks and crop masks above
  the LiDAR FOV (:72-102).

The device variant :func:`refine_pseudo_labels_jax` is the vectorised
equivalent used inside the jitted EMA teacher step: per-class quantile with a
static class count, no host round-trip (replaces the reference's
CPU-numpy round trip at ``train_xmuda_mopa.py:294-312``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def refine_pseudo_labels(probs, pseudo_label, ignore_label=-100):
    """Per class: drop (set ignore) labels below min(class median prob, 0.9)."""
    probs = np.asarray(probs)
    pseudo_label = np.asarray(pseudo_label).copy()
    for cls_idx in np.unique(pseudo_label):
        curr_idx = np.nonzero(pseudo_label == cls_idx)[0]
        thresh = min(float(np.median(probs[curr_idx])), 0.9)
        ignore = curr_idx[probs[curr_idx] < thresh]
        pseudo_label[ignore] = ignore_label
    return pseudo_label


def refine_pseudo_labels_jax(probs: jax.Array, pseudo_label: jax.Array,
                             valid: jax.Array, num_classes: int,
                             ignore_label: int = -100) -> jax.Array:
    """Vectorised device-side equivalent over a static class count.

    ``valid`` masks padding points (they keep ``ignore_label``). The median is
    computed per class over valid points only; empty classes pass through
    unchanged (matching the reference, which only iterates present classes).
    """
    probs = probs.astype(jnp.float32)
    labels = pseudo_label.astype(jnp.int32)

    # ALL per-class medians from ONE label-major/prob-minor sort (instead of
    # a full sort per class): class c's confidences occupy the sorted run
    # [starts[c], starts[c] + counts[c]), so each median is rank arithmetic
    # plus a 2-element gather
    n_pts = probs.shape[0]
    sel = valid & (labels >= 0) & (labels < num_classes)
    key = jnp.where(sel, labels, num_classes)
    _, vals = jax.lax.sort((key, probs), num_keys=2)
    cls = jnp.arange(num_classes, dtype=jnp.int32)
    counts = jnp.sum(key[:, None] == cls[None, :], axis=0)
    starts = jnp.cumsum(counts) - counts
    n = jnp.maximum(counts, 1)
    lo = jnp.clip(starts + (n - 1) // 2, 0, n_pts - 1)
    hi = jnp.clip(starts + n // 2, 0, n_pts - 1)
    med = 0.5 * (vals[lo] + vals[hi])
    threshs = jnp.minimum(med, 0.9)
    present = counts > 0
    safe = jnp.clip(labels, 0, num_classes - 1)
    th = jnp.where(present[safe], threshs[safe], -jnp.inf)
    keep = probs >= th
    out = jnp.where(keep & valid, labels, ignore_label)
    return out


def refine_sam_2Dlabels(probs, img_indices, sam_mask, max_area_thre=0.1):
    """Densify 2D pseudo-labels across SAM masks (mask-area probability vote)."""
    probs = np.asarray(probs, np.float32).copy()
    img_indices = np.asarray(img_indices).astype(np.int64)
    sam_mask = np.asarray(sam_mask)
    h, w = sam_mask.shape
    full_probs = np.zeros((h, w, probs.shape[1]), np.float32)
    full_labels = np.full((h, w), -100, np.int32)

    refined = refine_pseudo_labels(probs.max(1), probs.argmax(1).astype(np.int32))
    probs[refined <= -100, :] = 0.0
    full_labels[img_indices[:, 0], img_indices[:, 1]] = refined
    full_probs[img_indices[:, 0], img_indices[:, 1], :] = probs

    area_cap = max_area_thre * h * w
    for mask_id in np.unique(sam_mask):
        m = sam_mask == mask_id
        if m.sum() >= area_cap:
            continue
        votes = full_probs[m].reshape(-1, probs.shape[1]).sum(0)
        full_labels[m] = int(votes.argmax())
    return full_labels


def refine_sam_mask(sam_mask, max_area_thre=0.1, max_h=None):
    """Invalidate oversized masks; crop masks above the LiDAR FOV row."""
    sam_mask = np.asarray(sam_mask).astype(np.int32).copy()
    h, w = sam_mask.shape
    area_cap = max_area_thre * h * w
    ids, counts = np.unique(sam_mask, return_counts=True)
    for mask_id, cnt in zip(ids, counts):
        if cnt >= area_cap:
            sam_mask[sam_mask == mask_id] = -100
    if max_h is not None:
        sam_mask[: h - max_h, :] = -100
    return sam_mask
