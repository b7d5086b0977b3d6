"""Training metrics: confusion-matrix IoU / accuracy.

JAX re-implementation of the reference ``SegIoU``/``SegAccuracy``
(``mopa/models/metric.py:26-77``): the confusion matrix update
(``bincount(n*label+pred)``) runs on device inside the train step; the host
accumulates plain numpy matrices between logs.
"""

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(logits: jax.Array, labels: jax.Array, valid: jax.Array,
                     num_classes: int) -> jax.Array:
    """Device-side confusion update: (C, C) counts with rows = gt, cols = pred.

    Computed as a one-hot GEMM: a scatter-add of N points into C*C buckets
    serialises on colliding indices on TPU (hundreds of ms per step), while
    the (C, N) x (N, C) matmul rides the MXU.
    """
    pred = jnp.argmax(logits, axis=-1)
    ok = valid & (labels >= 0) & (labels < num_classes)
    lab = jnp.clip(labels, 0, num_classes - 1)
    onehot_gt = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32) \
        * ok[:, None].astype(jnp.float32)
    onehot_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    cm = jnp.dot(onehot_gt.T, onehot_pred, preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


class SegIoU:
    """Host-side accumulator with the reference's meter interface."""

    def __init__(self, num_classes, ignore_index=-100, name="seg_iou"):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.name = name
        self.mat = None

    def update_mat(self, mat):
        mat = np.asarray(mat)
        self.mat = mat if self.mat is None else self.mat + mat

    def reset(self):
        self.mat = None

    @property
    def iou(self):
        h = self.mat.astype(np.float64)
        denom = h.sum(1) + h.sum(0) - np.diag(h)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(h) / denom

    @property
    def global_avg(self):
        return float(np.nanmean(self.iou)) if self.mat is not None else float("nan")

    @property
    def avg(self):
        return self.global_avg

    def __str__(self):
        return "{iou:.4f}".format(iou=self.global_avg)

    @property
    def summary_str(self):
        return str(self)
