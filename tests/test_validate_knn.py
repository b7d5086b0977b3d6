"""Eval-time range-image KNN post-processing (VAL.use_knn/knn_prob wiring,
reference ``mopa/data/utils/validate.py:46-50,98-109``)."""

import pytest

import logging

import jax.numpy as jnp
import numpy as np

from mopa_tpu.common.metric_logger import MetricLogger
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.data.utils.validate import validate
from mopa_tpu.ops import knn
from mopa_tpu.train import trainer

from test_trainer import tiny_cfg


def test_knn_scan_flips_outlier_label():
    """A lone mislabelled point surrounded by agreeing neighbours is re-voted
    to the neighbourhood label by the full scan-level pipeline (projection +
    range image + KNN)."""
    rng = np.random.default_rng(0)
    n = 64
    # points on a tight arc at ~10 m, small angular spread -> shared 5x5
    # neighbourhoods in a coarse range image
    theta = rng.uniform(-0.05, 0.05, n)
    phi = rng.uniform(-0.02, 0.02, n)
    pts = np.stack([10 * np.cos(phi) * np.cos(theta),
                    10 * np.cos(phi) * np.sin(theta),
                    10 * np.sin(phi)], 1).astype(np.float32)
    labels = np.full(n, 2, np.int32)
    labels[0] = 7  # outlier
    valid = np.ones(n, bool)
    out = np.asarray(knn.knn_postprocess_scan(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(labels),
        nclasses=8, fov_up=0.05235, fov_down=-0.43633, proj_w=64, proj_h=16))
    assert out[0] == 2
    assert np.all(out == 2)

    # probability variant: summed neighbour probabilities favour class 2
    probs = np.full((n, 8), 0.01, np.float32)
    probs[np.arange(n), labels] = 0.9
    outp = np.asarray(knn.knn_postprocess_scan(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(probs),
        nclasses=8, fov_up=0.05235, fov_down=-0.43633, proj_w=64, proj_h=16,
        output_prob=True))
    assert outp.shape == (n, 8)
    assert outp.argmax(-1)[0] == 2


def _run_validate(c):
    models, _ = trainer.build_models(c, output_all=False)
    val_loader = build_dataloader(c, "val", "target")
    batch = next(iter(val_loader))
    dev = {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")}
    state = trainer.create_train_state(c, models, dev)
    logger = logging.getLogger("test_validate_knn")
    return validate(c, state, models, val_loader, MetricLogger(), logger)


@pytest.mark.slow
def test_validate_use_knn_changes_3d_predictions():
    c = tiny_cfg()
    c.VAL.BATCH_SIZE = 2
    c.DATASET_TARGET.SyntheticSCN.length = 4

    base = _run_validate(c)

    c2 = c.clone()
    c2.VAL.use_knn = True
    with_knn = _run_validate(c2)

    cm_base = base["3D"].confusion_matrix
    cm_knn = with_knn["3D"].confusion_matrix
    # 2D path untouched; 3D predictions re-voted by range-image KNN
    assert np.array_equal(base["2D"].confusion_matrix,
                          with_knn["2D"].confusion_matrix)
    assert not np.array_equal(cm_base, cm_knn)
    assert cm_knn.sum() == cm_base.sum()  # same evaluated points

    c3 = c.clone()
    c3.VAL.use_knn = True
    c3.VAL.knn_prob = True
    with_prob = _run_validate(c3)
    cm_prob = with_prob["3D"].confusion_matrix
    assert cm_prob.sum() == cm_base.sum()
    assert not np.array_equal(cm_prob, cm_base)
