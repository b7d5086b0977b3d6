"""Offline pseudo-label regeneration (reference
``mopa/data/utils/pslabel_update.py:27-189``): a specialisation of the
validation loop that re-writes per-scan pseudo-label ``.npy`` files from a
trained model pair mid-training, with optional entropy-weighted 2D/3D fusion
(``entropy_fuse`` — the parameterised, working version of the branch that
crashes in the reference's validate)."""

from mopa_tpu.common.metric_logger import MetricLogger
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.data.utils.validate import validate


def pslabel_update(cfg, state, models, logger, pselab_dir,
                   entropy_fuse=False):
    """Regenerate pseudo-labels over the target TRAIN split with eval
    semantics (no augmentation, original-point bookkeeping)."""
    eval_cfg = cfg.clone()
    eval_cfg.DATASET_TARGET.TEST = tuple(cfg.DATASET_TARGET.TRAIN)
    eval_cfg.VAL.BATCH_SIZE = 1  # ps-label writing is per-scan
    loader = build_dataloader(eval_cfg, mode="test", domain="target")
    metric_logger = MetricLogger(delimiter="  ")
    return validate(eval_cfg, state, models, loader, metric_logger, logger,
                    pselab_dir=pselab_dir, entropy_fuse=entropy_fuse)
