"""Model factory from config (reference ``mopa/models/build.py:5-22``)."""

import jax.numpy as jnp

from mopa_tpu.models.metric import SegIoU
from mopa_tpu.models.xmuda_arch import Net2DSeg, Net3DSeg


def _compute_dtype(cfg):
    name = cfg.get("TPU", {}).get("COMPUTE_DTYPE", "float32")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def build_model_2d(cfg, output_all=None):
    if output_all is None:
        output_all = cfg.TRAIN.PC_MM.lambda_sam_cons > 0 if "PC_MM" in cfg.TRAIN else False
    model = Net2DSeg(
        num_classes=cfg.MODEL_2D.NUM_CLASSES,
        dual_head=cfg.MODEL_2D.DUAL_HEAD,
        backbone_2d=cfg.MODEL_2D.TYPE,
        output_all=output_all,
        compute_dtype=_compute_dtype(cfg),
        pretrained=cfg.MODEL_2D.get(cfg.MODEL_2D.TYPE, {}).get("pretrained", True),
        depth_pred=bool(cfg.TRAIN.get("DEPTH_PRED", False)),
    )
    train_metric = SegIoU(cfg.MODEL_2D.NUM_CLASSES, name="seg_iou_2d")
    return model, train_metric


def build_model_3d(cfg):
    scn_kwargs = dict(cfg.MODEL_3D.get(cfg.MODEL_3D.TYPE, {}))
    scn_kwargs.pop("pretrained", None)
    model = Net3DSeg(
        num_classes=cfg.MODEL_3D.NUM_CLASSES,
        dual_head=cfg.MODEL_3D.DUAL_HEAD,
        backbone_3d=cfg.MODEL_3D.TYPE,
        compute_dtype=_compute_dtype(cfg),
        **scn_kwargs,
    )
    train_metric = SegIoU(cfg.MODEL_3D.NUM_CLASSES, name="seg_iou_3d")
    return model, train_metric
