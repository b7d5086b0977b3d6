"""Validation / pseudo-label generation loop.

Re-design of the reference ``validate()`` (``mopa/data/utils/validate.py:26-229``):
one jitted eval step produces 2D/3D per-point probabilities; the host slices
per-sample predictions back to the original (pre-voxelization) points,
updates confusion-matrix evaluators for 2D / 3D / softmax-ensemble (xM), and
optionally writes reference-format pseudo-label ``.npy`` files
(probs_2d / pseudo_label_2d / probs_3d / pseudo_label_3d
[+ ori_keep_idx / ori_img_points for KITTI], validate.py:159-176).

The reference's entropy-fusion branch crashes on an undefined name
(validate.py:125) and double-softmaxes its entropy input (:121-122); here it
is a working parameter (``entropy_fuse``) implementing the intended behavior.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.data.utils.evaluate import Evaluator
from mopa_tpu.models import losses as L
from mopa_tpu.train import trainer as trainer_mod


def make_eval_step(cfg, models, mesh=None):
    is_range = "SalsaNext" in cfg.MODEL_3D.TYPE

    def eval_step(state, batch):
        from mopa_tpu.train.common import decode_batch

        batch = decode_batch(batch)
        valid = batch["point_valid"].reshape(-1)
        out2d, _ = trainer_mod._forward_2d(
            models.model_2d, state.params_2d, state.batch_stats_2d, batch,
            None, train=False)
        if is_range:
            # SalsaNext: dense range logits gathered back per point
            # (reference range_to_point, mopa/data/collate.py:44-123)
            out3d, _ = trainer_mod._forward_3d(
                models.model_3d, state.params_3d, state.batch_stats_3d,
                batch["feats"], None, train=False,
                proj_in=batch["proj_in"], proj_xy=batch["proj_xy"])
        else:
            plan = trainer_mod.build_plan_from_batch(
                cfg, batch["coords"], batch["batch_idx"], valid,
                sample_size=batch["point_valid"].shape[1])
            out3d, _ = trainer_mod._forward_3d(
                models.model_3d, state.params_3d, state.batch_stats_3d,
                batch["feats"], plan, train=False)
        probs_2d = jax.nn.softmax(out2d["seg_logit"], axis=-1)
        probs_3d = jax.nn.softmax(out3d["seg_logit"], axis=-1)
        seg_loss_2d = L.cross_entropy(out2d["seg_logit"], batch["seg_label"],
                                      valid & (batch["seg_label"] >= 0))
        seg_loss_3d = L.cross_entropy(out3d["seg_logit"], batch["seg_label"],
                                      valid & (batch["seg_label"] >= 0))
        return probs_2d, probs_3d, seg_loss_2d, seg_loss_3d

    return jax.jit(eval_step)


def validate(cfg, state, models, dataloader, val_metric_logger, logger,
             pselab_dir=None, entropy_fuse=False):
    logger.info("Validation")
    class_names = dataloader.dataset.class_names
    evaluator_2d = Evaluator(class_names)
    evaluator_3d = Evaluator(class_names)
    evaluator_ensemble = Evaluator(class_names)
    evaluator_ety = Evaluator(class_names) if entropy_fuse else None

    for name in ("seg_iou_2d", "seg_iou_3d", "seg_iou_xM"):
        val_metric_logger.remove(name)

    eval_step = make_eval_step(cfg, models)

    # range-image KNN post-processing of 3D predictions (VAL.use_knn,
    # reference validate.py:46-50,98-109)
    use_knn = bool(cfg.VAL.use_knn)
    knn_prob = bool(cfg.VAL.knn_prob)
    if use_knn:
        from mopa_tpu.ops import knn as knn_ops

        pc = cfg.TRAIN.PC_MM
        knn_step = jax.jit(jax.vmap(functools.partial(
            knn_ops.knn_postprocess_scan,
            nclasses=cfg.MODEL_3D.NUM_CLASSES, fov_up=pc.fov_up,
            fov_down=pc.fov_down, proj_w=pc.proj_W, proj_h=pc.proj_H,
            k=cfg.TRAIN.XMUDA.knn_k, output_prob=knn_prob)))

    end = time.time()
    for iteration, batch in enumerate(dataloader):
        data_time = time.time() - end
        meta = batch.pop("_meta", {})
        from mopa_tpu.train.common import device_batch

        dev_batch = device_batch(batch)
        probs_2d, probs_3d, loss2d, loss3d = eval_step(state, dev_batch)
        probs_2d = np.asarray(probs_2d)
        probs_3d = np.asarray(probs_3d)

        b, p = batch["img_indices"].shape[:2]
        probs_2d = probs_2d.reshape(b, p, -1)
        probs_3d = probs_3d.reshape(b, p, -1)
        pred_2d = probs_2d.argmax(-1)
        pred_3d = probs_3d.argmax(-1)
        if use_knn and "points_xyz" in dev_batch:
            # the wire elides derivable masks; the raw host batch keeps them
            pv = jnp.asarray(batch["point_valid"])
            if knn_prob:
                summed = np.asarray(knn_step(dev_batch["points_xyz"], pv,
                                             jnp.asarray(probs_3d)))
                probs_3d = summed / np.maximum(
                    summed.sum(-1, keepdims=True), 1e-12)
                pred_3d = probs_3d.argmax(-1)
            else:
                pred_3d = np.asarray(knn_step(
                    dev_batch["points_xyz"], pv,
                    jnp.asarray(pred_3d.astype(np.int32))))
        pred_xm = (probs_2d + probs_3d).argmax(-1)
        if entropy_fuse:
            e2 = np.exp(-np.asarray(
                L.prob_2_entropy(jnp.asarray(probs_2d))).sum(-1))
            e3 = np.exp(-np.asarray(
                L.prob_2_entropy(jnp.asarray(probs_3d))).sum(-1))
            w2 = e2 / (e2 + e3)
            pred_ety = (w2[..., None] * probs_2d
                        + (1 - w2[..., None]) * probs_3d).argmax(-1)

        num_points = batch["num_points"]
        seg_labels = meta.get("orig_seg_label")
        points_idx = meta.get("orig_points_idx")
        for bi in range(b):
            n = int(num_points[bi])
            curr_pred_2d = pred_2d[bi, :n]
            curr_pred_3d = pred_3d[bi, :n]
            curr_pred_xm = pred_xm[bi, :n]
            if seg_labels is not None:
                idxs = points_idx[bi]
                # every original point must be voxelized (reference assert)
                curr_label = seg_labels[bi][idxs][:n]
                evaluator_2d.update(curr_pred_2d, curr_label.copy())
                evaluator_3d.update(curr_pred_3d, curr_label.copy())
                evaluator_ensemble.update(curr_pred_xm, curr_label.copy())
                if entropy_fuse:
                    evaluator_ety.update(pred_ety[bi, :n], curr_label.copy())

            if pselab_dir is not None:
                from mopa_tpu.data.pspath_sort import pspath_sort

                lidar_path = meta["lidar_path"][bi]
                ps_path = pspath_sort(cfg, lidar_path, pselab_dir)
                os.makedirs(osp.dirname(ps_path), exist_ok=True)
                data = {
                    "probs_2d": probs_2d[bi, np.arange(n), curr_pred_2d],
                    "pseudo_label_2d": curr_pred_2d.astype(np.uint8),
                    "probs_3d": probs_3d[bi, np.arange(n), curr_pred_3d],
                    "pseudo_label_3d": curr_pred_3d.astype(np.uint8),
                }
                if "KITTI" in cfg.DATASET_TARGET.TYPE.upper():
                    data["ori_keep_idx"] = meta["ori_keep_idx"][bi]
                    data["ori_img_points"] = meta["ori_img_points"][bi]
                np.save(ps_path, data, allow_pickle=True)

        val_metric_logger.update(seg_loss_2d=loss2d, seg_loss_3d=loss3d,
                                 time=time.time() - end, data=data_time)
        end = time.time()

        cur_iter = iteration + 1
        if cur_iter == 1 or (cfg.VAL.LOG_PERIOD > 0
                             and cur_iter % cfg.VAL.LOG_PERIOD == 0):
            logger.info("iter: {}/{}  {}".format(
                cur_iter, len(dataloader), str(val_metric_logger)))

    val_metric_logger.update(seg_iou_2d=evaluator_2d.overall_iou,
                             seg_iou_3d=evaluator_3d.overall_iou,
                             seg_iou_xM=evaluator_ensemble.overall_iou)
    eval_list = [("2D", evaluator_2d), ("3D", evaluator_3d),
                 ("2D+3D", evaluator_ensemble)]
    if entropy_fuse:
        eval_list.append(("xM_ety", evaluator_ety))
    eval_dict = {}
    for modality, evaluator in eval_list:
        logger.info("{} overall accuracy={:.2f}%".format(
            modality, 100.0 * evaluator.overall_acc))
        logger.info("{} overall IOU={:.2f}".format(
            modality, 100.0 * evaluator.overall_iou))
        logger.info("{} class-wise segmentation accuracy and IoU.\n{}".format(
            modality, evaluator.print_table()))
        eval_dict[modality] = evaluator
    return eval_dict
