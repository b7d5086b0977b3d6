"""Shared training driver for baseline / xMUDA / MoPA entry points.

Re-design of the reference training scripts
(``mopa/train/train_xmuda_mopa.py:104-684``, ``train_xmuda.py``,
``train_baseline.py``): builds models/optimizers/checkpointers, the padded
data pipeline, the jitted train step(s), and runs the iteration loop with
periodic logging / checkpointing / validation. MoPA's EMA phase switches to a
second compiled step at ``ema_start_iter``.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import socket
import time

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.common.checkpoint import CheckpointerV2
from mopa_tpu.common.logger import get_logger
from mopa_tpu.common.metric_logger import MetricLogger, iou_to_excel
from mopa_tpu.common.rng import set_random_seed
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.data.utils.validate import validate
from mopa_tpu.parallel.mesh import make_data_mesh
from mopa_tpu.train import trainer as trainer_mod


def parse_args(description, default_cfg_path, with_test_args=False):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg", dest="config_file", default=default_cfg_path,
                        metavar="FILE", help="path to config file", type=str)
    parser.add_argument("opts", help="Modify config options from the command line",
                        default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--task", default="MoPA", type=str)
    parser.add_argument("--resume_dir", default=None, type=str)
    if with_test_args:
        parser.add_argument("--model_prefix", default="", type=str)
        parser.add_argument("--ckpt2d", default="", type=str)
        parser.add_argument("--ckpt3d", default="", type=str)
        parser.add_argument("--pselab_dir", default=None, type=str)
    return parser.parse_args()


def load_cfg(args):
    from mopa_tpu.common.config import purge_cfg
    from mopa_tpu.config.xmuda import cfg

    c = cfg.clone()
    c.merge_from_file(args.config_file)
    c.merge_from_list(args.opts or [])
    purge_cfg(c)
    c.freeze()
    return c


def prepare_output_dir(cfg, args):
    if args.resume_dir is not None:
        models_output_dir = args.resume_dir
    else:
        models_output_dir = osp.join(cfg.OUTPUT_DIR, "models")
        month_day = time.strftime("%m%d")
        spec = osp.splitext(args.config_file)[0].replace("/", "_")
        spec = month_day + spec + "_tpu"
        models_output_dir = osp.join(models_output_dir, spec)
        flag = 1
        while osp.isdir(models_output_dir):
            models_output_dir = models_output_dir + "-" + str(flag)
            flag += 1
        os.makedirs(models_output_dir, exist_ok=True)
    logs_dir = osp.join(models_output_dir, "logs")
    os.makedirs(logs_dir, exist_ok=True)
    run_name = "{:s}-{:s}".format(socket.gethostname(), time.strftime("%m%d"))
    log_file = osp.join(logs_dir, "{}_train_{}.log".format(args.task, run_name))
    return models_output_dir, run_name, log_file


# keys the non-EMA train phases never read (the EMA teacher's unaugmented
# inputs + its host-built voxel plans) — stripped from transfers before
# ema_start_iter. ``ori_points`` / ``ori_pseudo_label_3d`` stay: VGI uses
# them in every MoPA phase (ops/mixmatch.py::vgi_insert_batch).
EMA_ONLY_KEYS = ("ori_img", "ori_img_indices", "ori_coords", "ori_batch_idx",
                 "ori_point_valid", "ori_feats", "ema_map", "ori_num_points",
                 "ori_feats_ones")
EMA_ONLY_PREFIX = "hp_ori_"

# derivable on device from (B, P) — never worth shipping
_DERIVED_KEYS = ("batch_idx", "ori_batch_idx")


def device_batch(batch, strip_ema: bool = False, strip_keys=()):
    """Ship a collated numpy batch to device in its compact wire dtypes.
    ``strip_ema`` drops the EMA-teacher-only keys (pre-``ema_start_iter``
    phases never read them — ~45% of target-batch bytes); ``strip_keys``
    drops additional dead-weight keys (the train loop strips the TARGET
    stream's ground-truth ``seg_label`` — UDA never reads it). Derivable
    arrays stay off the wire: validity masks rebuild from their per-sample
    counts, and all-ones SCN feature columns collapse to a (B, C) ones
    marker — ``decode_batch`` reconstructs everything in-graph."""
    def keep(k):
        # "_"-prefixed keys are host-only (metadata, audit fields)
        if k.startswith("_") or k in _DERIVED_KEYS or k in strip_keys:
            return False
        if strip_ema and (k in EMA_ONLY_KEYS or k.startswith(EMA_ONLY_PREFIX)):
            return False
        # voxel coords feed only the device-side plan-build fallback; when
        # the loader shipped host-built plans they are dead weight on the
        # wire (0.8 MB/sample-set)
        if k == "coords" and "hp_rankn" in batch:
            return False
        if k == "ori_coords" and "hp_ori_rankn" in batch:
            return False
        # masks derivable from counts (decode_batch rebuilds)
        if k == "point_valid" and "num_points" in batch \
                and "img_indices" in batch:
            return False
        if k == "ori_point_valid" and "ori_num_points" in batch \
                and "ori_img_indices" in batch:
            return False
        if k == "ori_points_valid" and "vgi_num_points" in batch \
                and "ori_points" in batch:
            return False
        return True

    out = {k: v for k, v in batch.items() if keep(k)}
    if "num_points" in out:
        b = np.asarray(out["num_points"]).shape[0]
        for fk, mk in (("feats", "feats_ones"), ("ori_feats",
                                                 "ori_feats_ones")):
            f = out.get(fk)
            if f is not None and getattr(f, "ndim", 0) == 2 \
                    and f.shape[1] <= 8 and np.all(np.asarray(f) == 1):
                del out[fk]
                out[mk] = np.ones((b, f.shape[1]), np.float16)
    return {k: jnp.asarray(v) for k, v in out.items()}


_WIRE_INT_KEYS = ("coords", "img_indices", "seg_label", "pseudo_label_2d",
                  "pseudo_label_3d", "sam_mask", "ema_map", "ori_coords",
                  "ori_img_indices", "ori_pseudo_label_3d", "hp_counts",
                  "hp_inverse", "hp_ori_counts", "hp_ori_inverse", "proj_xy",
                  "cat_label", "hp_cat_counts", "hp_cat_inverse")
_WIRE_FLOAT_KEYS = ("feats", "ori_feats")


def decode_batch(batch):
    """Widen a wire-format batch back to compute dtypes (jittable; runs as
    the first op of the jitted step so only compact bytes cross the link).
    Tolerant: already-wide batches pass through unchanged, and the derived
    ``batch_idx`` keys are rebuilt from the (B, P) layout when absent."""
    out = dict(batch)
    for k in ("img", "ori_img"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) / 255.0
    for k in _WIRE_INT_KEYS:
        if k in out and out[k].dtype != jnp.int32:
            out[k] = out[k].astype(jnp.int32)
    for k in _WIRE_FLOAT_KEYS:
        if k in out and out[k].dtype != jnp.float32:
            out[k] = out[k].astype(jnp.float32)
    if "ori_points" in out and out["ori_points"].dtype == jnp.int16:
        q = out["ori_points"].astype(jnp.float32)
        out["ori_points"] = jnp.concatenate(
            [q[..., :3] * 0.005, q[..., 3:] * (1.0 / 32000.0)], axis=-1)
    # rebuild count-derived masks and all-ones feature columns
    if "point_valid" not in out and "num_points" in out \
            and "img_indices" in out:
        p = out["img_indices"].shape[1]
        out["point_valid"] = (jnp.arange(p, dtype=jnp.int32)[None, :]
                              < out["num_points"][:, None])
    if "ori_point_valid" not in out and "ori_num_points" in out \
            and "ori_img_indices" in out:
        p = out["ori_img_indices"].shape[1]
        out["ori_point_valid"] = (jnp.arange(p, dtype=jnp.int32)[None, :]
                                  < out["ori_num_points"][:, None])
    if "ori_points_valid" not in out and "vgi_num_points" in out \
            and "ori_points" in out:
        p = out["ori_points"].shape[1]
        out["ori_points_valid"] = (jnp.arange(p, dtype=jnp.int32)[None, :]
                                   < out["vgi_num_points"][:, None])
    if "feats" not in out and "feats_ones" in out and "point_valid" in out:
        b, c = out["feats_ones"].shape
        p = out["point_valid"].shape[1]
        out["feats"] = jnp.ones((b * p, c), jnp.float32)
    if "ori_feats" not in out and "ori_feats_ones" in out \
            and "ori_point_valid" in out:
        b, c = out["ori_feats_ones"].shape
        p = out["ori_point_valid"].shape[1]
        out["ori_feats"] = jnp.ones((b * p, c), jnp.float32)
    if "point_valid" in out and "batch_idx" not in out:
        b, p = out["point_valid"].shape
        out["batch_idx"] = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    # derived from the ORI side so the teacher program's EMA-only batch
    # subset decodes standalone (no student keys present there)
    if "ori_point_valid" in out and "ori_batch_idx" not in out \
            and "ori_coords" in out:
        b, p = out["ori_point_valid"].shape
        out["ori_batch_idx"] = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    return out


def device_prefetch(iterator, depth: int = 1, strip_ema: bool = False,
                    strip_keys=()):
    """Iterate device-resident batches whose host->device transfers run in a
    BACKGROUND thread. On the tunneled backend device_put blocks until the
    bytes are shipped (~80 MB/s), so in-line transfers serialise with
    compute; a transfer thread overlaps them with the device step (the
    transfer path releases the GIL)."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    stop = threading.Event()

    def worker():
        try:
            for b in iterator:
                if stop.is_set():
                    return
                q.put(device_batch(b, strip_ema=strip_ema,
                                   strip_keys=strip_keys))
            q.put(sentinel)
        except BaseException as e:  # propagate, don't masquerade as end-of-data
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            b = q.get()
            if b is sentinel:
                return
            if isinstance(b, BaseException):
                raise b
            yield b
    finally:
        stop.set()


def train(cfg, logger, output_dir="", run_name="", variant="mopa"):
    set_random_seed(cfg.RNG_SEED)
    mesh = make_data_mesh(cfg)
    if mesh is not None:
        logger.info("Data-parallel mesh: {} devices over ICI".format(
            mesh.shape["data"]))

    use_sam = variant == "mopa" and cfg.TRAIN.PC_MM.lambda_sam_cons > 0
    models, (metric_2d, metric_3d) = trainer_mod.build_models(
        cfg, output_all=use_sam)
    logger.info("Build 2D model: {}".format(cfg.MODEL_2D.TYPE))
    logger.info("Build 3D model: {}".format(cfg.MODEL_3D.TYPE))

    # data — the SOURCE stream never feeds the EMA teacher (the reference
    # regenerates target pseudo-labels only, train_xmuda_mopa.py:264-335),
    # so its loader always skips the teacher inputs; the TARGET loader skips
    # them until the EMA phase switch rebuilds it (below)
    set_random_seed(cfg.RNG_SEED)
    max_iteration = cfg.SCHEDULER.MAX_ITERATION
    ema_start_cfg = (cfg.TRAIN.PC_MM.ema_start_iter if variant == "mopa"
                     else max_iteration + 1)
    train_src = build_dataloader(cfg, "train", "source", start_iteration=0,
                                 want_ema=False)
    has_trg = variant != "baseline" and len(cfg.DATASET_TARGET.TRAIN) > 0
    train_trg = (build_dataloader(cfg, "train", "target", start_iteration=0,
                                  want_ema=0 >= ema_start_cfg)
                 if has_trg else None)
    val_period = cfg.VAL.PERIOD
    val_loader = (build_dataloader(cfg, "val", "target")
                  if val_period > 0 and len(cfg.DATASET_TARGET.VAL) > 0 else None)

    # init state from one example batch
    example = device_batch(next(iter(train_src)))
    state = trainer_mod.create_train_state(cfg, models, example)
    n_params_2d = sum(int(np.prod(x.shape))
                      for x in jax.tree_util.tree_leaves(state.params_2d))
    n_params_3d = sum(int(np.prod(x.shape))
                      for x in jax.tree_util.tree_leaves(state.params_3d))
    logger.info("Parameters: 2D {:.2e}  3D {:.2e}".format(n_params_2d, n_params_3d))

    # checkpointers (two streams, reference train_xmuda_mopa.py:140-155)
    holder = {"s": state}
    ck2d = CheckpointerV2(
        trainer_mod.CheckpointAdapter("2d", lambda: holder["s"],
                                      lambda s: holder.__setitem__("s", s)),
        save_dir=output_dir, logger=logger, postfix="_2d",
        max_to_keep=cfg.TRAIN.MAX_TO_KEEP)
    ckpt_data_2d = ck2d.load(cfg.RESUME_PATH, resume=cfg.AUTO_RESUME,
                             resume_states=cfg.RESUME_STATES)
    ck3d = CheckpointerV2(
        trainer_mod.CheckpointAdapter("3d", lambda: holder["s"],
                                      lambda s: holder.__setitem__("s", s)),
        save_dir=output_dir, logger=logger, postfix="_3d",
        max_to_keep=cfg.TRAIN.MAX_TO_KEEP)
    ckpt_data_3d = ck3d.load(cfg.RESUME_PATH, resume=cfg.AUTO_RESUME,
                             resume_states=cfg.RESUME_STATES)
    state = holder["s"]
    start_iteration = int(ckpt_data_2d.get("iteration", 0))
    ckpt_period = cfg.TRAIN.CHECKPOINT_PERIOD

    if start_iteration:
        train_src = build_dataloader(cfg, "train", "source",
                                     start_iteration=start_iteration,
                                     want_ema=False)
        if has_trg:
            train_trg = build_dataloader(
                cfg, "train", "target", start_iteration=start_iteration,
                want_ema=start_iteration >= ema_start_cfg)

    # phase-compiled steps
    with_pl = variant != "baseline" and cfg.TRAIN.XMUDA.lambda_pl > 0
    ema_start = (cfg.TRAIN.PC_MM.ema_start_iter if variant == "mopa"
                 else max_iteration + 1)
    step_pre = trainer_mod.make_train_step(cfg, models, with_pl=with_pl,
                                           with_ema=False, mesh=mesh,
                                           with_mopa=variant == "mopa")
    step_ema = None

    best_metric_name = "best_{}".format(cfg.VAL.METRIC)
    best_metric = {"2d": ckpt_data_2d.get(best_metric_name),
                   "3d": ckpt_data_3d.get(best_metric_name), "xM": None}
    best_metric_iter = {"2d": -1, "3d": -1, "xM": -1}

    # TensorBoard summaries (reference train_xmuda_mopa.py:159-163,615-620)
    summary_writer = None
    if output_dir and cfg.TRAIN.SUMMARY_PERIOD > 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            summary_writer = SummaryWriter(
                osp.join(output_dir, "tb.{:s}".format(run_name)))
        except ImportError:
            logger.info("tensorboard unavailable; skipping summaries")

    train_metric_logger = MetricLogger(delimiter="  ")
    val_metric_logger = MetricLogger(delimiter="  ")
    logger.info("Start training from iteration {}".format(start_iteration))

    # pre-EMA phases never read the EMA-teacher inputs — strip them from the
    # host->device transfers (about 45% of target-batch bytes)
    in_ema = start_iteration >= ema_start
    src_iter = device_prefetch(train_src, strip_ema=not in_ema)
    trg_iter = (device_prefetch(train_trg, strip_ema=not in_ema,
                                strip_keys=("seg_label",))
                if has_trg else None)
    end = time.time()
    eval_dict = {}

    for iteration in range(start_iteration, max_iteration):
        if iteration >= ema_start and not in_ema:
            # EMA phase switch: rebuild the pipeline WITHOUT key stripping.
            # Loaders restart at the current iteration so prefetched
            # (stripped) batches are discarded without losing sampler
            # alignment (same mechanism as crash-resume).
            in_ema = True
            # only the TARGET stream feeds the EMA teacher (reference
            # regenerates target pseudo-labels only, :264-335) — the source
            # stream keeps skipping the EMA inputs entirely
            train_src = build_dataloader(cfg, "train", "source",
                                         start_iteration=iteration,
                                         want_ema=False)
            src_iter = device_prefetch(train_src, strip_ema=True)
            if has_trg:
                train_trg = build_dataloader(cfg, "train", "target",
                                             start_iteration=iteration,
                                             want_ema=True)
                trg_iter = device_prefetch(train_trg,
                                           strip_keys=("seg_label",))
        batch_src = next(src_iter)
        batch_trg = next(trg_iter) if has_trg else batch_src

        if iteration >= ema_start:
            if step_ema is None:
                # reuse the pre-EMA compiled executable when the phase flags
                # match (the EMA wrapper only adds the small teacher program)
                reuse = (step_pre if (with_pl and variant == "mopa")
                         else None)
                step_ema = trainer_mod.make_train_step(
                    cfg, models, with_pl=True, with_ema=True, mesh=mesh,
                    with_mopa=True, reuse_step=reuse)
            state, metrics = step_ema(state, batch_src, batch_trg)
        else:
            state, metrics = step_pre(state, batch_src, batch_trg)

        cur_iter = iteration + 1
        batch_time = time.time() - end

        host_metrics = {k: np.asarray(v) for k, v in metrics.items()}
        metric_2d.update_mat(host_metrics.pop("cm_src_2d"))
        metric_3d.update_mat(host_metrics.pop("cm_src_3d"))
        train_metric_logger.update(
            time=batch_time,
            **{k: v for k, v in host_metrics.items() if v.ndim == 0})

        if cur_iter == 1 or (cfg.TRAIN.LOG_PERIOD > 0
                             and cur_iter % cfg.TRAIN.LOG_PERIOD == 0):
            logger.info("iter: {:4d}  {}  seg_iou_2d: {:.4f}  seg_iou_3d: {:.4f}".format(
                cur_iter, str(train_metric_logger),
                metric_2d.global_avg, metric_3d.global_avg))

        if summary_writer is not None and cfg.TRAIN.SUMMARY_PERIOD > 0 \
                and cur_iter % cfg.TRAIN.SUMMARY_PERIOD == 0:
            keywords = ("loss", "acc", "iou", "ety")
            for name, meter in train_metric_logger.meters.items():
                if any(k in name for k in keywords):
                    summary_writer.add_scalar("train/" + name, meter.avg,
                                              global_step=cur_iter)

        if (ckpt_period > 0 and cur_iter % ckpt_period == 0) \
                or cur_iter == max_iteration:
            holder["s"] = state
            ck2d.save("model_2d_{:06d}".format(cur_iter), iteration=cur_iter,
                      **{best_metric_name: best_metric["2d"]})
            ck3d.save("model_3d_{:06d}".format(cur_iter), iteration=cur_iter,
                      **{best_metric_name: best_metric["3d"]})

        if val_loader is not None and (cur_iter % val_period == 0
                                       or cur_iter == max_iteration):
            start_val = time.time()
            val_metric_logger.reset()
            eval_dict = validate(cfg, state, models, val_loader,
                                 val_metric_logger, logger)
            logger.info("Iteration[{}]-Val {}  total_time: {:.2f}s".format(
                cur_iter, val_metric_logger.summary_str, time.time() - start_val))
            holder["s"] = state
            for modality in ["2d", "3d", "xM"]:
                name = cfg.VAL.METRIC + "_" + modality
                if name in val_metric_logger.meters:
                    cur = val_metric_logger.meters[name].global_avg
                    if cur_iter >= max_iteration / 2 and (
                            best_metric[modality] is None
                            or best_metric[modality] < cur):
                        best_metric[modality] = cur
                        best_metric_iter[modality] = cur_iter
                        if modality in ("2d", "xM"):
                            ck2d.save("best_val_{}_2d".format(modality), tag=False)
                        if modality in ("3d", "xM"):
                            ck3d.save("best_val_{}_3d".format(modality), tag=False)
        end = time.time()

    for modality in ["2d", "3d", "xM"]:
        if best_metric[modality] is not None:
            logger.info("Best val-{}-{} = {:.2f} at iteration {}".format(
                modality.upper(), cfg.VAL.METRIC, best_metric[modality] * 100,
                best_metric_iter[modality]))

    if eval_dict and output_dir:
        out = iou_to_excel(eval_dict, osp.join(output_dir, "val_class_iou.xlsx"),
                           list(eval_dict.keys()))
        logger.info("Class-wise IoU saved to {}".format(out))
    return state, eval_dict


def main_common(variant, description, default_cfg):
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args(description, default_cfg)
    cfg = load_cfg(args)
    output_dir, run_name, log_file = prepare_output_dir(cfg, args)
    logger = get_logger(output=log_file, abbrev_name=args.task)
    logger.info("{} devices available".format(len(jax.devices())))
    logger.info(args)
    logger.info("Loaded configuration file {:s}".format(args.config_file))

    assert cfg.MODEL_2D.DUAL_HEAD == cfg.MODEL_3D.DUAL_HEAD
    if variant != "baseline":
        # at least one loss on the target domain (reference :743-746)
        assert (cfg.TRAIN.XMUDA.lambda_xm_src > 0
                or cfg.TRAIN.XMUDA.lambda_xm_trg > 0
                or cfg.TRAIN.XMUDA.lambda_pl > 0
                or cfg.TRAIN.XMUDA.lambda_minent > 0)
    else:
        assert cfg.TRAIN.XMUDA.lambda_xm_trg == 0 and cfg.TRAIN.XMUDA.lambda_pl == 0
    train(cfg, logger, output_dir, run_name, variant=variant)
