#!/usr/bin/env python
"""Evaluation / pseudo-label generation CLI (reference ``mopa/test/test.py``).

``python -m mopa_tpu.test.test --cfg <yaml> --model_prefix <dir>
  [--ckpt2d x.pth --ckpt3d y.pth] [--pselab_dir NAME] [KEY VALUE ...]``
"""

import os.path as osp

import jax

from mopa_tpu.common.checkpoint import CheckpointerV2
from mopa_tpu.common.logger import get_logger
from mopa_tpu.common.metric_logger import MetricLogger
from mopa_tpu.common.rng import set_random_seed
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.data.utils.validate import validate
from mopa_tpu.train import trainer as trainer_mod
from mopa_tpu.train.common import device_batch, load_cfg, parse_args


def test_model(cfg, logger, args):
    set_random_seed(cfg.RNG_SEED)
    models, _ = trainer_mod.build_models(cfg, output_all=False)
    loader = build_dataloader(cfg, mode="test", domain="target")

    example = device_batch(next(iter(loader)))
    state = trainer_mod.create_train_state(cfg, models, example)

    holder = {"s": state}
    for which, postfix, ckpt in (("2d", "_2d", args.ckpt2d),
                                 ("3d", "_3d", args.ckpt3d)):
        adapter = trainer_mod.CheckpointAdapter(
            which, lambda: holder["s"], lambda s: holder.__setitem__("s", s))
        ck = CheckpointerV2(adapter, save_dir=args.model_prefix, logger=logger,
                            postfix=postfix)
        path = osp.join(args.model_prefix, ckpt) if ckpt else None
        ck.load(path, resume=not ckpt, resume_states=False)
    state = holder["s"]

    pselab_dir = args.pselab_dir
    if pselab_dir is not None:
        assert len(cfg.DATASET_TARGET.TEST) == 1

    metric_logger = MetricLogger(delimiter="  ")
    return validate(cfg, state, models, loader, metric_logger, logger,
                    pselab_dir=pselab_dir)


def main():
    args = parse_args("MoPA-TPU evaluation",
                      "configs/nuscenes/usa_singapore/xmuda.yaml",
                      with_test_args=True)
    cfg = load_cfg(args)
    logger = get_logger(abbrev_name=args.task)
    logger.info("{} devices available".format(len(jax.devices())))
    logger.info(args)
    test_model(cfg, logger, args)


if __name__ == "__main__":
    main()
