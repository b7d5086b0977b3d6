#!/usr/bin/env python
"""Break down the MoPA train-step cost on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.common.cache import enable_compile_cache

enable_compile_cache()


def timed(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print("{:35s} {:8.1f} ms".format(name, dt * 1000), flush=True)
    return dt


def timed_state(step, state, *args, n=3, name=""):
    """Time a donated-state step by threading the new state through."""
    state, out = step(state, *args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        state, out = step(state, *args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print("{:35s} {:8.1f} ms".format(name, dt * 1000), flush=True)
    return dt


def main():
    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import device_batch

    c = cfg.clone()
    c.merge_from_file("configs/synthetic/mopa_smoke.yaml")
    c.TRAIN.BATCH_SIZE = 8
    c.TPU.POINT_BUDGET = 16384
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    c.MODEL_3D.SCN.m = 16
    c.MODEL_3D.SCN.num_planes = 7
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 24000
        d.image_size = (480, 302)
        d.length = 8
    c.DATALOADER.NUM_WORKERS = 4

    models, _ = trainer_mod.build_models(c, output_all=True)
    src = device_batch(next(iter(build_dataloader(c, "train", "source"))))
    trg = device_batch(next(iter(build_dataloader(c, "train", "target"))))
    state = trainer_mod.create_train_state(c, models, src)

    # 1. plan build
    plan_fn = jax.jit(lambda coords, bidx, v: trainer_mod.build_plan_from_batch(
        c, coords, bidx, v))
    timed(plan_fn, src["coords"], src["batch_idx"],
          src["point_valid"].reshape(-1), name="plan build (7 levels)")

    plan = plan_fn(src["coords"], src["batch_idx"], src["point_valid"].reshape(-1))

    # 2. 3D forward only
    fwd3d = jax.jit(lambda p, feats: models.model_3d.apply(
        {"params": p, "batch_stats": state.batch_stats_3d}, feats, plan,
        train=False))
    timed(fwd3d, state.params_3d, src["feats"], name="3D forward (prebuilt plan)")

    # 3. 2D forward only
    fwd2d = jax.jit(lambda p: models.model_2d.apply(
        {"params": p, "batch_stats": state.batch_stats_2d}, src["img"],
        src["img_indices"], src["point_valid"], train=False))
    timed(fwd2d, state.params_2d, name="2D forward")

    # 4. VGI transform alone
    from mopa_tpu.ops import mixmatch

    vgi_fn = jax.jit(lambda b, k: mixmatch.vgi_insert_batch(c, b, None, k))
    key = jax.random.PRNGKey(0)
    timed(vgi_fn, trg, key, name="VGI transform")

    # 5. full step without VGI/SAM
    c2 = c.clone()
    c2.defrost() if c2.is_frozen() else None
    c2.TRAIN.PC_MM.lambda_pc_mm = 0.0
    c2.TRAIN.PC_MM.lambda_sam_cons = 0.0
    models2, _ = trainer_mod.build_models(c2, output_all=False)
    state2 = trainer_mod.create_train_state(c2, models2, src)
    step2 = trainer_mod.make_train_step(c2, models2, with_pl=True, with_ema=False)
    timed_state(step2, state2, src, trg, name="step: xm+pl (no vgi/sam)")

    # 6. full step
    step = trainer_mod.make_train_step(c, models, with_pl=True, with_ema=False)
    timed_state(step, state, src, trg, name="step: full MoPA")


if __name__ == "__main__":
    main()
