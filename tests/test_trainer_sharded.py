"""Sharded (8-device mesh) train-step test.

Split from test_trainer.py so every slow test FILE fits a < 5-minute CI
budget individually (measured budgets in pytest.ini)."""

import jax
import numpy as np
import pytest

from test_trainer import _device_batch, _loaders, tiny_cfg
from mopa_tpu.train import trainer

@pytest.mark.slow
def test_train_step_sharded_8dev():
    mesh = jax.make_mesh((8,), ("data",))
    c = tiny_cfg()
    c.TRAIN.BATCH_SIZE = 8
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))
    state = trainer.create_train_state(c, models, bs)
    step = trainer.make_train_step(c, models, with_pl=False, with_ema=False,
                                   mesh=mesh)
    state1, m = step(state, bs, bt)
    assert np.isfinite(np.asarray(m["total_loss"]))
    assert int(state1.step) == 1
