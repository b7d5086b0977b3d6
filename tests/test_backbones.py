"""SPVCNN and SalsaNext 3D-backbone paths (reference TYPE surface:
``mopa/config/xmuda.py:226-238``, ``mopa/data/collate.py:11-123``,
``mopa/data/utils/validate.py:97-109`` — the reference ships no model for
either, ``mopa/models/xmuda_arch.py:97``; these are working TPU-native
implementations)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.train import trainer

from test_trainer import tiny_cfg, _loaders, _device_batch

pytestmark = pytest.mark.slow  # heavy: see pytest.ini


def test_salsanext_forward_shapes():
    from mopa_tpu.models.salsanext import SalsaNext

    model = SalsaNext(in_channels=5, base=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 64, 5)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x))
    assert out.shape == (1, 32, 64, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_spvcnn_forward_and_grads():
    from mopa_tpu.models.scn_unet import build_unet_plan
    from mopa_tpu.models.spvcnn import NUM_LEVELS, SPVCNN

    rng = np.random.default_rng(1)
    n = 300
    coords = rng.integers(0, 64, (n, 3)).astype(np.int32)
    batch_idx = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    valid[-20:] = False
    feats = rng.normal(size=(n, 4)).astype(np.float32)

    model = SPVCNN(in_channels=4, cs=(8, 8, 16, 16, 16, 16, 16, 8, 8))
    plan = jax.jit(lambda: build_unet_plan(
        jnp.asarray(coords), jnp.asarray(batch_idx), jnp.asarray(valid),
        num_levels=NUM_LEVELS))()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), plan,
                           train=False)
    out = model.apply(variables, jnp.asarray(feats), plan, train=False)
    assert out.shape == (n, 8)
    assert np.isfinite(np.asarray(out)).all()
    # padding points produce no NaNs and gradients flow
    def loss(p):
        out = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(feats), plan, train=False)
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0


def _tiny_backbone_cfg(backbone):
    kw = {"MODEL_3D.TYPE": backbone}
    c = tiny_cfg(**kw)
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.proj_W = 64
        d.proj_H = 16
    return c


def test_spvcnn_xmuda_train_step_and_validate():
    import logging

    from mopa_tpu.common.metric_logger import MetricLogger
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.data.utils.validate import validate

    c = _tiny_backbone_cfg("SPVCNN")
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))
    assert bs["feats"].shape[-1] == 4  # xyz + intensity
    state = trainer.create_train_state(c, models, bs)
    step = trainer.make_train_step(c, models, with_pl=False, with_ema=False)
    state1, m = step(state, bs, bt)
    m = {k: np.asarray(v) for k, v in m.items()}
    for k in ("loss_src_2d", "loss_src_3d", "xm_loss_src_2d", "total_loss"):
        assert np.isfinite(m[k]), (k, m[k])

    c.VAL.BATCH_SIZE = 2
    c.DATASET_TARGET.SyntheticSCN.length = 4
    val_loader = build_dataloader(c, "val", "target")
    logger = logging.getLogger("test_backbones")
    eval_dict = validate(c, state1, models, val_loader, MetricLogger(), logger)
    assert eval_dict["3D"].confusion_matrix.sum() > 0


def test_salsanext_xmuda_train_step_and_validate():
    import logging

    from mopa_tpu.common.metric_logger import MetricLogger
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.data.utils.validate import validate

    c = _tiny_backbone_cfg("SalsaNext")
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))
    assert bs["proj_in"].shape == (2, 16, 64, 5)
    assert bs["proj_xy"].shape[2] == 2
    state = trainer.create_train_state(c, models, bs)
    step = trainer.make_train_step(c, models, with_pl=False, with_ema=False)
    state1, m = step(state, bs, bt)
    m = {k: np.asarray(v) for k, v in m.items()}
    for k in ("loss_src_2d", "loss_src_3d", "total_loss"):
        assert np.isfinite(m[k]), (k, m[k])

    c.VAL.BATCH_SIZE = 2
    c.DATASET_TARGET.SyntheticSCN.length = 4
    val_loader = build_dataloader(c, "val", "target")
    logger = logging.getLogger("test_backbones")
    eval_dict = validate(c, state1, models, val_loader, MetricLogger(), logger)
    assert eval_dict["3D"].confusion_matrix.sum() > 0
