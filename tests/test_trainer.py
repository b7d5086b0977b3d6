import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopa_tpu.config.xmuda import cfg as default_cfg
from mopa_tpu.data.build import build_dataloader
from mopa_tpu.train import trainer


def tiny_cfg(**kw):
    c = default_cfg.clone()
    c.MODEL_2D.TYPE = "UNetResNet34"
    c.MODEL_3D.TYPE = "SCN"
    c.MODEL_2D.NUM_CLASSES = 5
    c.MODEL_3D.NUM_CLASSES = 5
    c.MODEL_2D.DUAL_HEAD = True
    c.MODEL_3D.DUAL_HEAD = True
    c.MODEL_3D.SCN.m = 4
    c.MODEL_3D.SCN.num_planes = 2
    c.DATASET_SOURCE.TYPE = "SyntheticSCN"
    c.DATASET_SOURCE.TRAIN = ("train",)
    c.DATASET_TARGET.TYPE = "SyntheticSCN"
    c.DATASET_TARGET.TRAIN = ("train",)
    c.DATASET_TARGET.VAL = ("val",)
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.length = 8
        d.n_points = 400
        d.image_size = (48, 32)
        d.num_classes = 5
    c.OPTIMIZER.MODEL_2D.TYPE = "Adam"
    c.OPTIMIZER.MODEL_3D.TYPE = "Adam"
    c.SCHEDULER.TYPE = "MultiStepLR"
    c.SCHEDULER.MultiStepLR.milestones = (4,)
    c.SCHEDULER.MAX_ITERATION = 2
    c.TRAIN.BATCH_SIZE = 2
    c.TRAIN.CLASS_WEIGHTS = [1.0, 2.0, 1.0, 1.0, 1.0]
    c.TRAIN.XMUDA.lambda_xm_src = 1.0
    c.TRAIN.XMUDA.lambda_xm_trg = 0.1
    c.TPU.POINT_BUDGET = 256
    c.TPU.SAM_MASK_BUDGET = 8
    c.TPU.COMPUTE_DTYPE = "float32"
    c.DATALOADER.NUM_WORKERS = 0
    for k, v in kw.items():
        node = c
        parts = k.split(".")
        for q in parts[:-1]:
            node = node[q]
        node[parts[-1]] = v
    return c


def _loaders(c):
    src = build_dataloader(c, "train", "source")
    trg = build_dataloader(c, "train", "target")
    return iter(src), iter(trg)


def _device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")}


@pytest.mark.slow
def test_xmuda_train_step_runs_and_learns():
    c = tiny_cfg()
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))
    state = trainer.create_train_state(c, models, bs)
    step = trainer.make_train_step(c, models, with_pl=False, with_ema=False)

    state1, m1 = step(state, bs, bt)
    m1 = {k: np.asarray(v) for k, v in m1.items()}
    for k in ("loss_src_2d", "loss_src_3d", "xm_loss_src_2d", "xm_loss_trg_2d",
              "total_loss"):
        assert np.isfinite(m1[k]), k
    assert m1["cm_src_2d"].shape == (5, 5)

    # same batch repeatedly: source CE must trend down
    st, m_last = state1, m1
    for _ in range(5):
        st, m_last = step(st, bs, bt)
    assert int(st.step) == 6
    assert float(m_last["loss_src_2d"]) < float(m1["loss_src_2d"])
    assert float(m_last["loss_src_3d"]) < float(m1["loss_src_3d"])


@pytest.mark.slow
def test_ema_train_step():
    c = tiny_cfg(**{
        "TRAIN.XMUDA.lambda_pl": 1.0,
        "TRAIN.PC_MM.ema_start_iter": 0,
        "TRAIN.PC_MM.ema_alpha_teacher": 0.99,
    })
    c.DATASET_TARGET.SyntheticSCN.with_ema = True
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))
    state = trainer.create_train_state(c, models, bs)
    step = trainer.make_train_step(c, models, with_pl=True, with_ema=True)
    state1, m = step(state, bs, bt)
    assert np.isfinite(np.asarray(m["pl_loss_trg_2d"]))
    # EMA params moved but stayed close to the student
    p_new = jax.tree_util.tree_leaves(state1.params_2d)[0]
    e_new = jax.tree_util.tree_leaves(state1.ema_params_2d)[0]
    assert not np.allclose(np.asarray(p_new), np.asarray(e_new))


@pytest.mark.slow
def test_checkpoint_adapter_roundtrip(tmp_path):
    from mopa_tpu.common.checkpoint import CheckpointerV2

    c = tiny_cfg()
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    state = trainer.create_train_state(c, models, bs)

    holder = {"s": state}
    adapter = trainer.CheckpointAdapter(
        "2d", lambda: holder["s"], lambda s: holder.__setitem__("s", s))
    ck = CheckpointerV2(adapter, save_dir=str(tmp_path), postfix="_2d")
    ck.save("model_2d_000002", iteration=2)

    # perturb then restore
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params_2d)
    holder["s"] = state._replace(params_2d=zeroed)
    extra = ck.load(resume=True)
    assert extra["iteration"] == 2
    w0 = jax.tree_util.tree_leaves(state.params_2d)[0]
    w1 = jax.tree_util.tree_leaves(holder["s"].params_2d)[0]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))


@pytest.mark.slow
def test_scan_steps_matches_chained_steps():
    """scan_steps=n (one dispatch, fori_loop body — bench.py's device-
    resident measurement mode) must be step-for-step equivalent to n
    chained dispatches of the plain step."""
    c = tiny_cfg()
    models, _ = trainer.build_models(c, output_all=False)
    src_it, trg_it = _loaders(c)
    bs = _device_batch(next(src_it))
    bt = _device_batch(next(trg_it))

    state = trainer.create_train_state(c, models, bs, seed=7)
    step = trainer.make_train_step(c, models, with_pl=False, with_ema=False)
    st_ref = state
    for _ in range(3):
        st_ref, m_ref = step(st_ref, bs, bt)

    state2 = trainer.create_train_state(c, models, bs, seed=7)
    step3 = trainer.make_train_step(c, models, with_pl=False, with_ema=False,
                                    scan_steps=3)
    st_scan, m_scan = step3(state2, bs, bt)

    assert int(st_scan.step) == int(st_ref.step) == 3
    # distinct XLA programs (fori_loop body vs standalone step) fuse and
    # order f32 reductions differently — equivalence is semantic, not bit
    np.testing.assert_allclose(float(m_scan["total_loss"]),
                               float(m_ref["total_loss"]), rtol=5e-4)
    w_ref = jax.tree_util.tree_leaves(st_ref.params_3d)[0]
    w_scan = jax.tree_util.tree_leaves(st_scan.params_3d)[0]
    np.testing.assert_allclose(np.asarray(w_scan), np.asarray(w_ref),
                               rtol=1e-3, atol=1e-5)
