import os

import numpy as np
import pytest

from mopa_tpu.common.config import CfgNode as CN, purge_cfg
from mopa_tpu.common.metric_logger import AverageMeter, MetricLogger, iou_to_excel
from mopa_tpu.common.sampler import IterationBasedBatchSampler
from mopa_tpu.common.checkpoint import CheckpointerV2


def test_cfg_merge_and_tuple_coercion(tmp_path):
    from mopa_tpu.config.xmuda import cfg

    c = cfg.clone()
    yaml_text = """
MODEL_2D:
  TYPE: "UNetResNet34"
  NUM_CLASSES: 10
SCHEDULER:
  TYPE: "MultiStepLR"
  MultiStepLR:
    milestones: (80000, 90000)
  MAX_ITERATION: 100000
DATASET_SOURCE:
  TYPE: "A2D2SCN"
  TRAIN: ("train",)
TRAIN:
  CLASS_WEIGHTS: [1.0, 2.0]
"""
    p = tmp_path / "exp.yaml"
    p.write_text(yaml_text)
    c.merge_from_file(str(p))
    assert c.MODEL_2D.NUM_CLASSES == 10
    assert c.SCHEDULER.MultiStepLR.milestones == (80000, 90000)
    assert c.DATASET_SOURCE.TRAIN == ("train",)
    assert c.TRAIN.CLASS_WEIGHTS == [1.0, 2.0]

    c.merge_from_list(["TRAIN.BATCH_SIZE", "8", "MODEL_3D.TYPE", "SCN"])
    assert c.TRAIN.BATCH_SIZE == 8
    assert c.MODEL_3D.TYPE == "SCN"

    c.freeze()
    with pytest.raises(AttributeError):
        c.TRAIN.BATCH_SIZE = 2

    c.defrost()
    purge_cfg(c)
    # sibling model cfgs not matching TYPE are pruned
    assert "DeepLabV3" not in c.MODEL_2D
    assert "UNetResNet34" in c.MODEL_2D
    assert "SPVCNN" not in c.MODEL_3D


def test_cfg_rejects_unknown_key(tmp_path):
    from mopa_tpu.config.xmuda import cfg

    c = cfg.clone()
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 3\n")
    with pytest.raises(KeyError):
        c.merge_from_file(str(p))


def test_reference_style_configs_load():
    from mopa_tpu.config.xmuda import cfg

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    n = 0
    for root, _, files in os.walk(cfg_dir):
        for fn in files:
            if fn.endswith(".yaml"):
                c = cfg.clone()
                c.merge_from_file(os.path.join(root, fn))
                n += 1
    assert n >= 15


def test_average_meter_window():
    m = AverageMeter(window_size=3)
    for v in [1, 2, 3, 4]:
        m.update(v)
    assert m.avg == pytest.approx((2 + 3 + 4) / 3)
    assert m.global_avg == pytest.approx(10 / 4)


def test_metric_logger_accepts_arrays():
    import jax.numpy as jnp

    ml = MetricLogger(delimiter="  ")
    ml.update(loss=np.float32(2.0), acc=jnp.asarray(0.5))
    assert ml.meters["loss"].global_avg == pytest.approx(2.0)
    assert "loss" in str(ml)
    ml.remove("loss")
    assert "loss" not in ml.meters


def test_iteration_sampler_resume():
    s_full = IterationBasedBatchSampler(10, 2, num_iterations=8, start_iter=0, seed=3)
    batches = [b.tolist() for b in s_full]
    assert len(batches) == 8
    s_resume = IterationBasedBatchSampler(10, 2, num_iterations=8, start_iter=5, seed=3)
    resumed = [b.tolist() for b in s_resume]
    assert resumed == batches[5:]


class _DictState:
    def __init__(self):
        self.d = {"model": {"w": np.arange(4, dtype=np.float32)}}

    def state_dict(self):
        return self.d

    def load_state_dict(self, ckpt, resume_states=True):
        self.d = {"model": ckpt["model"]}
        return {k: v for k, v in ckpt.items() if k not in ("model",)}


def test_checkpointer_ring_and_resume(tmp_path):
    sp = _DictState()
    ck = CheckpointerV2(sp, save_dir=str(tmp_path), postfix="_2d", max_to_keep=2)
    ck.save("model_000001", iteration=1)
    ck.save("model_000002", iteration=2)
    ck.save("model_000003", iteration=3)
    files = sorted(os.listdir(tmp_path))
    assert "model_000001.pth" not in files  # evicted by ring
    assert "model_000003.pth" in files

    sp2 = _DictState()
    sp2.d["model"]["w"] = np.zeros(4, dtype=np.float32)
    ck2 = CheckpointerV2(sp2, save_dir=str(tmp_path), postfix="_2d", max_to_keep=2)
    extra = ck2.load(resume=True)
    assert extra.get("iteration") == 3
    np.testing.assert_array_equal(sp2.d["model"]["w"], np.arange(4, dtype=np.float32))


def test_iou_to_excel_writes_real_xlsx(tmp_path):
    """Format parity with the reference's openpyxl export
    (mopa/common/utils/metric_logger.py:119-135): a real .xlsx workbook."""
    class FakeEval:
        class_names = ("car", "road")
        class_iou = [0.5, float("nan")]
        overall_iou = 0.25

    out = iou_to_excel({"2D": FakeEval(), "3D": FakeEval()},
                       str(tmp_path / "t.xlsx"), ["2D", "3D"])
    assert out.endswith(".xlsx") and os.path.exists(out)

    import zipfile

    assert zipfile.is_zipfile(out)  # xlsx is a zip container
    from mopa_tpu.common.xlsx import read_xlsx_rows

    rows = read_xlsx_rows(out)
    assert rows[0] == ["modality", "car", "road", "overall_iou"]
    assert rows[1] == ["2D", 0.5, 0.0, 0.25]  # NaN IoU -> 0.0 like reference
    assert rows[2][0] == "3D"

    # .csv path still produces the same table as CSV
    out_csv = iou_to_excel({"2D": FakeEval()}, str(tmp_path / "t.csv"), ["2D"])
    assert out_csv.endswith(".csv")
    with open(out_csv) as f:
        assert f.readline().strip() == "modality,car,road,overall_iou"


def test_warmup_multistep_lr_matches_torch_formula():
    """WarmupMultiStepLR multiplier == the reference's get_lr (maskrcnn-style,
    mopa/common/solver/lr_scheduler.py:6-51) at every step."""
    from bisect import bisect_right

    import numpy as np

    from mopa_tpu.common.solver import build_lr_schedule
    from mopa_tpu.config.xmuda import cfg as base_cfg

    for method in ("linear", "constant"):
        c = base_cfg.clone()
        c.SCHEDULER.TYPE = "WarmupMultiStepLR"
        c.SCHEDULER.WarmupMultiStepLR.milestones = (8, 12)
        c.SCHEDULER.WarmupMultiStepLR.gamma = 0.1
        c.SCHEDULER.WarmupMultiStepLR.warmup_factor = 0.25
        c.SCHEDULER.WarmupMultiStepLR.warmup_steps = 5
        c.SCHEDULER.WarmupMultiStepLR.warmup_method = method
        sched = build_lr_schedule(c)
        for step in range(16):
            wf = 1.0
            if step < 5:
                if method == "constant":
                    wf = 0.25
                else:
                    alpha = step / 5
                    wf = 0.25 * (1 - alpha) + alpha
            want = wf * 0.1 ** bisect_right([8, 12], step)
            got = float(np.asarray(sched(step)))
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=(
                method, step))


def test_wire_elision_roundtrip():
    """device_batch drops derivable arrays (valid masks -> counts, all-ones
    feats -> (B, C) marker, batch_idx/coords) and decode_batch rebuilds them
    in-graph, bit-exactly."""
    import numpy as np

    from mopa_tpu.config.xmuda import cfg as base_cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train.common import decode_batch, device_batch

    c = base_cfg.clone()
    c.merge_from_file("configs/synthetic/mopa_smoke.yaml")
    c.TRAIN.BATCH_SIZE = 2
    c.TPU.POINT_BUDGET = 512
    raw = next(iter(build_dataloader(c, "train", "target")))
    # host-side VGI (data/vgi_host.py) removes the raw VGI inputs from the
    # batch entirely (ori_points/ori_points_valid/obj_pc/...); the elision
    # roundtrip below covers whichever derivable keys remain
    keys = [k for k in ("point_valid", "ori_point_valid", "ori_points_valid",
                        "feats", "ori_feats") if k in raw]
    assert "point_valid" in keys and "feats" in keys
    dev = device_batch(raw)
    for k in keys + ["batch_idx"]:
        assert k not in dev, k
    dec = decode_batch(dev)
    for k in keys:
        np.testing.assert_array_equal(
            np.asarray(raw[k], np.float32), np.asarray(dec[k], np.float32),
            err_msg=k)
    # strip_ema keeps the EMA-only markers off the wire entirely
    lean = device_batch(raw, strip_ema=True)
    assert "ori_feats_ones" not in lean and "ori_num_points" not in lean
