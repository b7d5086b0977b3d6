#!/usr/bin/env python
"""Synthetic end-to-end convergence gate.

Trains the full MoPA recipe (xM KL + pseudo-labels + SAM consistency + VGI,
through the EMA phase switch) on the LEARNABLE synthetic dataset — box class
encoded in box height (3D) and point-pixel colour (2D) — then evaluates
through the real ``validate()`` path on FRESH val scans and asserts mIoU
above a gate. Catches sign/masking/LR-schedule bugs that a 2-step
loss-decreases check cannot (the reference's only "test" is mIoU vs its
README table, ``/root/reference/README.md:64-104``).

Run:  python tools/convergence_check.py            (TPU, ~5 min)
      JAX_PLATFORMS=cpu python tools/convergence_check.py   (CPU, slower)

Exits non-zero if the gate fails; prints one JSON line with the metrics.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

GATE_2D = 0.70
GATE_XM = 0.70
# the 3D branch learns pure geometry from constant-1 features (reference
# parity); its gate proves the sparse-conv stack trains to a real optimum
GATE_3D = 0.50


def main():
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    import logging

    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.train.common import train

    c = cfg.clone()
    c.merge_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "../configs/synthetic/mopa_smoke.yaml"))
    n_iter = int(os.environ.get("CONV_ITERS", 500))
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.learnable = True
        d.length = 32
        d.n_points = 2048
        d.image_size = (128, 96)
    c.SCHEDULER.MAX_ITERATION = n_iter
    c.SCHEDULER.MultiStepLR.milestones = (int(n_iter * 0.8),)
    c.TRAIN.BATCH_SIZE = 4
    c.VAL.BATCH_SIZE = 4
    c.VAL.PERIOD = n_iter
    c.TRAIN.LOG_PERIOD = 50
    c.TRAIN.CHECKPOINT_PERIOD = 0
    c.TRAIN.PC_MM.ema_start_iter = int(n_iter * 0.7)  # through the EMA switch
    # log-inverse-frequency class weights, like every real reference config
    # (e.g. configs/a2d2_semantic_kitti/xmuda.yaml TRAIN.CLASS_WEIGHTS): the
    # synthetic scans are ~55% road (class 4) and the unweighted CE lets the
    # 3D head collapse to the majority class within the short gate schedule
    c.TRAIN.CLASS_WEIGHTS = [2.6, 2.6, 2.6, 2.6, 1.0,
                             2.6, 2.6, 2.6, 2.6, 2.6]
    c.TPU.POINT_BUDGET = 1024
    # OVERFLOW-FREE capacities for the gate scans (measured true dedup curve
    # max [1012, 984, 877, 590, 301, 154, 81] at the 1024-point budget). The
    # default LiDAR schedule overflowed levels 1-5 by up to 2.35x here, so
    # the deep UNet levels saw only a lexicographic PREFIX of each scene —
    # which is what kept the 3D branch near-random in the round-3 gate.
    c.TPU.CAP_FACTORS = (1.0, 1.0, 0.95, 0.65, 0.35, 0.2, 0.125)
    c.RNG_SEED = 7
    c.OUTPUT_DIR = ""
    c.freeze()

    logger = logging.getLogger("mopa_tpu.convergence")
    logging.basicConfig(level=logging.INFO)
    _, eval_dict = train(c, logger, output_dir="", run_name="convergence")

    ious = {name: float(ev.overall_iou)
            for name, ev in eval_dict.items()} if eval_dict else {}
    result = {"iters": n_iter, "miou": ious,
              "gate": {"2D": GATE_2D, "3D": GATE_3D, "2D+3D": GATE_XM}}
    ok = (ious.get("2D", 0.0) >= GATE_2D
          and ious.get("3D", 0.0) >= GATE_3D
          and ious.get("2D+3D", 0.0) >= GATE_XM)
    result["pass"] = bool(ok)
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
