"""Executed logit-parity vs the recorded golden fixture.

``tests/goldens/parity_scan.npz`` pins one synthetic scan plus the logits of
the reference-architecture replicas (torch UNetResNet34 Net2DSeg + numpy scn
graph at production depth m=16 / 7 planes — generated once by
``tools/make_parity_golden.py``). This test regenerates the replica state
dicts from the recorded torch seed, pushes them through the REAL released-
checkpoint import path (``tools/parity_check.py::run_parity`` →
``torch_compat.import_reference_2d/3d``), and asserts per-point logit deltas
— so "checkpoint parity within tolerance" is an executed CI number, not a
promise gated on unavailable assets (reference reproducibility contract:
``/root/reference/README.md:107-119``).
"""

import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "parity_scan.npz")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_parity_golden_executed():
    sys.path.insert(0, TOOLS)
    import make_parity_golden as gen
    from parity_check import run_parity

    golden = np.load(GOLDEN)
    _, sd2d, sd3d, _ = gen.build_replicas()
    # the golden was generated FROM these seeded dicts; if the torch RNG
    # stream ever changes (version bump), fail with a regeneration hint
    # instead of a meaningless logit diff
    for name, sd in (("sd2d", sd2d), ("sd3d", sd3d)):
        want = bytes(golden[name + "_sha256"]).decode()
        got = gen.state_dict_fingerprint(sd)
        assert got == want, (
            "replica state dict fingerprint changed (torch {} vs golden's "
            "{}): regenerate with tools/make_parity_golden.py".format(
                __import__("torch").__version__,
                bytes(golden["torch_version"]).decode()))

    from mopa_tpu.config.xmuda import cfg as base_cfg

    n = int(golden["coords"].shape[0])
    c = base_cfg.clone()
    c.MODEL_2D.TYPE = "UNetResNet34"
    c.MODEL_3D.TYPE = "SCN"
    c.MODEL_2D.NUM_CLASSES = gen.NCLS
    c.MODEL_3D.NUM_CLASSES = gen.NCLS
    c.MODEL_2D.DUAL_HEAD = True
    c.MODEL_3D.DUAL_HEAD = True
    c.MODEL_2D.UNetResNet34.pretrained = False
    c.OPTIMIZER.MODEL_2D.TYPE = "Adam"
    c.OPTIMIZER.MODEL_3D.TYPE = "Adam"
    c.MODEL_3D.SCN.m = gen.M
    c.MODEL_3D.SCN.num_planes = gen.NUM_PLANES
    c.MODEL_3D.SCN.full_scale = gen.SCALE
    c.TPU.POINT_BUDGET = ((n + 127) // 128) * 128
    c.TPU.COMPUTE_DTYPE = "float32"
    # overflow-free: parity requires no capacity-dropped voxel at any level
    c.TPU.CAP_FACTORS = (1.0,) * gen.NUM_PLANES

    report = run_parity(c, sd2d, sd3d, golden=golden)
    assert report["n_points"] == n
    # fp32 tolerance at production depth (observed: 2d ~1e-5, 3d ~1e-4)
    assert report["logit_delta_max_2d"] < 5e-3, report
    assert report["logit_delta_max_3d"] < 5e-3, report
    assert report["argmax_agreement_2d"] > 0.999, report
    assert report["argmax_agreement_3d"] > 0.995, report


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
