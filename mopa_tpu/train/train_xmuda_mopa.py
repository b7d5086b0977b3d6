#!/usr/bin/env python
"""MoPA training CLI: xMUDA + pseudo-labels + VGI + SAM consistency + EMA.

Entry point mirroring the reference ``mopa/train/train_xmuda_mopa.py``:
``python -m mopa_tpu.train.train_xmuda_mopa --cfg <yaml> [KEY VALUE ...]``.
"""

from mopa_tpu.train.common import main_common


def main():
    main_common("mopa", "MoPA training (TPU)",
                "configs/nuscenes/usa_singapore/xmuda_pl_mopa.yaml")


if __name__ == "__main__":
    main()
