#!/usr/bin/env python
"""xMUDA / xMUDA+PL training CLI (reference ``mopa/train/train_xmuda.py``)."""

from mopa_tpu.train.common import main_common


def main():
    main_common("xmuda", "xMUDA training (TPU)",
                "configs/nuscenes/usa_singapore/xmuda.yaml")


if __name__ == "__main__":
    main()
