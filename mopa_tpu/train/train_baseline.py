#!/usr/bin/env python
"""Source-only baseline training CLI (reference ``mopa/train/train_baseline.py``)."""

from mopa_tpu.train.common import main_common


def main():
    main_common("baseline", "Baseline (source-only) training (TPU)",
                "configs/nuscenes/usa_singapore/baseline.yaml")


if __name__ == "__main__":
    main()
