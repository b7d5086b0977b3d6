"""Device mesh construction for data parallelism.

The distributed layer of this framework (SURVEY §2.7): a single ``data`` mesh
axis over all local devices (ICI), extended transparently to multi-host DCN by
``jax.distributed``. Parameters replicate; batches shard on the leading axis;
gradients/metrics/batch-stats reduce with psum/pmean inside the shard_mapped
train step.
"""

from __future__ import annotations

import jax


def make_data_mesh(cfg=None, num_devices=None):
    """Return a 1-D 'data' mesh, or None for single-device runs."""
    if num_devices is None:
        num_devices = 0
        if cfg is not None and "TPU" in cfg:
            num_devices = int(cfg.TPU.DATA_PARALLEL)
        if num_devices == 0:
            num_devices = len(jax.devices())
    if num_devices <= 1:
        return None
    devices = jax.devices()[:num_devices]
    return jax.make_mesh((len(devices),), ("data",), devices=devices)


def initialize_distributed():
    """Multi-host init (no-op single-process). Call before device queries."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass
