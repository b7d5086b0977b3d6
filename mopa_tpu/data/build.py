"""Dataloader factory (reference ``mopa/data/build.py:13-106``).

Builds the dataset selected by ``DATASET_{SOURCE,TARGET}.TYPE``, strips
augmentation for eval, gates the MoPA-only inputs (VGI objects / SAM masks /
ground indices / EMA originals) to train+target, wraps training in an
iteration-based resumable sampler and collates into padded numpy batches
(static shapes for the jitted step). A thread pool overlaps per-sample
loading with device compute — the torch DataLoader worker-process pool is
replaced by threads because the heavy lifting (jit step) releases the GIL.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from mopa_tpu.common.sampler import IterationBasedBatchSampler
from mopa_tpu.data.a2d2.a2d2_dataloader import A2D2SCN
from mopa_tpu.data.collate import collate_padded
from mopa_tpu.data.nuscenes.nuscenes_dataloader import NuScenesSCN
from mopa_tpu.data.semantic_kitti.semantic_kitti_dataloader import SemanticKITTISCN
from mopa_tpu.data.synthetic import SyntheticSCN

DATASET_TYPES = {
    "NuScenesSCN": NuScenesSCN,
    "A2D2SCN": A2D2SCN,
    "SemanticKITTISCN": SemanticKITTISCN,
    "SyntheticSCN": SyntheticSCN,
}

# default static per-sample point budgets (post-FOV/crop counts per dataset)
DEFAULT_POINT_BUDGET = {
    "NuScenesSCN": 4096,
    "A2D2SCN": 16384,
    "SemanticKITTISCN": 16384,
    "SyntheticSCN": 4096,
}


def point_budget_for(cfg, dataset_type):
    budget = int(cfg.TPU.POINT_BUDGET) if "TPU" in cfg else 0
    return budget or DEFAULT_POINT_BUDGET.get(dataset_type, 16384)


class DataLoader:
    """Iterable over padded batches with threaded sample prefetch."""

    def __init__(self, dataset, batch_sampler, point_budget, mask_budget=64,
                 num_workers=0):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.point_budget = point_budget
        self.mask_budget = mask_budget
        self.num_workers = num_workers

    def _load_batch(self, indices):
        if self.num_workers > 1:
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                samples = list(ex.map(self.dataset.__getitem__, indices))
        else:
            samples = [self.dataset[i] for i in indices]
        return collate_padded(samples, self.point_budget,
                              mask_budget=self.mask_budget)

    def __iter__(self):
        for indices in self.batch_sampler:
            yield self._load_batch(indices)

    def __len__(self):
        return len(self.batch_sampler)


def build_dataloader(cfg, mode="train", domain="source", start_iteration=0,
                     halve_batch_size=False):
    assert mode in ("train", "val", "test")
    dataset_cfg = cfg.get("DATASET_" + domain.upper())
    split = dataset_cfg[mode.upper()]
    is_train = mode == "train"
    batch_size = cfg.TRAIN.BATCH_SIZE if is_train else cfg.VAL.BATCH_SIZE
    if halve_batch_size:
        batch_size = batch_size // 2

    dataset_kwargs = dict(dataset_cfg.get(dataset_cfg.TYPE, {}))
    aug = dict(dataset_kwargs.pop("augmentation", {}))
    if is_train:
        dataset_kwargs.update(aug)

    if dataset_cfg.TYPE != "SyntheticSCN":
        # MoPA inputs only exist for target-domain training
        # (reference data/build.py:31-45)
        if not (is_train and domain == "target"):
            for key in ("use_pc_mm", "multi_objs", "obj_name_ls", "obj_root_dir",
                        "z_disc", "sc_rotation", "sam_mask_dir", "g_indices_dir",
                        "ema_input", "ps_label_dir", "pselab_paths"):
                dataset_kwargs.pop(key, None)
        else:
            dataset_kwargs.pop("pselab_paths", None)
        if "SCN" in cfg.MODEL_3D.keys() and "full_scale" in dataset_kwargs:
            assert dataset_kwargs["full_scale"] == cfg.MODEL_3D.SCN.full_scale
        # EMA originals ride the `ema_input` kwarg; VGI via use_pc_mm
        if "ema_input" in dataset_kwargs and not dataset_kwargs.get("ema_input"):
            dataset_kwargs.pop("ema_input")

    dataset_cls = DATASET_TYPES[dataset_cfg.TYPE]
    dataset = dataset_cls(split=tuple(split), output_orig=not is_train,
                          **dataset_kwargs) \
        if dataset_cfg.TYPE != "A2D2SCN" else dataset_cls(split=tuple(split),
                                                          **dataset_kwargs)

    if is_train:
        sampler = IterationBasedBatchSampler(
            len(dataset), batch_size, cfg.SCHEDULER.MAX_ITERATION,
            start_iter=start_iteration, shuffle=True,
            drop_last=cfg.DATALOADER.DROP_LAST, seed=cfg.RNG_SEED)
    else:
        n_batches = (len(dataset) + batch_size - 1) // batch_size
        order = np.arange(len(dataset))
        sampler = [order[i * batch_size:(i + 1) * batch_size]
                   for i in range(n_batches)]

    mask_budget = int(cfg.TPU.SAM_MASK_BUDGET) if "TPU" in cfg else 64
    return DataLoader(dataset, sampler, point_budget_for(cfg, dataset_cfg.TYPE),
                      mask_budget=mask_budget,
                      num_workers=cfg.DATALOADER.NUM_WORKERS)
