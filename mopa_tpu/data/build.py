"""Dataloader factory (reference ``mopa/data/build.py:13-106``).

Builds the dataset selected by ``DATASET_{SOURCE,TARGET}.TYPE``, strips
augmentation for eval, gates the MoPA-only inputs (VGI objects / SAM masks /
ground indices / EMA originals) to train+target, wraps training in an
iteration-based resumable sampler and collates into padded numpy batches
(static shapes for the jitted step).

Input pipeline: a producer thread loads + collates batches through a
persistent worker pool into a bounded queue (depth ``PREFETCH``), so host
data loading overlaps device compute (the jitted step releases the GIL) —
the TPU-side replacement of the torch DataLoader worker-process pool.

Multi-host: each process takes the ``jax.process_index()``-th slice of every
sampled batch (``indices[pi::pc]``), so TRAIN.BATCH_SIZE is the GLOBAL batch
and hosts read disjoint, deterministic index streams from the shared
seeded sampler.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

PREFETCH = 2

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
    """Iterable over padded batches with double-buffered prefetch and
    multi-host batch sharding."""

    def __init__(self, dataset, batch_sampler, point_budget, mask_budget=64,
                 num_workers=0, prefetch=PREFETCH, process_index=None,
                 process_count=None, sort_points=False,
                 host_plan_capacities=None, vgi_host=None,
                 audit_batches=2):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.point_budget = point_budget
        self.mask_budget = mask_budget
        self.sort_points = sort_points
        self.host_plan_capacities = host_plan_capacities
        self.vgi_host = vgi_host
        # capacity audit (collate ``_hp_*true_nums``) runs on the first
        # ``audit_batches`` batches of every epoch-iterator: enough for the
        # bench/dryrun self-audit and a per-run spot check, without paying
        # ~4 ms/sample/plan-set of 1-core host CPU in the steady state
        self.audit_batches = audit_batches
        if vgi_host is not None and "rng" not in vgi_host:
            # one stream per loader; batches are collated sequentially (the
            # threaded producer is single), so draws are deterministic given
            # the seed — host RNG like the reference's np.random VGI draws
            vgi_host = dict(vgi_host)
            vgi_host["rng"] = np.random.default_rng(
                int(vgi_host.get("seed", 0)))
            self.vgi_host = vgi_host
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.process_index = process_index
        self.process_count = process_count

    def _host_slice(self, indices):
        pi, pc = self.process_index, self.process_count
        if pi is None or pc is None:
            try:
                import jax

                pi = jax.process_index()
                pc = jax.process_count()
            except Exception:  # pragma: no cover - jax uninitialised
                pi, pc = 0, 1
        indices = np.asarray(indices)
        return indices[pi::pc] if pc > 1 else indices

    def _load_batch(self, indices, pool=None, audit=True):
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, indices))
        else:
            samples = [self.dataset[i] for i in indices]
        return collate_padded(samples, self.point_budget,
                              mask_budget=self.mask_budget,
                              sort_points=self.sort_points,
                              host_plan_capacities=self.host_plan_capacities,
                              vgi_host=self.vgi_host, audit=audit)

    def __iter__(self):
        if self.num_workers <= 0:
            for bi, indices in enumerate(self.batch_sampler):
                yield self._load_batch(self._host_slice(indices),
                                       audit=bi < self.audit_batches)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        sentinel = object()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for bi, indices in enumerate(self.batch_sampler):
                    batch = self._load_batch(self._host_slice(indices), pool,
                                             audit=bi < self.audit_batches)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    return
                except queue.Full:
                    continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    break
                yield batch
        finally:
            stop.set()

    def __len__(self):
        return len(self.batch_sampler)


def build_dataloader(cfg, mode="train", domain="source", start_iteration=0,
                     halve_batch_size=False, want_ema=None):
    """``want_ema=False`` builds a loader WITHOUT the EMA-teacher inputs
    (``ori_img`` / ``ori_coords`` / ``ema_map`` / the ``hp_ori_*`` plan set):
    the pre-EMA training phases never read them, yet producing them costs
    the 1-core host ~18 ms/sample (native ori plan build + dataset ori
    assembly) and +10.6 MB/step of wire. The train loop passes
    ``want_ema=iteration >= ema_start_iter`` and rebuilds the target loader
    at the phase switch (same mechanism as crash-resume). ``None`` keeps the
    config's behavior (eval loaders, bench's EMA stage)."""
    assert mode in ("train", "val", "test")
    dataset_cfg = cfg.get("DATASET_" + domain.upper())
    split = dataset_cfg[mode.upper()]
    is_train = mode == "train"
    batch_size = cfg.TRAIN.BATCH_SIZE if is_train else cfg.VAL.BATCH_SIZE
    if halve_batch_size:
        batch_size = batch_size // 2

    dataset_kwargs = dict(dataset_cfg.get(dataset_cfg.TYPE, {}))
    # dataset input format follows the 3D backbone (reference build.py:64)
    dataset_kwargs.setdefault("backbone", cfg.MODEL_3D.TYPE)
    # depth auxiliary labels: source-domain training only (the depth RMSE
    # hook reads data_batch_src, reference train_xmuda_mopa.py:405-410)
    if (bool(cfg.TRAIN.get("DEPTH_PRED", False)) and is_train
            and domain == "source"):
        dataset_kwargs["with_depth_label"] = True
    aug = dict(dataset_kwargs.pop("augmentation", {}))
    if is_train:
        dataset_kwargs.update(aug)
    if want_ema is False:
        # pre-EMA phases: no teacher inputs (``ema_input`` on the real
        # datasets, ``with_ema`` on the synthetic one)
        dataset_kwargs.pop("ema_input", None)
        dataset_kwargs.pop("with_ema", None)

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
    # train batches arrive voxel-key-sorted so device plan builds skip their
    # input sort (TPU.PRESORTED_POINTS); eval keeps dataset order for the
    # pseudo-label writer
    presort = is_train and bool(cfg.TPU.get("PRESORTED_POINTS", True)) \
        if "TPU" in cfg else is_train
    budget = point_budget_for(cfg, dataset_cfg.TYPE)
    # host-side C++ plan builds (overlapped with device compute) for the
    # voxel-table backbones in train mode
    host_caps = None
    if (presort and "TPU" in cfg and bool(cfg.TPU.get("HOST_PLANS", True))
            and "SalsaNext" not in cfg.MODEL_3D.TYPE):
        from mopa_tpu.models.scn_unet import capacity_schedule

        if "SPVCNN" in cfg.MODEL_3D.TYPE:
            from mopa_tpu.models.spvcnn import NUM_LEVELS as _nl
        else:
            _nl = int(cfg.MODEL_3D.SCN.num_planes)
        factors = tuple(cfg.TPU.get("CAP_FACTORS", ()))
        host_caps = capacity_schedule(budget, _nl, factors=factors or None)
    # host-side VGI (insert + occlusion + aug + cat plan in the loader, the
    # raw VGI inputs leave the wire) — target stream of MoPA train runs with
    # host plans on; data/vgi_host.py is the numpy twin of ops/mixmatch.py
    vgi_host = None
    if (host_caps is not None and domain == "target"
            and float(cfg.TRAIN.PC_MM.lambda_pc_mm) > 0
            and bool(cfg.TPU.get("HOST_VGI", True))):
        dkw = dataset_cfg.get(dataset_cfg.TYPE, {})
        vgi_host = {
            "pc_mm": cfg.TRAIN.PC_MM,
            "aug": dict(dkw.get("augmentation", {})),
            "scale": float(dkw.get("scale", 20)),
            "full_scale": int(dkw.get("full_scale", 4096)),
            "front_axis_x": ("SEMANTICKITTI" in dataset_cfg.TYPE.upper()
                             or dataset_cfg.TYPE == "SyntheticSCN"),
            "num_levels": len(host_caps),
            "factors": tuple(cfg.TPU.get("CAP_FACTORS", ())) or None,
            "seed": int(cfg.RNG_SEED) if cfg.RNG_SEED >= 0 else 0,
        }
    return DataLoader(dataset, sampler, budget,
                      mask_budget=mask_budget,
                      num_workers=cfg.DATALOADER.NUM_WORKERS,
                      sort_points=presort, host_plan_capacities=host_caps,
                      vgi_host=vgi_host)
