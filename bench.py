#!/usr/bin/env python
"""Headline benchmark: LiDAR scans/sec/chip for the full MoPA UDA train step.

Runs the complete jitted iteration — 2D UNetResNet34 + 3D sparse UNet on
source and target, cross-modal KL, pseudo-label CE, SAM mask consistency,
VGI insertion + third 3D forward, both optimizers — on synthetic scans with
SemanticKITTI-like shapes (A2D2->KITTI config geometry: batch 8, 16k-point
budget, 302x480 images, m=16 / 7-level sparse UNet), and prints JSON lines.

Robustness contract (round-3 postmortem: a cold compile cache ate the whole
measurement window and the bench died silently at rc=124):
  * the headline ``value`` is measured FIRST and a JSON line is printed the
    moment it exists; every later stage (e2e, EMA phase, FLOPs/MFU) re-prints
    the full updated line — consumers take the LAST JSON line;
  * SIGTERM/SIGINT (e.g. ``timeout``) print the current partial line before
    exiting, so the artifact is never empty;
  * each optional stage runs under a SIGALRM deadline (``BENCH_STAGE_BUDGET``
    seconds, default 420) — a hang in the input pipeline or a cold compile
    skips that stage instead of killing the bench;
  * ``BENCH_FAST=1`` skips the EMA variant and the cost-analysis lowering.

Measurement modes, both reported:
  * ``value``      — device-resident batches (pure step throughput).
  * ``value_e2e``  — batches stream through ``build_dataloader`` (synthetic
    dataset, threaded prefetch, configured NUM_WORKERS), so the host input
    pipeline is inside the measurement (reference ``data_time`` meter,
    ``mopa/train/train_xmuda_mopa.py:594-595``).

Honest-baseline note: the reference publishes NO throughput numbers anywhere
(SURVEY §6 / BASELINE.md) — ``baseline`` in the JSON is an ESTIMATE of the
reference's single-GPU rate implied by its training recipe, and
``vs_baseline`` divides by that estimate. ``mfu`` and ``flops_per_scan``
come from XLA's compiled cost analysis against the chip's advertised bf16
peak.
"""

import contextlib
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_GPU_SCANS_PER_SEC = 4.0  # ESTIMATE — see module docstring
# TPU v5e advertised bf16 peak (override with BENCH_PEAK_FLOPS for other chips)
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
STAGE_BUDGET = int(os.environ.get("BENCH_STAGE_BUDGET", 420))
FAST = bool(int(os.environ.get("BENCH_FAST", "0")))

RESULT = {
    "metric": "mopa_train_scans_per_sec_per_chip",
    "unit": "scans/s/chip",
    "partial": True,
    "stage": "startup",
}


def emit():
    print(json.dumps(RESULT), flush=True)


def _on_signal(signum, frame):
    RESULT["killed_by_signal"] = int(signum)
    emit()
    os._exit(0)


class StageTimeout(Exception):
    pass


@contextlib.contextmanager
def stage(name, budget=STAGE_BUDGET):
    """Run a bench stage under a SIGALRM deadline; on timeout, record the
    skip and continue (never die silently mid-stage)."""
    RESULT["stage"] = name

    def _alarm(signum, frame):
        raise StageTimeout(name)

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    t0 = time.time()
    try:
        yield
    except StageTimeout:
        RESULT.setdefault("skipped_stages", []).append(name)
    except Exception as e:  # a failed optional stage must not kill the bench
        RESULT.setdefault("failed_stages", {})[name] = repr(e)[:200]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        RESULT.setdefault("stage_secs", {})[name] = round(time.time() - t0, 1)
    emit()


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    import jax

    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import device_batch, device_prefetch

    c = cfg.clone()
    c.merge_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs/synthetic/mopa_smoke.yaml"))
    # production-scale shapes (A2D2->SemanticKITTI geometry)
    c.TRAIN.BATCH_SIZE = int(os.environ.get("BENCH_BATCH", 8))
    c.TPU.POINT_BUDGET = int(os.environ.get("BENCH_POINTS", 16384))
    c.TPU.COMPUTE_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
    c.MODEL_3D.SCN.m = 16
    c.MODEL_3D.SCN.num_planes = 7
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 24000
        d.image_size = (480, 302)
        d.length = 64
    c.DATALOADER.NUM_WORKERS = 4
    # enough sampler iterations for the e2e streaming measurement
    c.SCHEDULER.MAX_ITERATION = 100000

    # A/B lever: host-built voxel plans (smaller device step, bigger wire)
    # vs device-built plans (coords-only wire, ~75 ms/plan-set device cost)
    if "BENCH_HOST_PLANS" in os.environ:
        c.TPU.HOST_PLANS = bool(int(os.environ["BENCH_HOST_PLANS"]))

    RESULT["stage"] = "build"
    models, _ = trainer_mod.build_models(c, output_all=True)
    src_loader = build_dataloader(c, "train", "source")
    trg_loader = build_dataloader(c, "train", "target")
    src_host = next(iter(src_loader))
    trg_host = next(iter(trg_loader))
    # the pre-EMA step never reads the EMA-teacher keys; ship the stripped
    # wire batches it would see in training (train/common.py EMA_ONLY_KEYS)
    src = device_batch(src_host, strip_ema=True)
    trg = device_batch(trg_host, strip_ema=True)
    src_full = device_batch(src_host)
    trg_full = device_batch(trg_host)

    # wire bytes are known before any compile — record them up front
    wire_pre = sum(v.nbytes for v in src.values()) + \
        sum(v.nbytes for v in trg.values())
    wire_ema = sum(v.nbytes for v in src_full.values()) + \
        sum(v.nbytes for v in trg_full.values())
    RESULT["wire_mb_per_step_pre_ema"] = round(wire_pre / 1e6, 1)
    RESULT["wire_mb_per_step_ema_phase"] = round(wire_ema / 1e6, 1)
    RESULT["host_plans"] = bool(c.TPU.get("HOST_PLANS", True))
    RESULT["encoder"] = trainer_mod.encoder_provenance(c)
    RESULT["baseline"] = {
        "value": REF_GPU_SCANS_PER_SEC,
        "unit": "scans/s",
        "provenance": ("ESTIMATE of the reference single-GPU rate; the "
                       "reference publishes no throughput (SURVEY §6)"),
    }

    # capacity honesty: the round-2 headline was invalidated by silent voxel
    # overflow (BASELINE.md round 3) — record the worst per-sample per-level
    # occupancy of THIS measured batch so the number is self-auditing.
    # ``_hp_true_nums`` is the builder-independent TRUE unique count per
    # level (collate._true_level_nums); the builder's own ``hp_nums`` is
    # clamped at capacity and can never reveal overflow.
    caps = trainer_mod._capacities(c, c.TPU.POINT_BUDGET)
    occ_lvl = None
    for h in (src_host, trg_host):
        for key in ("_hp_true_nums", "_hp_ori_true_nums",
                    "_hp_cat_true_nums"):
            nums = h.get(key)
            if nums is None:
                continue
            # the host-VGI cat domain has its own (larger) capacity schedule
            kcaps = (h["_hp_cat_caps"] if key == "_hp_cat_true_nums"
                     else caps)
            nums = np.asarray(nums, np.float64)  # (S, L)
            o = np.max(nums / np.asarray(kcaps[:nums.shape[1]], np.float64),
                       axis=0)
            occ_lvl = o if occ_lvl is None else np.maximum(occ_lvl, o)
    if occ_lvl is not None:
        RESULT["voxel_occupancy_max"] = round(float(np.max(occ_lvl)), 4)
        RESULT["voxel_occupancy_per_level"] = [round(float(x), 3)
                                               for x in occ_lvl]
        RESULT["voxel_overflow"] = bool(np.max(occ_lvl) > 1.0)
    emit()

    RESULT["stage"] = "create_state"
    state = trainer_mod.create_train_state(c, models, src)

    # NOTE: on the axon backend block_until_ready resolves at schedule time,
    # not completion — a tiny scalar fetch is the only reliable execution
    # barrier. UNDONATED chained dispatches pay a per-hop carry cost (a
    # 32 MB-carry matmul chain reads 54.7 ms/hop when the matmul is 2.1 ms)
    # — but DONATION removes it entirely (the same chain donated: 2.36
    # ms/hop, equal to running the loop inside one dispatch), and the train
    # step donates its state, so the chained rate below IS the device rate.
    # BENCH_SCAN=1 cross-checks with n steps inside ONE dispatch (trainer
    # scan_steps mode); off by default because the remote compile helper
    # currently 500s on the looped full-step program (error recorded).
    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    use_scan = bool(int(os.environ.get("BENCH_SCAN", 0)))

    def measure(step, state, s, t):
        state, metrics = step(state, s, t)  # compile + warmup
        _ = float(np.asarray(metrics["total_loss"]))
        t0 = time.time()
        for _ in range(n_iters):
            state, metrics = step(state, s, t)
        _ = float(np.asarray(metrics["total_loss"]))
        return n_iters * c.TRAIN.BATCH_SIZE / (time.time() - t0), state

    # ---- stage 1: the headline number (no alarm — without it there is no
    # artifact at all; the signal handler still emits partials on SIGTERM)
    RESULT["stage"] = "value"
    step = trainer_mod.make_train_step(c, models, with_pl=True, with_ema=False)
    scans_per_sec, state = measure(step, state, src, trg)
    RESULT["value_dispatch_chained"] = round(scans_per_sec, 3)
    if use_scan:
        try:
            step_scan = trainer_mod.make_train_step(
                c, models, with_pl=True, with_ema=False, scan_steps=n_iters)
            state, metrics = step_scan(state, src, trg)  # compile + warm
            _ = float(np.asarray(metrics["total_loss"]))
            t0 = time.time()
            state, metrics = step_scan(state, src, trg)
            _ = float(np.asarray(metrics["total_loss"]))
            scans_per_sec = n_iters * c.TRAIN.BATCH_SIZE / (time.time() - t0)
            RESULT["value_provenance"] = (
                f"{n_iters} steps inside one dispatch (lax.fori_loop); "
                "device-resident rate free of per-dispatch tunnel overhead")
        except Exception as e:  # compile-service refusal: keep the artifact
            use_scan = False
            RESULT["value_scan_error"] = str(e).splitlines()[0][:200]
    RESULT["value"] = round(scans_per_sec, 3)
    RESULT["vs_baseline"] = round(scans_per_sec / REF_GPU_SCANS_PER_SEC, 3)
    emit()

    # ---- stage 2: e2e streaming (same compiled step; host pipeline inside
    # the measurement, watchdogged — a hung prefetch skips the stage)
    with stage("value_e2e"):
        # stream through the loaders the pre-EMA training phase actually
        # runs: want_ema=False skips producing the teacher inputs + ori plan
        # set on the host (train/common.py builds its loaders the same way)
        src_it = device_prefetch(
            build_dataloader(c, "train", "source", want_ema=False),
            strip_ema=True)
        trg_it = device_prefetch(
            build_dataloader(c, "train", "target", want_ema=False),
            strip_ema=True)
        state, metrics = step(state, next(src_it), next(trg_it))
        _ = float(np.asarray(metrics["total_loss"]))
        t0 = time.time()
        for _ in range(n_iters):
            state, metrics = step(state, next(src_it), next(trg_it))
        _ = float(np.asarray(metrics["total_loss"]))
        RESULT["value_e2e"] = round(
            n_iters * c.TRAIN.BATCH_SIZE / (time.time() - t0), 3)

    # ---- stage 3: EMA phase (reference iterations >= ema_start_iter: 2
    # extra teacher forwards + on-device refine + a second plan build; the
    # last 30-40k of the 100k-iteration recipe runs this step on FULL
    # batches incl. the teacher's unaugmented inputs)
    if not FAST:
        with stage("value_ema_phase"):
            # reuse the stage-1 executable: only the (small) teacher program
            # compiles here (the round-3 EMA monolith OOM-killed the remote
            # compile service)
            step_ema = trainer_mod.make_train_step(c, models, with_pl=True,
                                                   with_ema=True,
                                                   reuse_step=step)
            ema_scans_per_sec, state = measure(step_ema, state, src_full,
                                               trg_full)
            RESULT["value_ema_phase_dispatch_chained"] = round(
                ema_scans_per_sec, 3)
            if use_scan:
                # EMA step = teacher program + the SAME student step, run
                # serially (trainer.step_with_teacher). The student rate is
                # the scanned stage-1 number; the teacher program's outputs
                # are two small int16 label arrays, so chained teacher
                # dispatches are nearly carry-free — time it alone and add.
                from mopa_tpu.train.common import (EMA_ONLY_KEYS,
                                                   EMA_ONLY_PREFIX)
                teacher_in = {k: v for k, v in trg_full.items()
                              if k in EMA_ONLY_KEYS
                              or k.startswith(EMA_ONLY_PREFIX)}
                tj = step_ema.teacher_jit
                pl2, _ = tj(state, teacher_in)  # compile + warm
                _ = float(np.asarray(pl2[:1, :1]).ravel()[0])
                t0 = time.time()
                for _ in range(n_iters):
                    pl2, _ = tj(state, teacher_in)
                _ = float(np.asarray(pl2[:1, :1]).ravel()[0])
                t_teacher = (time.time() - t0) / n_iters
                RESULT["teacher_ms_per_step"] = round(t_teacher * 1e3, 1)
                b = c.TRAIN.BATCH_SIZE
                ema_scans_per_sec = b / (b / scans_per_sec + t_teacher)
            RESULT["value_ema_phase"] = round(ema_scans_per_sec, 3)
            # published recipe: ema_start_iter 60k of 100k iterations
            RESULT["value_weighted_100k"] = round(
                1.0 / (0.6 / scans_per_sec + 0.4 / ema_scans_per_sec), 3)

    # ---- stage 4: FLOPs / MFU from XLA's compiled cost analysis (the
    # persistent cache makes this a reload of the stage-1 executable)
    if not FAST:
        with stage("flops"):
            compiled = step.lower(state, src, trg).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops > 0:
                flops_per_scan = flops / c.TRAIN.BATCH_SIZE
                RESULT["flops_per_scan"] = round(flops_per_scan, 1)
                RESULT["mfu"] = round(
                    scans_per_sec * flops_per_scan / PEAK_FLOPS, 5)
                RESULT["mfu_peak_flops_assumed"] = PEAK_FLOPS

    RESULT["partial"] = False
    RESULT["stage"] = "done"
    emit()


if __name__ == "__main__":
    main()
