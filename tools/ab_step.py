#!/usr/bin/env python
"""In-process A/B split of the full MoPA train step at bench shapes.

Cross-process component timings on the tunneled chip vary up to +-30%
(BASELINE.md round-3 caveat), so profile_step.py's numbers are only
decision-grade WITHIN one process. This tool measures the handful of step
variants that matter for the round-4 perf question — where did the honest
capacity schedule put the time — back to back in ONE process:

    full    full MoPA step (identical program to bench.py stage 1)
    nosam   lambda_sam_cons = 0   (drops seg_logit_all + mask consistency)
    novgi   lambda_pc_mm = 0      (drops VGI insert + cat plan + 3rd domain)
    xmpl    both 0                (xMUDA + pseudo-label core)
    cat     jitted VGI insert + cat plan build alone (the in-step device
            plan build the host loader cannot precompute)

Usage:  python tools/ab_step.py [--probes full,nosam,novgi,xmpl,cat] [-n 10]
Each variant is a separate XLA program; first runs compile through the
remote service (persistent cache makes reruns warm).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from mopa_tpu.common.cache import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="full,nosam,novgi,xmpl,cat")
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()
    probes = args.probes.split(",")

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import device_batch

    c = cfg.clone()
    c.merge_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "../configs/synthetic/mopa_smoke.yaml"))
    c.TRAIN.BATCH_SIZE = int(os.environ.get("BENCH_BATCH", 8))
    c.TPU.POINT_BUDGET = int(os.environ.get("BENCH_POINTS", 16384))
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    c.MODEL_3D.SCN.m = 16
    c.MODEL_3D.SCN.num_planes = 7
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 24000
        d.image_size = (480, 302)
        d.length = 64
    c.DATALOADER.NUM_WORKERS = 0
    c.SCHEDULER.MAX_ITERATION = 100000

    src_host = next(iter(build_dataloader(c, "train", "source")))
    trg_host = next(iter(build_dataloader(c, "train", "target")))
    src = device_batch(src_host, strip_ema=True)
    trg = device_batch(trg_host, strip_ema=True)

    def run_step(step_fn, st, name):
        """Chained DONATED dispatches are clean on axon: donation removes
        the per-hop carry serialisation entirely (a donated 32 MB-carry
        matmul chain reads 2.36 ms/hop vs 54.7 undonated vs 2.1 with the
        loop inside the dispatch), and the train step donates its state.
        The in-dispatch scan_steps alternative is preferable in principle
        but the remote compile helper 500s on the looped step program."""
        st, m = step_fn(st, src, trg)
        _ = float(np.asarray(m["total_loss"]))
        t0 = time.time()
        for _ in range(args.n):
            st, m = step_fn(st, src, trg)
        _ = float(np.asarray(m["total_loss"]))
        print("{:30s} {:8.1f} ms".format(name, (time.time() - t0) / args.n
                                         * 1000), flush=True)

    def variant(name, **lam):
        ca = c.clone()
        for k, v in lam.items():
            setattr(ca.TRAIN.PC_MM, k, v)
        out_all = float(ca.TRAIN.PC_MM.lambda_sam_cons) > 0
        ma, _ = trainer_mod.build_models(ca, output_all=out_all)
        sa = trainer_mod.create_train_state(ca, ma, src)
        run_step(trainer_mod.make_train_step(ca, ma, with_pl=True,
                                             with_ema=False), sa, name)

    if "full" in probes:
        variant("step: full MoPA")
    if "pallas" in probes:
        # PALLAS_CONV=on vs the XLA wide path, in-process back to back.
        # Mosaic on this stack cannot lower table gathers (see
        # ops/sparse_conv_pallas.py) — report and continue if it refuses.
        try:
            cp = c.clone()
            cp.TPU.PALLAS_CONV = True
            ma, _ = trainer_mod.build_models(cp, output_all=True)
            sa = trainer_mod.create_train_state(cp, ma, src)
            run_step(trainer_mod.make_train_step(cp, ma, with_pl=True,
                                                 with_ema=False), sa,
                     "step: full MoPA (pallas conv)")
        except Exception as e:  # pragma: no cover - hardware-dependent
            print("pallas probe failed:", str(e).splitlines()[0], flush=True)
    if "nosam" in probes:
        variant("step: no sam", lambda_sam_cons=0.0)
    if "novgi" in probes:
        variant("step: no vgi", lambda_pc_mm=0.0)
    if "xmpl" in probes:
        variant("step: xm+pl only", lambda_pc_mm=0.0, lambda_sam_cons=0.0)

    if "cat" in probes:
        from mopa_tpu.models.scn_unet import build_unet_plan_batched
        from mopa_tpu.ops import mixmatch as vgi_ops
        from mopa_tpu.train.common import decode_batch
        from mopa_tpu.train.trainer import _capacities, _num_levels

        b = c.TRAIN.BATCH_SIZE

        def cat_plan(batch_trg, key):
            bt = decode_batch(batch_trg)
            cat = vgi_ops.vgi_insert_batch(c, bt, bt.get("pseudo_label_3d"),
                                           key)
            n_cat = cat["valid"].shape[0] // b
            plan = build_unet_plan_batched(
                cat["coords"].reshape(b, n_cat, 3),
                cat["valid"].reshape(b, n_cat), _num_levels(c),
                capacities=_capacities(c, n_cat),
                sample_domains=np.full(b, 2, np.int32))
            return plan.num_voxels

        def vgi_only(batch_trg, key):
            bt = decode_batch(batch_trg)
            cat = vgi_ops.vgi_insert_batch(c, bt, bt.get("pseudo_label_3d"),
                                           key)
            return jnp.sum(cat["valid"].astype(jnp.int32))

        for name, fn in [("vgi insert only", vgi_only),
                         ("vgi insert + cat plan", cat_plan)]:
            jf = jax.jit(fn)
            key = jax.random.PRNGKey(0)
            out = jax.block_until_ready(jf(trg, key))
            _ = np.asarray(out)
            t0 = time.time()
            for i in range(args.n):
                key = jax.random.fold_in(key, i)
                out = jf(trg, key)
            _ = np.asarray(out)  # scalar fetch barrier
            print("{:30s} {:8.1f} ms".format(name, (time.time() - t0)
                                             / args.n * 1000), flush=True)
        # what do the cat capacities actually hold? (honesty for any cap cut)
        cat_caps = _capacities(
            c, trg["ori_points"].shape[0] // b
            + int(np.prod(trg["obj_valid"].shape[1:])))
        print("cat caps:", cat_caps, flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
