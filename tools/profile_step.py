#!/usr/bin/env python
"""Break down the MoPA train-step cost on the TPU.

Methodology note: on the axon backend ``block_until_ready`` resolves at
schedule time, so every measurement chains each iteration's input on the
previous iteration's output and ends with a tiny scalar fetch — the only
reliable execution barrier.

CAVEAT (round 5): chained dispatches additionally pay a per-hop tunnel cost
that grows with the carry size (~2 ms/MB; even small carries pay the ~1 ms
rtt), so the ABSOLUTE times printed here are upper bounds inflated by the
harness — the 2D fwd+bwd recorded 90 ms here measures 45 ms with the loop
inside one dispatch. Decision-grade numbers come from tools/ab_step.py
(scan_steps mode) and tools/{conv2d,pallas_conv}_micro.py (lax.fori_loop
probes); this tool remains useful for RELATIVE in-process comparisons of
small-carry probes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.common.cache import enable_compile_cache

enable_compile_cache()


def chained(fn, feedback, seed_args, n=10, name=""):
    """fn(*args) -> out; feedback(out, args) -> new args (data dependency)."""
    args = seed_args
    out = fn(*args)
    args = feedback(out, args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        args = feedback(out, args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / n
    print("{:35s} {:8.1f} ms".format(name, dt * 1000), flush=True)
    return dt


def main():
    from mopa_tpu.config.xmuda import cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import decode_batch, device_batch

    c = cfg.clone()
    c.merge_from_file("configs/synthetic/mopa_smoke.yaml")
    c.TRAIN.BATCH_SIZE = 8
    c.TPU.POINT_BUDGET = 16384
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    c.MODEL_3D.SCN.m = 16
    c.MODEL_3D.SCN.num_planes = 7
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 24000
        d.image_size = (480, 302)
        d.length = 8
    c.DATALOADER.NUM_WORKERS = 4

    models, _ = trainer_mod.build_models(c, output_all=True)
    # component probes index batch arrays directly -> decode the wire
    # dtypes up front (the full-step probes ship wire batches as in training)
    src_wire = device_batch(next(iter(build_dataloader(c, "train", "source"))))
    trg_wire = device_batch(next(iter(build_dataloader(c, "train", "target"))))
    src = jax.jit(decode_batch)(src_wire)
    trg = jax.jit(decode_batch)(trg_wire)
    state = trainer_mod.create_train_state(c, models, src)

    # 1. plan build, chained through coords
    plan_fn = jax.jit(lambda coords, bidx, v: trainer_mod.build_plan_from_batch(
        c, coords, bidx, v, sample_size=c.TPU.POINT_BUDGET))

    def plan_feedback(plan, args):
        coords, bidx, v = args
        bump = (plan.num_voxels[0] * 0).astype(jnp.int32)
        return (coords + bump, bidx, v)

    # coords may be stripped from the wire when host plans ship; rebuild a
    # device copy for the plan-build probe
    if "coords" not in src:
        src_raw = next(iter(build_dataloader(c, "train", "source")))
        src = dict(src, coords=jnp.asarray(src_raw["coords"]).astype(jnp.int32))

    chained(plan_fn, plan_feedback,
            (src["coords"], src["batch_idx"], src["point_valid"].reshape(-1)),
            name="plan build (7 levels)")

    plan = plan_fn(src["coords"], src["batch_idx"],
                   src["point_valid"].reshape(-1))

    # 1b. host-plan wire decode (nibble unpack + fixup scatter + cumsums)
    if "hp_rankn" in src_wire:
        from mopa_tpu.models.scn_unet import HOST_PLAN_KEYS, plan_from_host_arrays
        from mopa_tpu.train.trainer import _capacities, _num_levels

        hp_arrs = {k: src_wire["hp_" + k] for k in HOST_PLAN_KEYS}
        dec_fn = jax.jit(lambda arrs: plan_from_host_arrays(
            arrs, _capacities(c, c.TPU.POINT_BUDGET), _num_levels(c)))

        def dec_feedback(plan, args):
            bump = (plan.num_voxels[0] * 0).astype(jnp.int32)
            (arrs,) = args
            return (dict(arrs, nums=arrs["nums"] + bump.astype(arrs["nums"].dtype)),)

        chained(dec_fn, dec_feedback, (hp_arrs,), name="host-plan wire decode")

    # 1c. stem point->voxel pooling (colliding scatter-add — candidate for
    # a sorted segment-sum if this shows up hot)
    from mopa_tpu.ops import voxel as voxel_ops

    cap0 = plan.levels[0].valid.shape[0]
    pool_fn = jax.jit(lambda f: voxel_ops.pool_features(
        f, plan.point_inverse, plan.point_counts, cap0))
    chained(pool_fn, lambda out, args: (args[0] + 0 * out[:1, :1].sum(),),
            (src["feats"],), name="stem pool (scatter-add)")

    # 2. 3D forward, chained through feats
    fwd3d = jax.jit(lambda feats: models.model_3d.apply(
        {"params": state.params_3d, "batch_stats": state.batch_stats_3d},
        feats, plan, train=False)["seg_logit"])
    chained(fwd3d, lambda out, args: (args[0] + 0 * out[:1, :1].sum(),),
            (src["feats"],), name="3D forward")

    # 3b. 3D fwd+bwd wrt the 3D parameters (the training-path cost)
    def loss3d(params):
        out = models.model_3d.apply(
            {"params": params, "batch_stats": state.batch_stats_3d},
            src["feats"], plan, train=False)
        return jnp.sum(out["seg_logit"].astype(jnp.float32) ** 2)

    def g3d_feedback(out, args):
        (params,) = args
        bump = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0
        flat, treedef = jax.tree_util.tree_flatten(params)
        flat = [flat[0] + bump.astype(flat[0].dtype)] + flat[1:]
        return (jax.tree_util.tree_unflatten(treedef, flat),)

    g3d = jax.jit(jax.grad(loss3d))
    chained(g3d, g3d_feedback, (state.params_3d,),
            name="3D fwd+bwd (wrt params)")

    # 3. 2D forward, chained through img
    fwd2d = jax.jit(lambda img: models.model_2d.apply(
        {"params": state.params_2d, "batch_stats": state.batch_stats_2d},
        img, src["img_indices"], src["point_valid"], train=False)["seg_logit"])
    chained(fwd2d, lambda out, args: (args[0] + 0 * out[0, 0],),
            (src["img"],), name="2D forward")

    # 4. 2D fwd+bwd
    def loss2d(img):
        out = models.model_2d.apply(
            {"params": state.params_2d, "batch_stats": state.batch_stats_2d},
            img, src["img_indices"], src["point_valid"], train=False)
        return jnp.sum(out["seg_logit"].astype(jnp.float32) ** 2)

    g2d = jax.jit(jax.grad(loss2d))
    chained(g2d, lambda out, args: (args[0] + 0 * out[0, 0, 0],),
            (src["img"],), name="2D fwd+bwd (wrt img)")

    # 5. VGI transform, chained through points (skipped when the loader
    # strips EMA inputs pre-EMA — round-5 `want_ema=False` wire — or runs
    # VGI host-side)
    if "ori_points" in trg:
        from mopa_tpu.ops import mixmatch

        vgi_fn = jax.jit(lambda pts, key: mixmatch.vgi_insert_batch(
            c, dict(trg, ori_points=pts), None, key))

        def vgi_feedback(out, args):
            pts, key = args
            return (pts + 0 * out["inserted"][0].astype(jnp.float32), key)

        chained(vgi_fn, vgi_feedback,
                (trg["ori_points"], jax.random.PRNGKey(0)),
                name="VGI transform")

    # 6. full steps (state chaining is inherent)
    def run_step(step_fn, st, n=10, name=""):
        st, m = step_fn(st, src_wire, trg_wire)
        _ = float(np.asarray(m["total_loss"]))
        t0 = time.time()
        for _ in range(n):
            st, m = step_fn(st, src_wire, trg_wire)
        _ = float(np.asarray(m["total_loss"]))
        print("{:35s} {:8.1f} ms".format(name, (time.time() - t0) / n * 1000),
              flush=True)

    def ablated_step(name, **lam):
        ca = c.clone()
        for k, v in lam.items():
            setattr(ca.TRAIN.PC_MM, k, v)
        out_all = any("sam" in k and v > 0 for k, v in lam.items()) or \
            float(ca.TRAIN.PC_MM.lambda_sam_cons) > 0
        ma, _ = trainer_mod.build_models(ca, output_all=out_all)
        sa = trainer_mod.create_train_state(ca, ma, src)
        run_step(trainer_mod.make_train_step(ca, ma, with_pl=True,
                                             with_ema=False), sa, name=name)

    ablated_step("step: xm+pl (no vgi/sam)",
                 lambda_pc_mm=0.0, lambda_sam_cons=0.0)
    ablated_step("step: xm+pl+vgi (no sam)", lambda_sam_cons=0.0)
    ablated_step("step: xm+pl+sam (no vgi)", lambda_pc_mm=0.0)

    step = trainer_mod.make_train_step(c, models, with_pl=True, with_ema=False)
    run_step(step, state, name="step: full MoPA")

    # 7. EMA-phase step on full batches (teacher refresh + ori plan decode)
    src_full = device_batch(next(iter(build_dataloader(c, "train", "source"))))
    trg_full = device_batch(next(iter(build_dataloader(c, "train", "target"))))

    def run_step_full(step_fn, st, n=10, name=""):
        st, m = step_fn(st, src_full, trg_full)
        _ = float(np.asarray(m["total_loss"]))
        t0 = time.time()
        for _ in range(n):
            st, m = step_fn(st, src_full, trg_full)
        _ = float(np.asarray(m["total_loss"]))
        print("{:35s} {:8.1f} ms".format(name, (time.time() - t0) / n * 1000),
              flush=True)

    step_ema = trainer_mod.make_train_step(c, models, with_pl=True,
                                           with_ema=True, reuse_step=step)
    run_step_full(step_ema, state, name="step: full MoPA + EMA")


if __name__ == "__main__":
    main()
