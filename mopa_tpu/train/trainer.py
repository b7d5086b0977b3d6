"""Jitted xMUDA/MoPA training step and train state.

TPU-native re-design of the reference training loop
(``mopa/train/train_xmuda_mopa.py:104-684``). The reference runs, per
iteration, a host-orchestrated sequence of forwards/backwards with D2H round
trips; here the entire iteration — source step, target step, SAM consistency,
VGI insertion + forward, losses, both optimizers, EMA update — is ONE jitted,
donated function. Cross-modal terms use ``stop_gradient`` exactly where the
reference calls ``.detach()``, and the two per-model backwards collapse into
one joint gradient (the cross terms are stop-gradiented, so the joint grads
equal the reference's separate backwards).

Data parallelism: the step function is written per-shard and wrapped with
``jax.shard_map`` over a 1-D ``data`` mesh axis — gradients, metrics and
batch-norm statistics are ``pmean``-ed over ICI; parameters and optimizer
states are replicated. No other parallelism is needed for this model class
(see SURVEY §2.7).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from mopa_tpu.common.solver import build_optimizer
from mopa_tpu.models import losses as L
from mopa_tpu.models.build import build_model_2d, build_model_3d
from mopa_tpu.models.metric import confusion_matrix
from mopa_tpu.models.scn_unet import (HOST_PLAN_KEYS, build_unet_plan,
                                      build_unet_plan_batched, concat_plans,
                                      plan_from_host_arrays)
from mopa_tpu.ops import mixmatch as vgi_ops


class TrainState(NamedTuple):
    params_2d: Any
    batch_stats_2d: Any
    opt_2d: Any
    params_3d: Any
    batch_stats_3d: Any
    opt_3d: Any
    ema_params_2d: Any
    ema_params_3d: Any
    step: jax.Array
    rng: jax.Array


def _num_levels(cfg):
    if "SPVCNN" in cfg.MODEL_3D.TYPE:
        from mopa_tpu.models.spvcnn import NUM_LEVELS

        return NUM_LEVELS
    return int(cfg.MODEL_3D.SCN.num_planes)


def build_plan_from_batch(cfg, coords, batch_idx, valid_flat,
                          batch_domains=None, sample_size=None,
                          presorted=None):
    """Voxel plan for a flat (N, 3) batch. With ``sample_size`` (the static
    per-sample point budget), plans are built per sample with ONE batched
    (vmapped) sort per level — per-sample sorts stay VMEM-resident, an order
    of magnitude cheaper than the monolithic 14V-key merge sorts — and
    stitched into the same flat layout."""
    caps = _capacities(cfg, int(sample_size) if sample_size else
                       coords.shape[0])
    if sample_size is not None:
        s = coords.shape[0] // int(sample_size)
        doms = None
        if batch_domains is not None:
            doms = jnp.asarray(batch_domains, jnp.int32)[:s]
        if presorted is None:
            presorted = _presorted(cfg)
        return build_unet_plan_batched(
            coords.reshape(s, int(sample_size), 3),
            valid_flat.reshape(s, int(sample_size)), _num_levels(cfg),
            capacities=caps, sample_domains=doms, presorted=presorted)
    return build_unet_plan(coords, batch_idx, valid_flat, _num_levels(cfg),
                           capacities=caps, batch_domains=batch_domains)


def _presorted(cfg):
    """Train loaders emit voxel-key-sorted points (collate sort_points) so
    plan builds skip their input sort. Only valid for loader-delivered
    batches — device-computed point sets (the VGI cat batch) pass False."""
    return bool(cfg.TPU.get("PRESORTED_POINTS", True)) if "TPU" in cfg \
        else False


def _capacities(cfg, n_points):
    """Per-level capacities; TPU.CAP_FACTORS overrides the built-in
    LiDAR-measured schedule."""
    from mopa_tpu.models.scn_unet import capacity_schedule

    factors = tuple(cfg.TPU.get("CAP_FACTORS", ())) if "TPU" in cfg else ()
    return capacity_schedule(n_points, _num_levels(cfg),
                             factors=factors or None)


class Models(NamedTuple):
    model_2d: Any
    model_3d: Any
    tx_2d: Any
    tx_3d: Any


def build_models(cfg, output_all=None):
    model_2d, metric_2d = build_model_2d(cfg, output_all=output_all)
    model_3d, metric_3d = build_model_3d(cfg)
    optim_cfg = cfg.get("OPTIMIZER")
    tx_2d = build_optimizer(optim_cfg["MODEL_2D"], cfg)
    tx_3d = build_optimizer(optim_cfg["MODEL_3D"], cfg)
    return Models(model_2d, model_3d, tx_2d, tx_3d), (metric_2d, metric_3d)


def resolve_resnet34_weights(cfg) -> str:
    """Path of the pretrained resnet34 weights a run would load, or ''.

    Resolution order: ``TPU.RESNET34_WEIGHTS`` then ``MOPA_RESNET34_WEIGHTS``
    env var; either a converted ``.npz`` (tools/convert_resnet34.py) or a raw
    torchvision ``.pth``. Returns '' when nothing usable exists (encoder
    trains from scratch)."""
    import os as _os

    weights = ""
    if "TPU" in cfg and cfg.TPU.get("RESNET34_WEIGHTS", ""):
        weights = cfg.TPU.RESNET34_WEIGHTS
    weights = weights or _os.environ.get("MOPA_RESNET34_WEIGHTS", "")
    return weights if weights and _os.path.isfile(weights) else ""


def encoder_provenance(cfg) -> dict:
    """Self-report of the 2D-encoder initialisation for bench/dryrun JSON
    artifacts: every published reference mIoU assumes ImageNet pretraining
    (``/root/reference/mopa/models/resnet34_unet.py:92-94``), so artifacts
    must say which init they actually ran with."""
    requested = bool(cfg.MODEL_2D.get(cfg.MODEL_2D.TYPE, {}).get(
        "pretrained", True))
    weights = resolve_resnet34_weights(cfg) if requested else ""
    if not requested:
        kind = "scratch(pretrained=False)"
    elif not weights:
        kind = "scratch(no weights file)"
    elif weights.endswith(".npz"):
        kind = "imagenet(npz)"
    else:
        kind = "imagenet(torch_pth)"
    return {"encoder_init": kind, "weights_file": weights or None}


def create_train_state(cfg, models: Models, example_batch, seed=None):
    """Initialise parameters/optimizers from one example batch (host side)."""
    from mopa_tpu.train.common import decode_batch

    example_batch = decode_batch({k: jnp.asarray(v)
                                  for k, v in example_batch.items()
                                  if not k.startswith("_")})
    seed = cfg.RNG_SEED if seed is None else seed
    rng = jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)
    k2d, k3d, krest = jax.random.split(rng, 3)
    b, p = example_batch["img_indices"].shape[:2]

    vars_2d = models.model_2d.init(
        {"params": k2d, "dropout": k2d},
        jnp.asarray(example_batch["img"]),
        jnp.asarray(example_batch["img_indices"]),
        jnp.asarray(example_batch["point_valid"]), train=False)
    if "SalsaNext" in cfg.MODEL_3D.TYPE:
        vars_3d = models.model_3d.init(
            k3d, jnp.asarray(example_batch["feats"]), None, train=False,
            proj_in=jnp.asarray(example_batch["proj_in"]),
            proj_xy=jnp.asarray(example_batch["proj_xy"]))
    elif "hp_rankn" in example_batch:
        # loader-shipped host plans (coords may be stripped from the wire)
        plan = jax.jit(functools.partial(
            plan_from_host_arrays, capacities=_capacities(cfg, p),
            num_levels=_num_levels(cfg)))(
            {k: example_batch["hp_" + k] for k in HOST_PLAN_KEYS})
        vars_3d = models.model_3d.init(
            k3d, jnp.asarray(example_batch["feats"]), plan, train=False)
    else:
        plan = jax.jit(functools.partial(
            build_plan_from_batch, cfg,
            sample_size=example_batch["point_valid"].shape[1]))(
            example_batch["coords"], example_batch["batch_idx"],
            example_batch["point_valid"].reshape(-1))
        vars_3d = models.model_3d.init(
            k3d, jnp.asarray(example_batch["feats"]), plan, train=False)

    params_2d = vars_2d["params"]
    params_3d = vars_3d["params"]
    batch_stats_2d = vars_2d.get("batch_stats", {})

    # ImageNet-pretrained 2D encoder (reference resnet34_unet.py:92-94 trains
    # from torchvision resnet34(pretrained=True); every published mIoU
    # depends on it). Weights come from a torchvision state_dict on disk.
    if getattr(models.model_2d, "pretrained", False):
        import os as _os

        weights = resolve_resnet34_weights(cfg)
        if weights:
            from mopa_tpu.models.torch_compat import (load_resnet34_encoder,
                                                      unflatten_into)

            if weights.endswith(".npz"):
                # pre-converted flax-format arrays (tools/convert_resnet34.py)
                # — no torch needed at load time
                import numpy as _np

                z = _np.load(weights)
                p_flat = {k[len("params."):]: z[k] for k in z.files
                          if k.startswith("params.")}
                s_flat = {k[len("batch_stats."):]: z[k] for k in z.files
                          if k.startswith("batch_stats.")}
            else:
                import torch

                sd = torch.load(weights, map_location="cpu",
                                weights_only=False)
                if hasattr(sd, "state_dict"):
                    sd = sd.state_dict()
                p_flat, s_flat = load_resnet34_encoder(sd)
            params_2d = unflatten_into(params_2d, p_flat)
            batch_stats_2d = unflatten_into(batch_stats_2d, s_flat)
        elif jax.process_index() == 0:
            import logging

            logging.getLogger("mopa_tpu").warning(
                "MODEL_2D pretrained=True but no resnet34 weights file found "
                "(set TPU.RESNET34_WEIGHTS or MOPA_RESNET34_WEIGHTS); "
                "the 2D encoder trains from scratch.")

    return TrainState(
        params_2d=params_2d,
        batch_stats_2d=batch_stats_2d,
        opt_2d=models.tx_2d.init(params_2d),
        params_3d=params_3d,
        batch_stats_3d=vars_3d.get("batch_stats", {}),
        opt_3d=models.tx_3d.init(params_3d),
        # distinct buffers: the donated train step must never see the same
        # buffer twice (student and teacher start equal but separate)
        ema_params_2d=jax.tree_util.tree_map(jnp.copy, params_2d),
        ema_params_3d=jax.tree_util.tree_map(jnp.copy, params_3d),
        step=jnp.zeros((), jnp.int32),
        rng=krest,
    )


def _forward_2d(model, params, batch_stats, batch, rng, train, prefix=""):
    variables = {"params": params, "batch_stats": batch_stats}
    out, mutated = model.apply(
        variables,
        batch[prefix + "img"], batch[prefix + "img_indices"],
        batch[prefix + "point_valid"] if prefix + "point_valid" in batch
        else batch["point_valid"],
        train=train, rngs={"dropout": rng} if train else None,
        mutable=["batch_stats"] if train else [])
    return out, (mutated.get("batch_stats", batch_stats) if train else batch_stats)


def _forward_3d(model, params, batch_stats, feats, plan, train,
                proj_in=None, proj_xy=None, rng=None, plan_groups=None):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = {}
    if proj_in is not None:
        kwargs = {"proj_in": proj_in, "proj_xy": proj_xy}
    if plan_groups is not None:
        kwargs["plan_groups"] = plan_groups
    out, mutated = model.apply(variables, feats, plan, train=train,
                               mutable=["batch_stats"] if train else [],
                               rngs={"dropout": rng} if rng is not None
                               else None, **kwargs)
    return out, (mutated.get("batch_stats", batch_stats) if train else batch_stats)


def make_train_step(cfg, models: Models, *, with_pl: bool, with_ema: bool,
                    mesh=None, with_mopa: bool = True, reuse_step=None,
                    scan_steps=None):
    """Build the jitted per-iteration step for one training phase.

    ``scan_steps=n`` returns a program that runs n consecutive steps inside
    ONE dispatch (``lax.fori_loop`` over the step body; metrics of the last
    step returned). Measurement-only: on the axon tunnel each dispatch pays
    a per-hop link cost (rtt + carry serialisation), so per-step device time
    is only observable as (one n-step dispatch) / n. Single-device only.

    Static phase flags (trace-time): ``with_pl`` — pseudo-label CE on target;
    ``with_ema`` — regenerate pseudo-labels with the EMA teacher before the
    target step (reference :264-335); ``with_mopa`` — enable the MoPA-only
    SAM/VGI terms (the reference's train_xmuda/train_baseline never read
    TRAIN.PC_MM, so the xmuda/baseline variants pass False even when the
    merged config carries MoPA lambdas). xm/minent/sam/vgi come from cfg
    lambdas.

    The EMA phase is TWO device programs, not one monolith: a small
    forward-only TEACHER program (EMA 2D+3D forwards on the unaugmented
    inputs + on-device refinement -> int16 pseudo-labels) and the SAME train
    step the pre-EMA phase runs — the teacher labels are spliced into the
    target batch's ``pseudo_label_2d/3d`` slots between the two dispatches
    (device-resident, nothing crosses the wire). This caps peak compile
    memory at the pre-EMA program (the round-3 EMA monolith OOM-killed the
    compile service) and lets both phases share one compiled executable:
    pass the pre-EMA jitted step as ``reuse_step`` and only the teacher
    program compiles. The EMA decay itself is a runtime function of
    ``state.step`` (active from ``PC_MM.ema_start_iter``, matching the
    reference's lazy teacher init at train_xmuda_mopa.py:219-226), so the
    step program is phase-independent.
    """
    lam = cfg.TRAIN.XMUDA
    pc_mm = cfg.TRAIN.PC_MM
    dual_head = bool(cfg.MODEL_2D.DUAL_HEAD)
    num_classes = int(cfg.MODEL_2D.NUM_CLASSES)
    class_weights = (jnp.asarray(cfg.TRAIN.CLASS_WEIGHTS, jnp.float32)
                     if cfg.TRAIN.CLASS_WEIGHTS else None)
    pl_weights = class_weights if pc_mm.use_class_weights else None
    with_xm_src = lam.lambda_xm_src > 0
    with_xm_trg = lam.lambda_xm_trg > 0
    with_minent = lam.lambda_minent > 0
    with_sam = with_mopa and pc_mm.lambda_sam_cons > 0
    with_vgi = with_mopa and pc_mm.lambda_pc_mm > 0
    # depth auxiliary task (reference train hook at train_xmuda_mopa.py:405-410
    # / train_xmuda.py:259-264: RMSE on the dense source depth prediction)
    with_depth = bool(cfg.TRAIN.get("DEPTH_PRED", False))
    lambda_dp_src = (float(cfg.TRAIN.DEPTH_PRED_COE.lambda_dp_src)
                     if "DEPTH_PRED_COE" in cfg.TRAIN else 0.0)
    mask_budget = int(cfg.TPU.SAM_MASK_BUDGET)
    ema_alpha = float(pc_mm.ema_alpha_teacher)
    ema_xm_prob = float(pc_mm.ema_xm_prob)
    ema_period = max(int(pc_mm.ema_update_period), 1)
    ema_start = int(pc_mm.ema_start_iter)
    assert with_pl or not with_ema, "EMA teacher implies pseudo-label CE"
    is_range = "SalsaNext" in cfg.MODEL_3D.TYPE
    use_host_plans = bool(cfg.TPU.get("HOST_PLANS", True)) if "TPU" in cfg \
        else False
    use_pallas = (bool(cfg.TPU.get("PALLAS_CONV", False)) if "TPU" in cfg
                  else False) and not is_range and "SCN" in cfg.MODEL_3D.TYPE
    assert not (is_range and (with_vgi or with_ema)), \
        "VGI/EMA are SCN-backbone paths (reference MoPA trains SCN only)"
    n_dev = 1 if mesh is None else mesh.shape["data"]

    def pmean(x):
        if mesh is None:
            return x
        return jax.lax.pmean(x, axis_name="data")

    def ema_teacher_labels(state, batch_trg, rng):
        """EMA pseudo-label regeneration on unaugmented inputs
        (reference :264-335), fully on device.

        PARITY NOTE — teacher image inputs: the reference feeds each
        FULL-RESOLUTION uncropped ``ori_img`` one sample at a time
        (train_xmuda_mopa.py:267-274, bs=1 loops); here the teacher sees the
        batched fixed-size ``ori_img`` tensors the loader emits. For
        nuScenes the loader resize (400, 225) applies to ori images in both
        frameworks, so inputs are identical. For KITTI the reference's
        teacher sees the full ~1242x375 frame while the student crops to
        (480, 302); this rebuild feeds the teacher the same padded crop
        geometry — teacher logits at the cropped points differ only through
        2D context outside the crop (BN uses running stats in eval mode, so
        the difference is limited to conv receptive fields crossing the crop
        border, <=16 px after /16 padding). Documented in README parity
        notes; the ps-label refinement thresholds are per-class medians, so
        small logit shifts change labels only near the confidence cutoff."""
        b, p = batch_trg["ori_img_indices"].shape[:2]
        ori_valid = batch_trg["ori_point_valid"]
        if use_host_plans and "hp_ori_rankn" in batch_trg:
            plan = plan_from_host_arrays(
                {k: batch_trg["hp_ori_" + k] for k in HOST_PLAN_KEYS},
                _capacities(cfg, p), _num_levels(cfg))
        else:
            plan = build_plan_from_batch(cfg, batch_trg["ori_coords"],
                                         batch_trg["ori_batch_idx"],
                                         ori_valid.reshape(-1),
                                         sample_size=p)
        t2d = {"img": batch_trg["ori_img"],
               "img_indices": batch_trg["ori_img_indices"],
               "point_valid": ori_valid}
        out2d, _ = _forward_2d(models.model_2d, state.ema_params_2d,
                               state.batch_stats_2d, t2d, rng, train=False)
        out3d, _ = _forward_3d(models.model_3d, state.ema_params_3d,
                               state.batch_stats_3d, batch_trg["ori_feats"],
                               plan, train=False,
                               plan_groups=((b, tuple(_capacities(cfg, p))),)
                               if use_pallas else None)
        probs_2d = jax.nn.softmax(out2d["seg_logit"], axis=-1)
        probs_3d = jax.nn.softmax(out3d["seg_logit"], axis=-1)
        valid_flat = ori_valid.reshape(-1)

        rng_xm, rng_rest = jax.random.split(rng)
        use_xm = jax.random.uniform(rng_xm) <= ema_xm_prob
        # entropy-weighted 2D/3D fusion (reference :285-301)
        rv2 = 1.0 / (L.prob_2_entropy(probs_2d) + 1e-30)
        rv3 = 1.0 / (L.prob_2_entropy(probs_3d) + 1e-30)
        w2 = rv2 / (rv2 + rv3)
        probs_xm = w2 * probs_2d + (1.0 - w2) * probs_3d

        def refine(probs):
            from mopa_tpu.data.utils.refine_pseudo_labels import \
                refine_pseudo_labels_jax

            conf = jnp.max(probs, axis=-1)
            lab = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return refine_pseudo_labels_jax(conf, lab, valid_flat, num_classes)

        # lax.cond: the xm branch needs ONE refinement sort, the separate
        # branch two — never all three (each refine sorts B*P confidences)
        ps_2d, ps_3d = jax.lax.cond(
            use_xm,
            lambda _: (lambda ps: (ps, ps))(refine(probs_xm)),
            lambda _: (refine(probs_2d), refine(probs_3d)),
            None)

        # gather teacher labels onto the student (augmented) points
        emap = batch_trg["ema_map"]  # (B, P) index into this sample's ori pts
        base = jnp.arange(b, dtype=jnp.int32)[:, None] * p
        flat_map = jnp.where((emap >= 0) & (emap < p), emap + base, -1).reshape(-1)
        safe = jnp.clip(flat_map, 0, b * p - 1)
        pl2 = jnp.where(flat_map >= 0, ps_2d.reshape(-1)[safe], -100)
        pl3 = jnp.where(flat_map >= 0, ps_3d.reshape(-1)[safe], -100)
        return pl2, pl3

    def loss_and_metrics(params_2d, params_3d, state, batch_src, batch_trg,
                         cat, plan, pl_2d, pl_3d, rng):
        """One FUSED forward per modality: source+target images stack on the
        2D batch axis (D=2 domain batch norm); source+target+VGI point sets
        share ONE voxel plan / sparse-UNet pass (D=2/3 domain batch norm).
        Numerically identical to the reference's back-to-back forwards
        (train_xmuda_mopa.py:217-576) — per-domain BN stats, sequential
        running updates — but the plan is built once and every GEMM sees the
        full fused batch."""
        metrics = {}
        bs2d = state.batch_stats_2d
        bs3d = state.batch_stats_3d
        b, p = batch_src["img_indices"].shape[:2]
        npnt = b * p

        # ---------- fused 2D forward: [src; trg] ----------
        img_all = jnp.concatenate([batch_src["img"], batch_trg["img"]])
        idx_all = jnp.concatenate([batch_src["img_indices"],
                                   batch_trg["img_indices"]])
        pv_all = jnp.concatenate([batch_src["point_valid"],
                                  batch_trg["point_valid"]])
        out2d, mut2d = models.model_2d.apply(
            {"params": params_2d, "batch_stats": bs2d},
            img_all, idx_all, pv_all, train=True, n_domains=2,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        bs2d = mut2d["batch_stats"]
        src_2d = {k: v[:npnt] for k, v in out2d.items()
                  if k in ("seg_logit", "seg_logit2", "feats")}
        trg_2d = {k: v[npnt:2 * npnt] for k, v in out2d.items()
                  if k in ("seg_logit", "seg_logit2", "feats")}
        if "seg_logit_all" in out2d:
            trg_2d["seg_logit_all"] = out2d["seg_logit_all"][b:]

        # ---------- fused 3D forward: [src; trg; vgi-cat] ----------
        if is_range:
            # SalsaNext: back-to-back src/trg forwards (dense-BN semantics,
            # no voxel plan); VGI is SCN-only like the reference
            src_3d, bs3d = _forward_3d(
                models.model_3d, params_3d, bs3d, batch_src["feats"], None,
                train=True, proj_in=batch_src["proj_in"],
                proj_xy=batch_src["proj_xy"], rng=rng)
            trg_3d, bs3d = _forward_3d(
                models.model_3d, params_3d, bs3d, batch_trg["feats"], None,
                train=True, proj_in=batch_trg["proj_in"],
                proj_xy=batch_trg["proj_xy"], rng=rng)
            src_3d = dict(src_3d)
            trg_3d = dict(trg_3d)
            src_3d.pop("seg_logit_all", None)
            trg_3d.pop("seg_logit_all", None)
            cat_3d = None
        else:
            n_dom3 = 3 if cat is not None else 2
            feats_all = [batch_src["feats"], batch_trg["feats"]]
            if cat is not None:
                feats_all.append(cat["feats"])
            feats_all = jnp.concatenate(feats_all)
            groups3 = None
            if use_pallas:
                groups3 = ((2 * b, tuple(_capacities(cfg, p))),)
                if cat is not None:
                    n_cat = cat["valid"].shape[0] // b
                    groups3 += ((b, tuple(_capacities(cfg, n_cat))),)
            out3d, mut3d = models.model_3d.apply(
                {"params": params_3d, "batch_stats": bs3d},
                feats_all, plan, train=True, n_domains=n_dom3,
                rngs={"dropout": rng}, mutable=["batch_stats"],
                plan_groups=groups3)
            bs3d = mut3d["batch_stats"]
            src_3d = {k: v[:npnt] for k, v in out3d.items()}
            trg_3d = {k: v[npnt:2 * npnt] for k, v in out3d.items()}
            cat_3d = ({k: v[2 * npnt:] for k, v in out3d.items()}
                      if cat is not None else None)

        # ---------- source ----------
        src_valid = batch_src["point_valid"].reshape(-1)
        seg_label_src = batch_src["seg_label"]
        loss_src_2d = L.cross_entropy(src_2d["seg_logit"], seg_label_src,
                                      src_valid & (seg_label_src >= 0),
                                      class_weights)
        loss_src_3d = L.cross_entropy(src_3d["seg_logit"], seg_label_src,
                                      src_valid & (seg_label_src >= 0),
                                      class_weights)
        metrics["loss_src_2d"] = loss_src_2d
        metrics["loss_src_3d"] = loss_src_3d
        total = loss_src_2d + loss_src_3d

        if with_xm_src:
            s2 = src_2d["seg_logit2"] if dual_head else src_2d["seg_logit"]
            s3 = src_3d["seg_logit2"] if dual_head else src_3d["seg_logit"]
            xm_src_2d = L.xm_kl_div(s2, jax.lax.stop_gradient(src_3d["seg_logit"]),
                                    src_valid)
            xm_src_3d = L.xm_kl_div(s3, jax.lax.stop_gradient(src_2d["seg_logit"]),
                                    src_valid)
            metrics["xm_loss_src_2d"] = xm_src_2d
            metrics["xm_loss_src_3d"] = xm_src_3d
            total = total + lam.lambda_xm_src * (xm_src_2d + xm_src_3d)

        if with_depth:
            dp_src = out2d["depth_pred"][:b].astype(jnp.float32)
            depth_loss = jnp.sqrt(jnp.mean(jnp.square(
                dp_src - batch_src["depth_label"])))
            metrics["depth_pred_loss"] = depth_loss
            total = total + lambda_dp_src * depth_loss

        metrics["cm_src_2d"] = confusion_matrix(src_2d["seg_logit"],
                                                seg_label_src, src_valid,
                                                num_classes)
        metrics["cm_src_3d"] = confusion_matrix(src_3d["seg_logit"],
                                                seg_label_src, src_valid,
                                                num_classes)

        # ---------- target ----------
        trg_valid = batch_trg["point_valid"].reshape(-1)

        if with_xm_trg:
            t2 = trg_2d["seg_logit2"] if dual_head else trg_2d["seg_logit"]
            t3 = trg_3d["seg_logit2"] if dual_head else trg_3d["seg_logit"]
            xm_trg_2d = L.xm_kl_div(t2, jax.lax.stop_gradient(trg_3d["seg_logit"]),
                                    trg_valid)
            xm_trg_3d = L.xm_kl_div(t3, jax.lax.stop_gradient(trg_2d["seg_logit"]),
                                    trg_valid)
            metrics["xm_loss_trg_2d"] = xm_trg_2d
            metrics["xm_loss_trg_3d"] = xm_trg_3d
            total = total + lam.lambda_xm_trg * (xm_trg_2d + xm_trg_3d)

        if with_pl:
            pl_loss_2d = L.cross_entropy(trg_2d["seg_logit"], pl_2d,
                                         trg_valid & (pl_2d >= 0), pl_weights)
            pl_loss_3d = L.cross_entropy(trg_3d["seg_logit"], pl_3d,
                                         trg_valid & (pl_3d >= 0), pl_weights)
            metrics["pl_loss_trg_2d"] = pl_loss_2d
            metrics["pl_loss_trg_3d"] = pl_loss_3d
            total = total + lam.lambda_pl * (pl_loss_2d + pl_loss_3d)

        if with_minent:
            probs = jax.nn.softmax(trg_2d["seg_logit"], axis=-1)
            me = L.entropy_loss(probs, trg_valid)
            probs3 = jax.nn.softmax(trg_3d["seg_logit"], axis=-1)
            me3 = L.entropy_loss(probs3, trg_valid)
            metrics["minent_2d"] = me
            metrics["minent_3d"] = me3
            total = total + lam.lambda_minent * (me + me3)

        if with_sam:
            probs_all = jax.nn.softmax(trg_2d["seg_logit_all"], axis=-1)
            sam = L.mask_cons_loss(probs_all, batch_trg["sam_mask"],
                                   mask_budget, min_entropy=True)
            metrics["sam_cons_loss"] = sam
            total = total + pc_mm.lambda_sam_cons * sam

        if with_vgi:
            cat_mask = cat["valid"] & (cat["label"] >= 0)
            vgi_loss = L.cross_entropy(cat_3d["seg_logit"], cat["label"],
                                       cat_mask, pl_weights)
            obj_sel = cat["obj_mask"] & cat["valid"]
            obj_pred = jnp.argmax(cat_3d["seg_logit"], axis=-1)
            obj_acc = (jnp.sum((obj_pred == cat["label"]) & obj_sel)
                       / jnp.maximum(jnp.sum(obj_sel), 1))
            metrics["pc_mm_loss"] = vgi_loss
            metrics["pc_mm_acc"] = obj_acc
            metrics["vgi_inserted"] = jnp.sum(obj_sel.astype(jnp.int32))
            total = total + pc_mm.lambda_pc_mm * vgi_loss

        return total, (metrics, bs2d, bs3d)

    def train_step(state: TrainState, batch_src: Dict, batch_trg: Dict):
        # widen compact wire dtypes (uint8 images, int16 indices/labels) in
        # graph — only the compact bytes cross the host->device link
        from mopa_tpu.train.common import decode_batch

        batch_src = decode_batch(batch_src)
        batch_trg = decode_batch(batch_trg)
        # ema_rng is consumed by the separate teacher program (same split
        # structure — the two programs draw identical streams from state.rng)
        rng, step_rng, ema_rng, vgi_rng = jax.random.split(state.rng, 4)
        del ema_rng

        if with_pl or with_ema:
            # EMA phase: these slots hold the teacher program's output,
            # spliced in by the step wrapper below (reference :264-335)
            pl_2d = batch_trg["pseudo_label_2d"]
            pl_3d = batch_trg["pseudo_label_3d"]
        else:
            pl_2d = pl_3d = None

        # VGI transform and the fused voxel plan are pure functions of the
        # inputs (no parameter dependence) — hoisted out of the grad fn.
        # Preferred: the loader ran VGI on the HOST (data/vgi_host.py) and
        # shipped the cat arrays + hp_cat_* plan — the in-step insert + cat
        # plan build (~1/3 of the full MoPA step) disappears from the device.
        host_cat = with_vgi and "hp_cat_rankn" in batch_trg
        if host_cat:
            cat_valid = batch_trg["cat_valid"].reshape(-1)
            cat = {
                "valid": cat_valid,
                "label": batch_trg["cat_label"].reshape(-1).astype(jnp.int32),
                "obj_mask": batch_trg["cat_obj_mask"].reshape(-1),
                "feats": jnp.ones((cat_valid.shape[0], 1), jnp.float32),
                "inserted": batch_trg["vgi_inserted"],
            }
        else:
            cat = (vgi_ops.vgi_insert_batch(cfg, batch_trg, pl_3d, vgi_rng)
                   if with_vgi else None)
        if is_range:
            plan = None
        else:
            # per-sample batched plan builds (VMEM-resident sorts), stitched
            # into one fused multi-domain plan
            b, p = batch_src["img_indices"].shape[:2]
            st_doms = np.repeat(np.arange(2, dtype=np.int32), b)
            if use_host_plans and "hp_rankn" in batch_src \
                    and "hp_rankn" in batch_trg:
                # plans were built by the native loader on the host,
                # overlapped with the previous step's device compute
                # (voxel coords are stripped from the wire in this mode)
                arrs = {k: jnp.concatenate([batch_src["hp_" + k],
                                            batch_trg["hp_" + k]])
                        for k in HOST_PLAN_KEYS}
                plan = plan_from_host_arrays(arrs, _capacities(cfg, p),
                                             _num_levels(cfg),
                                             sample_domains=st_doms)
            else:
                st_coords = jnp.concatenate(
                    [batch_src["coords"], batch_trg["coords"]]).reshape(
                    2 * b, p, 3)
                st_valid = jnp.concatenate(
                    [batch_src["point_valid"].reshape(-1),
                     batch_trg["point_valid"].reshape(-1)]).reshape(2 * b, p)
                plan = build_unet_plan_batched(st_coords, st_valid,
                                               _num_levels(cfg),
                                               capacities=_capacities(cfg, p),
                                               sample_domains=st_doms,
                                               presorted=_presorted(cfg))
            if cat is not None:
                n_cat = cat["valid"].shape[0] // b
                if host_cat:
                    cat_plan = plan_from_host_arrays(
                        {k: batch_trg["hp_cat_" + k] for k in HOST_PLAN_KEYS},
                        _capacities(cfg, n_cat), _num_levels(cfg),
                        sample_domains=np.full(b, 2, np.int32))
                else:
                    cat_plan = build_unet_plan_batched(
                        cat["coords"].reshape(b, n_cat, 3),
                        cat["valid"].reshape(b, n_cat), _num_levels(cfg),
                        capacities=_capacities(cfg, n_cat),
                        sample_domains=np.full(b, 2, np.int32))
                plan = concat_plans([plan, cat_plan])

        grad_fn = jax.value_and_grad(loss_and_metrics, argnums=(0, 1),
                                     has_aux=True)
        (loss, (metrics, bs2d, bs3d)), (g2d, g3d) = grad_fn(
            state.params_2d, state.params_3d, state, batch_src, batch_trg,
            cat, plan, pl_2d, pl_3d, step_rng)

        g2d = pmean(g2d)
        g3d = pmean(g3d)
        bs2d = jax.tree_util.tree_map(pmean, bs2d)
        bs3d = jax.tree_util.tree_map(pmean, bs3d)
        def reduce_metric(v):
            if mesh is None:
                return v
            if jnp.issubdtype(v.dtype, jnp.integer):
                return jax.lax.psum(v, axis_name="data")
            return jax.lax.pmean(v, axis_name="data")

        metrics = {k: reduce_metric(v) for k, v in metrics.items()}
        metrics["total_loss"] = pmean(loss)

        upd_2d, opt_2d = models.tx_2d.update(g2d, state.opt_2d, state.params_2d)
        params_2d = optax.apply_updates(state.params_2d, upd_2d)
        upd_3d, opt_3d = models.tx_3d.update(g3d, state.opt_3d, state.params_3d)
        params_3d = optax.apply_updates(state.params_3d, upd_3d)

        # EMA decay is a RUNTIME function of state.step so one compiled step
        # serves both phases: before ema_start_iter the teacher tracks the
        # student exactly (decay 0 -> ema = params; the reference creates the
        # teacher lazily at ema_start_iter from the live model, :219-226);
        # from ema_start_iter it decays every ema_update_period steps.
        ema_active = state.step >= ema_start
        do_update = (state.step % ema_period) == 0
        decay = jnp.where(ema_active & do_update, ema_alpha,
                          jnp.where(ema_active, 1.0, 0.0))
        ema_2d = jax.tree_util.tree_map(
            lambda e, q: decay * e + (1.0 - decay) * q,
            state.ema_params_2d, params_2d)
        ema_3d = jax.tree_util.tree_map(
            lambda e, q: decay * e + (1.0 - decay) * q,
            state.ema_params_3d, params_3d)

        new_state = TrainState(
            params_2d=params_2d, batch_stats_2d=bs2d, opt_2d=opt_2d,
            params_3d=params_3d, batch_stats_3d=bs3d, opt_3d=opt_3d,
            ema_params_2d=ema_2d, ema_params_3d=ema_3d,
            step=state.step + 1, rng=rng)
        return new_state, metrics

    if reuse_step is not None:
        step_jit = reuse_step
    elif mesh is None:
        if scan_steps is not None and scan_steps > 1:
            n_scan = int(scan_steps)

            def scan_body(state, batch_src, batch_trg):
                st = jax.lax.fori_loop(
                    0, n_scan - 1,
                    lambda i, s: train_step(s, batch_src, batch_trg)[0],
                    state)
                return train_step(st, batch_src, batch_trg)

            step_jit = jax.jit(scan_body, donate_argnums=(0,))
        else:
            step_jit = jax.jit(train_step, donate_argnums=(0,))
    else:
        assert scan_steps is None, "scan_steps is a single-device mode"
        from jax import shard_map

        batch_specs = P("data")
        step_jit = jax.jit(
            shard_map(train_step, mesh=mesh,
                      in_specs=(P(), batch_specs, batch_specs),
                      out_specs=(P(), P()), check_vma=False),
            donate_argnums=(0,))
    if not with_ema:
        return step_jit

    # ---- EMA phase: small separate teacher program + the shared step ----
    def teacher_step(state, batch_trg):
        from mopa_tpu.train.common import decode_batch

        dec = decode_batch(batch_trg)
        _, _, ema_rng, _ = jax.random.split(state.rng, 4)
        pl2, pl3 = ema_teacher_labels(state, dec, ema_rng)
        # int16 matches the offline pseudo-label wire dtype, so the spliced
        # batch has the pre-EMA step's exact pytree signature (labels are
        # -100..num_classes; decode_batch widens in-graph)
        return pl2.astype(jnp.int16), pl3.astype(jnp.int16)

    if mesh is None:
        teacher_jit = jax.jit(teacher_step)
    else:
        from jax import shard_map

        teacher_jit = jax.jit(
            shard_map(teacher_step, mesh=mesh,
                      in_specs=(P(), P("data")),
                      out_specs=(P("data"), P("data")), check_vma=False))

    from mopa_tpu.train.common import EMA_ONLY_KEYS, EMA_ONLY_PREFIX

    def _is_ema_key(k):
        return k in EMA_ONLY_KEYS or k.startswith(EMA_ONLY_PREFIX)

    def step_with_teacher(state, batch_src, batch_trg):
        teacher_in = {k: v for k, v in batch_trg.items() if _is_ema_key(k)}
        pl2, pl3 = teacher_jit(state, teacher_in)
        trg = {k: v for k, v in batch_trg.items() if not _is_ema_key(k)}
        trg["pseudo_label_2d"] = pl2
        trg["pseudo_label_3d"] = pl3
        src = {k: v for k, v in batch_src.items() if not _is_ema_key(k)}
        return step_jit(state, src, trg)

    # expose the two device programs for measurement (bench.py times the
    # teacher dispatch separately from the scanned student step)
    step_with_teacher.teacher_jit = teacher_jit
    step_with_teacher.student_jit = step_jit
    return step_with_teacher


class CheckpointAdapter:
    """Bridges TrainState to the reference's two-stream .pth checkpoints.

    Stream '_2d' holds {model, optimizer, scheduler} of the 2D net; '_3d'
    likewise (reference CheckpointerV2 usage at train_xmuda_mopa.py:140-155).
    States are stored as flattened name->numpy dicts via torch_compat.
    """

    def __init__(self, which: str, get_state, set_state):
        assert which in ("2d", "3d")
        self.which = which
        self.get_state = get_state
        self.set_state = set_state

    def state_dict(self):
        from mopa_tpu.models.torch_compat import flatten_pytree

        state: TrainState = self.get_state()
        if self.which == "2d":
            return {
                "model": flatten_pytree({"params": state.params_2d,
                                         "batch_stats": state.batch_stats_2d}),
                "optimizer": flatten_pytree(state.opt_2d),
                "scheduler": {"last_epoch": int(state.step)},
                "ema": flatten_pytree(state.ema_params_2d),
            }
        return {
            "model": flatten_pytree({"params": state.params_3d,
                                     "batch_stats": state.batch_stats_3d}),
            "optimizer": flatten_pytree(state.opt_3d),
            "scheduler": {"last_epoch": int(state.step)},
            "ema": flatten_pytree(state.ema_params_3d),
        }

    def load_state_dict(self, ckpt, resume_states=True):
        from mopa_tpu.models.torch_compat import unflatten_into

        state: TrainState = self.get_state()
        updates = {}
        model = ckpt.get("model", {})
        if self.which == "2d":
            merged = unflatten_into({"params": state.params_2d,
                                     "batch_stats": state.batch_stats_2d}, model)
            updates["params_2d"] = merged["params"]
            updates["batch_stats_2d"] = merged["batch_stats"]
            if "ema" in ckpt and resume_states:
                updates["ema_params_2d"] = unflatten_into(state.ema_params_2d,
                                                          ckpt["ema"])
            if "optimizer" in ckpt and resume_states:
                updates["opt_2d"] = unflatten_into(state.opt_2d, ckpt["optimizer"])
        else:
            merged = unflatten_into({"params": state.params_3d,
                                     "batch_stats": state.batch_stats_3d}, model)
            updates["params_3d"] = merged["params"]
            updates["batch_stats_3d"] = merged["batch_stats"]
            if "ema" in ckpt and resume_states:
                updates["ema_params_3d"] = unflatten_into(state.ema_params_3d,
                                                          ckpt["ema"])
            if "optimizer" in ckpt and resume_states:
                updates["opt_3d"] = unflatten_into(state.opt_3d, ckpt["optimizer"])
        if "iteration" in ckpt:
            updates["step"] = jnp.asarray(ckpt["iteration"], jnp.int32)
        self.set_state(state._replace(**updates))
        return {k: v for k, v in ckpt.items()
                if k not in ("model", "optimizer", "scheduler", "ema")}
