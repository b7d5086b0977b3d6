#!/usr/bin/env python
"""One-command parity harness against the reference's released checkpoints.

The reference's reproducibility path is "validate against our released .pth"
(``/root/reference/README.md:107-119``, eval CLI ``mopa/test/test.py:59-124``).
This harness is the rebuild's analogue:

  python tools/parity_check.py --cfg configs/a2d2_semantic_kitti/xmuda.yaml \
      --ckpt2d <released 2d .pth> --ckpt3d <released 3d .pth> \
      [--scan golden.npz] [--save-golden out.npz]

Modes
-----
* ``--scan golden.npz``: evaluate the imported checkpoints on a RECORDED
  input scan; report per-point logit deltas vs the stored reference logits
  (when the npz carries them) plus per-head mIoU. This needs no datasets on
  disk — one golden file is enough to pin numerical parity forever.
* without ``--scan``: pull the first TEST batch of the configured target
  dataset (real data must be preprocessed on disk) and evaluate that.
* ``--save-golden out.npz``: record the evaluated input + THIS framework's
  logits as a golden file so later rounds regression-test numerical drift.

Golden npz fields (single scan): ``coords`` (N,3 int32 — post
augment_and_scale_3d voxel coords), ``feats`` (N,Cin f32), ``img`` (H,W,3 f32,
normalized), ``img_indices`` (N,2 int32), optional ``seg_label`` (N,) int,
optional ``ref_logit_2d`` / ``ref_logit_3d`` ((N,C) f32) — per-point logits
produced by the REFERENCE torch implementation on the same scan (record them
with ``mopa/test/test.py`` instrumented to dump ``seg_logit``).

The import machinery itself (torch name mapping -> flax pytrees) is
covered in CI by ``tests/test_parity_check.py`` with a synthetic
reference-format state_dict, so the harness stays green without assets.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_reference_pth(path):
    """Load a reference ``.pth`` checkpoint into a flat name->numpy dict.

    Accepts the reference Checkpointer layout ``{"model": state_dict, ...}``
    (``mopa/common/utils/checkpoint.py:39-58``) or a bare state_dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in sd.items() if not k.endswith("num_batches_tracked")}


def is_torch_style(sd):
    """True when the dict uses reference/torch parameter names."""
    return any(k.endswith(".weight") or k.endswith(".running_mean")
               for k in sd)


def import_checkpoints(cfg, state, sd2d, sd3d):
    """Import reference-format (or our-format) state dicts into TrainState."""
    from mopa_tpu.models.torch_compat import (import_reference_2d,
                                              import_reference_3d,
                                              unflatten_into)

    dual = bool(cfg.MODEL_2D.DUAL_HEAD)
    if sd2d is not None:
        if is_torch_style(sd2d):
            p, s = import_reference_2d(sd2d, dual_head=dual)
        else:  # our flat format: {"params.<name>", "batch_stats.<name>"}
            p = {k[len("params."):]: v for k, v in sd2d.items()
                 if k.startswith("params.")}
            s = {k[len("batch_stats."):]: v for k, v in sd2d.items()
                 if k.startswith("batch_stats.")}
        state = state._replace(
            params_2d=unflatten_into(state.params_2d, p),
            batch_stats_2d=unflatten_into(state.batch_stats_2d, s))
    if sd3d is not None:
        if is_torch_style(sd3d):
            p, s = import_reference_3d(
                sd3d, m=cfg.MODEL_3D.SCN.m,
                num_planes=cfg.MODEL_3D.SCN.num_planes,
                dual_head=bool(cfg.MODEL_3D.DUAL_HEAD))
        else:
            p = {k[len("params."):]: v for k, v in sd3d.items()
                 if k.startswith("params.")}
            s = {k[len("batch_stats."):]: v for k, v in sd3d.items()
                 if k.startswith("batch_stats.")}
        state = state._replace(
            params_3d=unflatten_into(state.params_3d, p),
            batch_stats_3d=unflatten_into(state.batch_stats_3d, s))
    return state


def batch_from_golden(cfg, npz):
    """Build a single-sample padded device batch from a golden npz."""
    coords = np.asarray(npz["coords"], np.int32)
    n = coords.shape[0]
    p = int(cfg.TPU.POINT_BUDGET)
    if n > p:
        raise ValueError(
            "golden scan has {} points > TPU.POINT_BUDGET {} — raise the "
            "budget via CLI opts".format(n, p))
    feats = np.asarray(npz["feats"], np.float32)
    img = np.asarray(npz["img"], np.float32)

    def pad(a, fill=0):
        out = np.full((p,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    batch = {
        "coords": pad(coords),
        "batch_idx": np.zeros(p, np.int32),
        "feats": pad(feats),
        "img": img[None],
        "img_indices": pad(np.asarray(npz["img_indices"], np.int32))[None],
        "point_valid": (np.arange(p) < n)[None],
        "seg_label": pad(np.asarray(npz["seg_label"], np.int64), -100)
        if "seg_label" in npz else np.full(p, -100, np.int64),
    }
    return batch, n


def batch_from_dataset(cfg):
    """First TEST batch of the configured target dataset (real data on disk)."""
    from mopa_tpu.data.build import build_dataloader

    loader = build_dataloader(cfg, mode="test", domain="target")
    batch = next(iter(loader))
    batch.pop("_meta", None)
    n = int(np.asarray(batch["point_valid"]).sum())
    return batch, n


def eval_logits(cfg, models, state, batch):
    """Per-point (pre-softmax) logits from both heads, eval mode."""
    import jax
    import jax.numpy as jnp

    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import decode_batch, device_batch

    dev = device_batch(batch)

    @jax.jit
    def fwd(state, b):
        b = decode_batch(b)
        valid = b["point_valid"].reshape(-1)
        out2d, _ = trainer_mod._forward_2d(
            models.model_2d, state.params_2d, state.batch_stats_2d, b,
            None, train=False)
        plan = trainer_mod.build_plan_from_batch(
            cfg, b["coords"], b["batch_idx"], valid,
            sample_size=b["point_valid"].shape[1])
        out3d, _ = trainer_mod._forward_3d(
            models.model_3d, state.params_3d, state.batch_stats_3d,
            b["feats"], plan, train=False)
        return (jnp.asarray(out2d["seg_logit"], jnp.float32),
                jnp.asarray(out3d["seg_logit"], jnp.float32))

    l2, l3 = fwd(state, dev)
    return np.asarray(l2), np.asarray(l3)


def miou_from_logits(logits, labels, num_classes):
    """Per-head mIoU over labeled points (confusion-matrix IoU)."""
    pred = logits.argmax(-1)
    keep = labels >= 0
    if not keep.any():
        return None
    cm = np.bincount(num_classes * labels[keep] + pred[keep],
                     minlength=num_classes * num_classes
                     ).reshape(num_classes, num_classes)
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    ious = inter[union > 0] / union[union > 0]
    return float(ious.mean()) if ious.size else None


def run_parity(cfg, sd2d, sd3d, golden=None, save_golden=None):
    """Core harness; returns the report dict (also used by CI tests)."""
    from mopa_tpu.train import trainer as trainer_mod

    models, _ = trainer_mod.build_models(cfg, output_all=False)
    if golden is not None:
        batch, n = batch_from_golden(cfg, golden)
    else:
        batch, n = batch_from_dataset(cfg)
    state = trainer_mod.create_train_state(cfg, models, batch)
    state = import_checkpoints(cfg, state, sd2d, sd3d)

    logit_2d, logit_3d = eval_logits(cfg, models, state, batch)
    logit_2d, logit_3d = logit_2d[:n], logit_3d[:n]
    labels = np.asarray(batch["seg_label"]).reshape(-1)[:n]

    ncls = int(cfg.MODEL_2D.NUM_CLASSES)
    report = {
        "n_points": int(n),
        "miou_2d": miou_from_logits(logit_2d, labels, ncls),
        "miou_3d": miou_from_logits(logit_3d, labels, ncls),
        "miou_xm": miou_from_logits(
            _softmax(logit_2d) + _softmax(logit_3d), labels, ncls),
    }
    # capacity audit of the evaluated scan: the CAP_FACTORS schedule was
    # derived from synthetic dedup curves; check it against THIS (real or
    # golden) scan's true curve (mopa_tpu/data/capacity_audit.py)
    from mopa_tpu.data.capacity_audit import coords_occupancy
    from mopa_tpu.train.trainer import _num_levels

    occ = coords_occupancy(
        np.asarray(batch["coords"]).reshape(-1, 3)[:n],
        point_budget=int(cfg.TPU.POINT_BUDGET),
        cap_factors=tuple(cfg.TPU.CAP_FACTORS) if cfg.TPU.CAP_FACTORS
        else None, num_levels=_num_levels(cfg))
    report["voxel_occupancy_per_level"] = [round(float(x), 4) for x in occ]
    report["voxel_overflow"] = bool(occ.max() > 1.0)
    for name, ours in (("2d", logit_2d), ("3d", logit_3d)):
        key = "ref_logit_" + name
        if golden is not None and key in golden:
            ref = np.asarray(golden[key], np.float32)[:n]
            delta = np.abs(ours - ref)
            report["logit_delta_max_" + name] = float(delta.max())
            report["logit_delta_mean_" + name] = float(delta.mean())
            report["argmax_agreement_" + name] = float(
                (ours.argmax(-1) == ref.argmax(-1)).mean())
    if save_golden:
        out = {"coords": np.asarray(batch["coords"])[:n],
               "feats": np.asarray(batch["feats"])[:n],
               "img": np.asarray(batch["img"])[0],
               "img_indices": np.asarray(batch["img_indices"])[0, :n],
               "seg_label": labels,
               "ref_logit_2d": logit_2d, "ref_logit_3d": logit_3d}
        np.savez_compressed(save_golden, **out)
        report["golden_saved"] = save_golden
    return report


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt2d", default=None, help="reference 2D .pth")
    ap.add_argument("--ckpt3d", default=None, help="reference 3D .pth")
    ap.add_argument("--scan", default=None, help="golden input npz")
    ap.add_argument("--save-golden", default=None)
    ap.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = ap.parse_args()

    from mopa_tpu.config.xmuda import cfg as base_cfg

    cfg = base_cfg.clone()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)

    sd2d = load_reference_pth(args.ckpt2d) if args.ckpt2d else None
    sd3d = load_reference_pth(args.ckpt3d) if args.ckpt3d else None
    golden = np.load(args.scan) if args.scan else None
    report = run_parity(cfg, sd2d, sd3d, golden=golden,
                        save_golden=args.save_golden)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
