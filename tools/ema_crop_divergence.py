#!/usr/bin/env python
"""Quantify the EMA-teacher full-frame-vs-crop divergence (parity note).

The reference's EMA teacher consumes the FULL KITTI frame (~1242x375,
``mopa/train/train_xmuda_mopa.py:267-274`` feeds ``ori_img`` at native size),
while this rebuild's static-shape pipeline feeds the teacher the student's
bottom-crop window (``train/trainer.py`` EMA path). The crop cannot change
resolution (it is a crop, not a resize) and the teacher runs in eval mode
(running BN stats — no batch-statistics dependence), so the only divergence
mechanism is receptive-field truncation near the crop border.

This experiment measures it on the learnable synthetic task:

1. train Net2DSeg supervised for ``EMA_DIV_ITERS`` iterations on full frames;
2. on fresh scans, compute teacher per-point pseudo-labels twice — from the
   full frame, and from a centred bottom-crop containing the same points;
3. report the label-flip rate and mean |prob| delta over those points, split
   by distance to the crop border.

Run:   python tools/ema_crop_divergence.py           (TPU, minutes)
       JAX_PLATFORMS=cpu python tools/ema_crop_divergence.py  (CPU, slower)

Prints one JSON line; the headline number goes into README parity notes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

FULL_W, FULL_H = 256, 192
CROP_W, CROP_H = 160, 128


def main():
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from mopa_tpu.data.synthetic import SyntheticSCN
    from mopa_tpu.models.xmuda_arch import Net2DSeg

    n_iters = int(os.environ.get("EMA_DIV_ITERS", 200))
    n_eval = int(os.environ.get("EMA_DIV_EVAL", 16))
    ncls = 10
    p_budget = 1024

    model = Net2DSeg(num_classes=ncls, dual_head=False, pretrained=False)

    ds = SyntheticSCN(length=64, n_points=2048, image_size=(FULL_W, FULL_H),
                      num_classes=ncls, learnable=True, fliplr=0.0, seed=3)

    def batch_of(idx_list):
        imgs, idxs, valids, labels = [], [], [], []
        for i in idx_list:
            s = ds[i]
            n = min(len(s["img_indices"]), p_budget)
            ii = np.zeros((p_budget, 2), np.int32)
            ii[:n] = s["img_indices"][:n]
            lab = np.full(p_budget, -100, np.int64)
            lab[:n] = s["seg_label"][:n]
            imgs.append(s["img"])
            idxs.append(ii)
            valids.append(np.arange(p_budget) < n)
            labels.append(lab)
        return (jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(idxs)),
                jnp.asarray(np.stack(valids)), jnp.asarray(np.stack(labels)))

    rng = jax.random.PRNGKey(0)
    img0, ii0, pv0, _ = batch_of([0, 1])
    variables = model.init({"params": rng, "dropout": rng}, img0, ii0, pv0,
                           train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt, img, ii, pv, lab, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, ii, pv,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            logit = out["seg_logit"].astype(jnp.float32)
            flat_lab = lab.reshape(-1)
            mask = (pv.reshape(-1)) & (flat_lab >= 0)
            onehot = jax.nn.one_hot(jnp.maximum(flat_lab, 0), ncls)
            ce = -(onehot * jax.nn.log_softmax(logit)).sum(-1)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), \
            mut["batch_stats"], opt, loss

    bs = 2
    key = rng
    for it in range(n_iters):
        key, sub = jax.random.split(key)
        ids = [(it * bs + k) % len(ds) for k in range(bs)]
        img, ii, pv, lab = batch_of(ids)
        params, batch_stats, opt, loss = train_step(
            params, batch_stats, opt, img, ii, pv, lab, sub)
        if it % 50 == 0:
            print("iter {} loss {:.4f}".format(it, float(loss)),
                  file=sys.stderr)

    @jax.jit
    def infer(img, ii, pv):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, ii, pv,
            train=False, mutable=[])
        return jax.nn.softmax(out["seg_logit"].astype(jnp.float32), -1)

    # fresh eval scans (beyond the training index range)
    eval_ds = SyntheticSCN(length=n_eval, n_points=2048,
                           image_size=(FULL_W, FULL_H), num_classes=ncls,
                           learnable=True, fliplr=0.0, seed=91)
    r0 = FULL_H - CROP_H                      # bottom crop
    c0 = (FULL_W - CROP_W) // 2               # centred horizontally
    flips, probs_delta, total = 0, 0.0, 0
    border_flips, border_total = 0, 0
    max_delta = 0.0
    for i in range(n_eval):
        s = eval_ds[i]
        ii_full = s["img_indices"].astype(np.int32)
        inside = ((ii_full[:, 0] >= r0) & (ii_full[:, 0] < FULL_H)
                  & (ii_full[:, 1] >= c0) & (ii_full[:, 1] < c0 + CROP_W))
        pts = ii_full[inside][:p_budget]
        n = len(pts)
        if n == 0:
            continue

        def padded(idx_arr, img_arr):
            ii = np.zeros((p_budget, 2), np.int32)
            ii[:n] = idx_arr
            pv = np.arange(p_budget) < n
            return (jnp.asarray(img_arr[None]), jnp.asarray(ii[None]),
                    jnp.asarray(pv[None]))

        pf = np.asarray(infer(*padded(pts, s["img"])))
        pf = pf.reshape(p_budget, ncls)[:n]
        crop_img = s["img"][r0:, c0:c0 + CROP_W]
        pts_c = pts - np.asarray([[r0, c0]], np.int32)
        pc = np.asarray(infer(*padded(pts_c, crop_img)))
        pc = pc.reshape(p_budget, ncls)[:n]

        flip = pf.argmax(-1) != pc.argmax(-1)
        flips += int(flip.sum())
        probs_delta += float(np.abs(pf - pc).sum())
        max_delta = max(max_delta, float(np.abs(pf - pc).max()))
        total += n
        # border band: within 16 px (one /16 stride) of the crop edge
        db = np.minimum.reduce([
            pts_c[:, 0], CROP_H - 1 - pts_c[:, 0],
            pts_c[:, 1], CROP_W - 1 - pts_c[:, 1]])
        band = db < 16
        border_flips += int((flip & band).sum())
        border_total += int(band.sum())

    result = {
        "experiment": "ema_teacher_crop_divergence",
        "train_iters": n_iters,
        "full_frame": [FULL_W, FULL_H],
        "crop": [CROP_W, CROP_H],
        "n_points": total,
        "label_flip_rate": round(flips / max(total, 1), 5),
        "mean_abs_prob_delta": round(probs_delta / max(total, 1) / ncls, 6),
        # unrounded: proves the two inference paths are NOT comparing
        # identical arrays when the mean rounds to zero
        "max_abs_prob_delta": float(max_delta),
        "border16_points": border_total,
        "border16_flip_rate": round(border_flips / max(border_total, 1), 5),
        "interior_flip_rate": round(
            (flips - border_flips) / max(total - border_total, 1), 5),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
