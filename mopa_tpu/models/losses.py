"""Segmentation / UDA loss library (masked, static-shaped, jit-compatible).

Re-implements the reference loss surface:

* masked weighted cross-entropy (torch ``F.cross_entropy`` semantics incl.
  class-weight normalisation), used for source CE / pseudo-label CE
  (reference ``mopa/train/train_xmuda_mopa.py:354-366,456-465``).
* cross-modal KL: ``kl_div(log_softmax(x), softmax(y)).sum(1).mean()``
  (reference train_xmuda_mopa.py:389-398) with padding masks.
* ``prob_2_entropy`` weighted self-information and MinEnt ``entropy_loss``
  (reference ``mopa/models/losses.py:10-34``).
* ``logcoral_loss`` geodesic covariance alignment (reference losses.py:47-93).
* Lovasz-softmax (reference ``mopa/common/utils/loss.py:107-199``).
* focal loss (reference loss.py:203-227).
* ``mask_cons_loss`` SAM intra-mask consistency: per-mask MSE-to-mean plus
  mask-mean entropy (reference loss.py:241-283), vectorised as segment sums
  over a fixed per-image mask-id budget instead of ``masks.unique()`` loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(logits: jax.Array, labels: jax.Array, valid: jax.Array,
                  class_weights: jax.Array | None = None) -> jax.Array:
    """Masked CE with torch semantics: mean weighted by per-class weights.

    logits (N, C); labels (N,) int (may be out of range where invalid);
    valid (N,) bool.
    """
    num_classes = logits.shape[-1]
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights.astype(jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(nll * w) / denom


def xm_kl_div(logits_student: jax.Array, logits_teacher: jax.Array,
              valid: jax.Array) -> jax.Array:
    """KL(teacher || student) summed over classes, averaged over valid points.

    Matches ``F.kl_div(log_softmax(s), softmax(t), 'none').sum(1).mean()``.
    The teacher side must already be stop-gradiented by the caller when the
    reference detaches it.
    """
    logp_s = jax.nn.log_softmax(logits_student.astype(jnp.float32), axis=-1)
    p_t = jax.nn.softmax(logits_teacher.astype(jnp.float32), axis=-1)
    # torch kl_div(input=logp, target=p) = p * (log p - input)
    kl = jnp.sum(p_t * (jnp.log(jnp.clip(p_t, 1e-30)) - logp_s), axis=-1)
    m = valid.astype(jnp.float32)
    return jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)


def prob_2_entropy(prob: jax.Array) -> jax.Array:
    """Weighted self-information map: -p * log2(p) / log2(C) (ref losses.py:10-19)."""
    c = prob.shape[-1]
    return -prob * jnp.log2(prob + 1e-30) / np.log2(c)


def entropy_loss(prob: jax.Array, valid: jax.Array) -> jax.Array:
    """MinEnt loss over valid points (ref losses.py:21-34)."""
    c = prob.shape[-1]
    ent = -jnp.sum(prob * jnp.log2(prob + 1e-30), axis=-1) / np.log2(c)
    m = valid.astype(jnp.float32)
    return jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)


def logcoral_loss(x_src: jax.Array, x_trg: jax.Array) -> jax.Array:
    """Geodesic (log-CORAL) loss between feature covariances (ref losses.py:47-93)."""
    assert x_src.shape[-1] == x_trg.shape[-1]
    batch_size = x_src.shape[0]
    x_src = x_src.reshape(-1, x_src.shape[-1]).astype(jnp.float32)
    x_trg = x_trg.reshape(-1, x_trg.shape[-1]).astype(jnp.float32)
    x_src = x_src - jnp.mean(x_src, axis=0)
    x_trg = x_trg - jnp.mean(x_trg, axis=0)
    factor = 1.0 / (batch_size - 1)
    cov_src = factor * (x_src.T @ x_src)
    cov_trg = factor * (x_trg.T @ x_trg)
    bad = (
        jnp.any(cov_src > 1e30) | jnp.any(cov_trg > 1e30)
        | jnp.any(jnp.isnan(cov_src)) | jnp.any(jnp.isnan(cov_trg))
    )
    eye = jnp.eye(cov_src.shape[0], dtype=jnp.float32)
    cov_src = jnp.where(bad, eye, cov_src)
    cov_trg = jnp.where(bad, eye, cov_trg)

    def logm(cov):
        e, v = jnp.linalg.eigh(cov)
        e = jnp.clip(e, 1e-8)
        return (v * jnp.log(e)[None, :]) @ v.T

    return jnp.mean((logm(cov_src) - logm(cov_trg)) ** 2)


def focal_loss(logits: jax.Array, labels: jax.Array, valid: jax.Array,
               alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Multi-class sigmoid focal loss (RetinaNet; ref loss.py:203-227)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = -(onehot * jnp.log(jnp.clip(p, 1e-12))
           + (1 - onehot) * jnp.log(jnp.clip(1 - p, 1e-12)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    loss = ce * ((1 - p_t) ** gamma)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = loss * a_t
    m = valid.astype(jnp.float32)[:, None]
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m) * num_classes, 1.0)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(probas: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    """Masked multi-class Lovasz-softmax, 'present' class averaging
    (ref loss.py:122-168). Padding points get zero error weight."""
    c = probas.shape[-1]
    m = valid.astype(jnp.float32)

    def class_loss(ci):
        fg = (labels == ci).astype(jnp.float32) * m
        errors = jnp.abs(fg - probas[:, ci]) * m
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = jnp.sum(fg) > 0
        return jnp.where(present, loss, 0.0), present.astype(jnp.float32)

    losses, present = jax.vmap(class_loss)(jnp.arange(c))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)


def mask_cons_loss(all_probs: jax.Array, sam_masks: jax.Array,
                   mask_budget: int, min_entropy: bool = True) -> jax.Array:
    """SAM intra-mask consistency + mask-mean entropy (ref loss.py:241-283).

    Args:
        all_probs: (B, H, W, C) softmaxed dense 2D predictions.
        sam_masks: (B, H, W) int32 mask ids; negative = ignore. Ids must be
            < mask_budget (the data pipeline remaps/clips them).
        mask_budget: static per-image mask count M.
        min_entropy: add the entropy-of-mean term (the reference passes True).

    Per mask: mean over (pixels, classes) of (p - mask_mean)^2, minus
    sum_c mean_c*log2(mean_c)/log2(C); per image: mean over non-empty masks;
    batch: mean over images (empty images contribute 0, like the reference).
    """
    b, h, w, c = all_probs.shape
    m = mask_budget
    flat_p = all_probs.reshape(b, h * w, c).astype(jnp.float32)
    flat_id = sam_masks.reshape(b, h * w)
    valid = (flat_id >= 0) & (flat_id < m)
    sid = jnp.where(valid, flat_id, m)  # dump slot m

    def per_image(p, sid, valid):
        # one-hot GEMM segment sums: scatter-adds of H*W pixels into M ids
        # serialise on colliding indices on TPU; the (M, HW) x (HW, C) matmul
        # rides the MXU instead.
        onehot = jax.nn.one_hot(sid, m + 1, dtype=jnp.float32)  # (HW, M+1)
        npix = jnp.sum(onehot, axis=0)
        s1 = jnp.dot(onehot.T, p, preferred_element_type=jnp.float32)
        s2 = jnp.dot(onehot.T, p * p, preferred_element_type=jnp.float32)
        npix, s1, s2 = npix[:m], s1[:m], s2[:m]
        n = jnp.maximum(npix, 1.0)[:, None]
        mean = s1 / n
        sse = s2 - n * mean**2  # per class sum of squared deviations
        mse = jnp.sum(sse, axis=1) / jnp.maximum(npix * c, 1.0)
        loss = mse
        if min_entropy:
            ent = -jnp.sum(mean * jnp.log2(mean + 1e-30), axis=1) / np.log2(c)
            loss = loss + ent
        nonempty = npix > 0
        n_masks = jnp.sum(nonempty.astype(jnp.float32))
        return jnp.sum(jnp.where(nonempty, loss, 0.0)) / jnp.maximum(n_masks, 1.0)

    img_losses = jax.vmap(per_image)(flat_p, sid, valid)
    return jnp.mean(img_losses)


def l2_norm(feats: jax.Array, eps: float = 1e-8) -> jax.Array:
    """L2 feature normalisation (ref loss.py:230-238)."""
    norm = jnp.linalg.norm(feats, ord=2, axis=1, keepdims=True)
    return feats / jnp.maximum(norm, eps)


def berhu_loss(prediction: jax.Array, ground_truth: jax.Array,
               valid: jax.Array) -> jax.Array:
    """Inverse Huber loss for the depth auxiliary task (ref loss.py:16-42).

    c = 0.2 * max|err| over valid elements; linear below c, quadratic above.
    """
    diff = jnp.abs(prediction - ground_truth)
    diff = jnp.where(valid, diff, 0.0)
    c = 0.2 * jnp.max(diff)
    lin = jnp.where(diff <= c, diff, 0.0)
    non_lin = jnp.where(diff > c, (diff ** 2 + c ** 2) / jnp.maximum(2 * c, 1e-12),
                        0.0)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return (jnp.sum(lin) + jnp.sum(non_lin)) / n


def gaussian_kernel(source: jax.Array, target: jax.Array, kernel_mul=2.0,
                    kernel_num=5, fix_sigma=None) -> jax.Array:
    """Multi-bandwidth RBF kernel matrix over [source; target]
    (ref loss.py:63-79)."""
    total = jnp.concatenate([source, target], axis=0)
    n = total.shape[0]
    l2 = jnp.sum((total[:, None, :] - total[None, :, :]) ** 2, axis=-1)
    if fix_sigma:
        bandwidth = fix_sigma
    else:
        bandwidth = jnp.sum(l2) / (n ** 2 - n)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    vals = [jnp.exp(-l2 / (bandwidth * kernel_mul ** i))
            for i in range(kernel_num)]
    return sum(vals)


def dan_loss(source: jax.Array, target: jax.Array, kernel_mul=2.0,
             kernel_num=5, fix_sigma=None) -> jax.Array:
    """MK-MMD (DAN) domain alignment loss (ref loss.py:44-61), vectorised."""
    b = source.shape[0]
    k = gaussian_kernel(source, target, kernel_mul, kernel_num, fix_sigma)
    ss = k[:b, :b]
    tt = k[b:, b:]
    st = k[:b, b:]
    off = ~jnp.eye(b, dtype=bool)
    # upper-triangular pairs (s1 < s2): matches the reference's loops
    triu = jnp.triu(jnp.ones((b, b), bool), 1)
    loss1 = jnp.sum(jnp.where(triu, ss + tt, 0.0)) / (b * (b - 1) / 2)
    loss2 = -jnp.sum(st + st.T) / (b * b)
    return loss1 + loss2


@jax.custom_vjp
def _grad_reverse(x, coeff):
    return x


def _grad_reverse_fwd(x, coeff):
    return x, coeff


def _grad_reverse_bwd(coeff, g):
    return (-coeff * g, None)


_grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


def grad_reverse(x: jax.Array, coeff: float = 1.0) -> jax.Array:
    """Gradient reversal layer: identity forward, ``-coeff * g`` backward
    (the reference's ``grl_hook`` at ``mopa/models/losses.py:88-92``)."""
    return _grad_reverse(x, coeff)


def cdan_loss(feature: jax.Array, softmax_output: jax.Array, ad_net_apply,
              dm_label: float, entropy: jax.Array | None = None,
              coeff: float = 1.0) -> jax.Array:
    """Conditional Domain Adversarial loss (reference
    ``mopa/models/losses.py:95-120``; defined there but never called by any
    shipped train script — ported for capability parity).

    ``ad_net_apply`` maps the (N, C*F) multilinear conditioning of features
    by detached softmax predictions to (N,) or (N, 1) sigmoid domain
    probabilities. ``dm_label`` is the adversarial domain target. With
    ``entropy``, examples are entropy-weighted (first half = source, second
    half = target, each half normalised), and the entropy tensor's gradient
    is reversed with ``coeff`` (GRL hook).
    """
    softmax_output = jax.lax.stop_gradient(softmax_output)
    n = feature.shape[0]
    op_out = (softmax_output[:, :, None] * feature[:, None, :]).reshape(n, -1)
    ad_out = jnp.clip(jnp.reshape(ad_net_apply(op_out), (-1,)), 1e-7, 1 - 1e-7)
    target = jnp.full_like(ad_out, float(dm_label))
    bce = -(target * jnp.log(ad_out) + (1 - target) * jnp.log(1 - ad_out))
    if entropy is None:
        return jnp.mean(bce)
    entropy = grad_reverse(entropy, coeff)
    w = 1.0 + jnp.exp(-entropy)
    is_src = jnp.arange(n) < n // 2
    sw = jnp.where(is_src, w, 0.0)
    tw = jnp.where(is_src, 0.0, w)
    weight = (sw / jax.lax.stop_gradient(jnp.sum(sw))
              + tw / jax.lax.stop_gradient(jnp.sum(tw)))
    return jnp.sum(weight * bce) / jax.lax.stop_gradient(jnp.sum(weight))


def supcon_loss(labels_anchor: jax.Array, anchor_feature: jax.Array,
                contrast_feature: jax.Array, labels_contrast: jax.Array,
                temperature: float = 0.1) -> jax.Array:
    """Supervised contrastive loss (ref losses.py SupConLoss:123-184)."""
    logits = (anchor_feature @ contrast_feature.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    mask = (labels_anchor[:, None] == labels_contrast[None, :]).astype(
        jnp.float32)
    exp_logits = (jnp.exp(logits) + 1e-5) * (1.0 - mask)
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / denom
    return -jnp.mean(mean_log_prob_pos)
