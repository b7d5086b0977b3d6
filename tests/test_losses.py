"""Golden tests for the loss library against torch (CPU) reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mopa_tpu.models import losses


def test_cross_entropy_matches_torch_weighted():
    rng = np.random.default_rng(0)
    n, c = 64, 5
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(n,))
    valid = rng.random(n) > 0.25
    weights = rng.uniform(0.5, 3.0, size=(c,)).astype(np.float32)

    got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(valid), jnp.asarray(weights))
    want = F.cross_entropy(torch.from_numpy(logits[valid]),
                           torch.from_numpy(labels[valid]),
                           weight=torch.from_numpy(weights))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # unweighted
    got_u = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(valid))
    want_u = F.cross_entropy(torch.from_numpy(logits[valid]),
                             torch.from_numpy(labels[valid]))
    np.testing.assert_allclose(float(got_u), float(want_u), rtol=1e-5)


def test_xm_kl_matches_torch():
    rng = np.random.default_rng(1)
    n, c = 40, 5
    s = rng.normal(size=(n, c)).astype(np.float32)
    t = rng.normal(size=(n, c)).astype(np.float32)
    valid = rng.random(n) > 0.3

    got = losses.xm_kl_div(jnp.asarray(s), jnp.asarray(t), jnp.asarray(valid))
    want = F.kl_div(F.log_softmax(torch.from_numpy(s[valid]), dim=1),
                    F.softmax(torch.from_numpy(t[valid]), dim=1),
                    reduction="none").sum(1).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_prob_2_entropy_and_entropy_loss():
    rng = np.random.default_rng(2)
    p = np.abs(rng.normal(size=(30, 5))).astype(np.float32)
    p = p / p.sum(1, keepdims=True)
    ety = losses.prob_2_entropy(jnp.asarray(p))
    want = -p * np.log2(p + 1e-30) / np.log2(5)
    np.testing.assert_allclose(np.asarray(ety), want, rtol=1e-4)

    valid = np.ones(30, bool)
    el = losses.entropy_loss(jnp.asarray(p), jnp.asarray(valid))
    np.testing.assert_allclose(float(el), want.sum(1).mean(), rtol=1e-4)


def test_mask_cons_loss_matches_reference_loops():
    rng = np.random.default_rng(3)
    b, h, w, c, m = 2, 16, 20, 5, 8
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    masks = rng.integers(-1, m, size=(b, h, w)).astype(np.int32)
    masks[0, :4] = -100  # invalid region

    got = float(losses.mask_cons_loss(jnp.asarray(probs), jnp.asarray(masks),
                                      mask_budget=m, min_entropy=True))

    # reference-style loop (mopa/common/utils/loss.py:241-283)
    all_img = []
    for bi in range(b):
        img_losses = []
        for mid in np.unique(masks[bi]):
            if mid < 0:
                continue
            sel = probs[bi][masks[bi] == mid]  # (npix, C)
            mean = sel.mean(0)
            mse = ((sel - mean[None]) ** 2).mean()
            ent = -(mean * np.log2(mean + 1e-30)).sum() / np.log2(c)
            img_losses.append(mse + ent)
        all_img.append(np.mean(img_losses) if img_losses else 0.0)
    want = float(np.mean(all_img))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_softmax_matches_reference():
    rng = np.random.default_rng(4)
    n, c = 50, 4
    logits = rng.normal(size=(n, c)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    labels = rng.integers(0, c, size=(n,))
    labels[labels == 3] = 0  # make one class absent
    valid = np.ones(n, bool)

    got = float(losses.lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels),
                                      jnp.asarray(valid)))

    # reference numpy implementation of lovasz per class, 'present' mode
    def lovasz_grad(gt_sorted):
        gts = gt_sorted.sum()
        intersection = gts - np.cumsum(gt_sorted)
        union = gts + np.cumsum(1 - gt_sorted)
        j = 1.0 - intersection / union
        if len(gt_sorted) > 1:
            j[1:] = j[1:] - j[:-1]
        return j

    cls_losses = []
    for ci in range(c):
        fg = (labels == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, ci])
        order = np.argsort(-errors)
        cls_losses.append(np.dot(errors[order], lovasz_grad(fg[order])))
    want = float(np.mean(cls_losses))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_logcoral_runs_and_symmetric_zero():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(32, 8)).astype(np.float32)
    z = float(losses.logcoral_loss(jnp.asarray(x), jnp.asarray(x)))
    assert abs(z) < 1e-6
    y = rng.normal(size=(32, 8)).astype(np.float32) * 2
    v = float(losses.logcoral_loss(jnp.asarray(x), jnp.asarray(y)))
    assert v > 0


def test_cdan_matches_torch_formula():
    """cdan_loss vs a torch port of reference mopa/models/losses.py:95-120
    (linear ad-net, both unweighted and entropy-weighted variants)."""
    rng = np.random.default_rng(7)
    n, c, f = 16, 5, 12
    feature = rng.normal(size=(n, f)).astype(np.float32)
    probs = rng.dirichlet(np.ones(c), size=n).astype(np.float32)
    w_ad = rng.normal(size=(c * f, 1)).astype(np.float32) * 0.2
    entropy = rng.uniform(0.1, 2.0, size=(n,)).astype(np.float32)

    def ad_net_jax(x):
        return jax.nn.sigmoid(x @ jnp.asarray(w_ad))

    got = float(losses.cdan_loss(jnp.asarray(feature), jnp.asarray(probs),
                                 ad_net_jax, 1.0))
    got_w = float(losses.cdan_loss(jnp.asarray(feature), jnp.asarray(probs),
                                   ad_net_jax, 1.0,
                                   entropy=jnp.asarray(entropy)))

    # torch reference formula
    tf = torch.from_numpy(feature)
    tp = torch.from_numpy(probs)
    op_out = torch.bmm(tp.unsqueeze(2), tf.unsqueeze(1)).view(n, c * f)
    ad_out = torch.sigmoid(op_out @ torch.from_numpy(w_ad)).view(-1)
    target = torch.ones(n)
    bce = F.binary_cross_entropy(ad_out, target, reduction="none")
    want = float(bce.mean())
    ent = torch.from_numpy(entropy)
    wgt = 1.0 + torch.exp(-ent)
    sw = wgt.clone(); sw[n // 2:] = 0
    tw = wgt.clone(); tw[:n // 2] = 0
    weight = sw / sw.sum() + tw / tw.sum()
    want_w = float((weight * bce).sum() / weight.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-5)

    # GRL: identity forward, -coeff * g backward
    x = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(losses.grad_reverse(x, 2.0)),
                               np.asarray(x))
    g = jax.grad(lambda v: jnp.sum(losses.grad_reverse(v, 2.0)))(x)
    np.testing.assert_allclose(np.asarray(g), -2.0 * np.ones(8))
    # entropy-weighted cdan grad w.r.t. entropy stays finite through the GRL
    ge = jax.grad(lambda e: losses.cdan_loss(
        jnp.asarray(feature), jnp.asarray(probs), ad_net_jax, 1.0,
        entropy=e, coeff=2.0))(jnp.asarray(entropy))
    assert np.all(np.isfinite(np.asarray(ge)))


def test_confusion_matrix_matches_numpy():
    from mopa_tpu.models.metric import confusion_matrix, SegIoU

    rng = np.random.default_rng(6)
    n, c = 200, 5
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(-100, c, size=(n,))
    valid = rng.random(n) > 0.2

    mat = np.asarray(confusion_matrix(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(valid), c))
    pred = logits.argmax(1)
    want = np.zeros((c, c), np.int64)
    for p, l, v in zip(pred, labels, valid):
        if v and 0 <= l < c:
            want[l, p] += 1
    np.testing.assert_array_equal(mat, want)

    m = SegIoU(c)
    m.update_mat(mat)
    m.update_mat(mat)
    iou = m.iou
    h = (want * 2).astype(np.float64)
    ref = np.diag(h) / (h.sum(1) + h.sum(0) - np.diag(h))
    np.testing.assert_allclose(iou, ref)
