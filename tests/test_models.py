import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.models.scn_unet import SparseUNet, build_unet_plan, capacity_schedule
from mopa_tpu.models.xmuda_arch import Net2DSeg, Net3DSeg


def _cloud(rng, n, scale=256, batch=2, n_pad=16):
    coords = rng.integers(0, scale, size=(n, 3)).astype(np.int32)
    batch_idx = rng.integers(0, batch, size=(n,)).astype(np.int32)
    valid = np.ones(n, bool)
    coords = np.concatenate([coords, np.zeros((n_pad, 3), np.int32)])
    batch_idx = np.concatenate([batch_idx, np.zeros(n_pad, np.int32)])
    valid = np.concatenate([valid, np.zeros(n_pad, bool)])
    return coords, batch_idx, valid


@pytest.mark.slow
def test_sparse_unet_forward_shapes_and_padding():
    rng = np.random.default_rng(0)
    n_levels = 4  # keep the test small; production uses 7
    coords, batch_idx, valid = _cloud(rng, 400)
    n = coords.shape[0]
    feats = np.ones((n, 1), np.float32)

    model = SparseUNet(in_channels=1, m=8, num_planes=n_levels)

    @jax.jit
    def init_and_run(feats):
        plan = build_unet_plan(coords, batch_idx, valid, n_levels)
        variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)
        out = model.apply(variables, feats, plan, train=False)
        return out, plan.num_voxels

    out, nums = init_and_run(jnp.asarray(feats))
    out = np.asarray(out)
    assert out.shape == (n, 8)
    assert np.isfinite(out).all()
    # padding points receive zeros from the unpool
    assert np.allclose(out[~valid], 0.0)
    # voxel counts shrink monotonically with depth
    nums = np.asarray(nums)
    assert (np.diff(nums) <= 0).all() and nums[0] > 0


def test_sparse_unet_train_updates_batch_stats():
    rng = np.random.default_rng(1)
    coords, batch_idx, valid = _cloud(rng, 200, scale=64)
    feats = np.ones((coords.shape[0], 1), np.float32)
    model = SparseUNet(in_channels=1, m=4, num_planes=2)

    plan = jax.jit(lambda: build_unet_plan(coords, batch_idx, valid, 2))()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), plan, train=False)
    out, mutated = model.apply(variables, jnp.asarray(feats), plan, train=True,
                               mutable=["batch_stats"])
    # running stats moved away from init (mean 0)
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), mutated["batch_stats"], 0.0)
    assert moved > 0


def test_net2dseg_lifting_and_heads():
    rng = np.random.default_rng(2)
    b, h, w, p, c = 2, 48, 64, 100, 5
    img = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    idx = np.stack([rng.integers(0, h, size=(b, p)),
                    rng.integers(0, w, size=(b, p))], axis=-1).astype(np.int32)
    pvalid = np.ones((b, p), bool)
    pvalid[1, 50:] = False

    model = Net2DSeg(num_classes=c, dual_head=True, output_all=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(idx), jnp.asarray(pvalid), train=False)
    preds = model.apply(variables, jnp.asarray(img), jnp.asarray(idx),
                        jnp.asarray(pvalid), train=False)
    assert preds["seg_logit"].shape == (b * p, c)
    assert preds["seg_logit2"].shape == (b * p, c)
    assert preds["feats"].shape == (b * p, 64)
    assert preds["seg_logit_all"].shape == (b, h, w, c)

    # lifting correctness: dense head on the same pixel equals lifted logit
    dense = np.asarray(preds["seg_logit_all"])
    lifted = np.asarray(preds["seg_logit"]).reshape(b, p, c)
    for bi in [0]:
        for pi in [0, 7, 31]:
            r, col = idx[bi, pi]
            np.testing.assert_allclose(lifted[bi, pi], dense[bi, r, col], rtol=1e-4,
                                       atol=1e-5)


def test_net3dseg_heads():
    rng = np.random.default_rng(3)
    coords, batch_idx, valid = _cloud(rng, 150, scale=64)
    n = coords.shape[0]
    feats = np.ones((n, 1), np.float32)
    model = Net3DSeg(num_classes=5, dual_head=True, m=4, num_planes=2)

    plan = jax.jit(lambda: build_unet_plan(coords, batch_idx, valid, 2))()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), plan)
    preds = model.apply(variables, jnp.asarray(feats), plan)
    assert preds["seg_logit"].shape == (n, 5)
    assert preds["seg_logit2"].shape == (n, 5)
    assert preds["feats"].shape == (n, 4)


def test_capacity_schedule():
    from mopa_tpu.models.scn_unet import CAP_FACTORS

    caps = capacity_schedule(10000, 7)
    assert caps[0] == int(10000 * CAP_FACTORS[0]) and len(caps) == 7
    # monotone non-increasing, floored at 128 (honest measured-curve schedule)
    assert all(a >= b for a, b in zip(caps, caps[1:]))
    assert all(c >= 128 for c in caps)


def test_lifting_backward_matches_scatter_add():
    """The sort+cumsum custom VJP of lift_image_feats equals the naive
    scatter-add gradient (duplicate pixels, padding points, clipping)."""
    import jax
    import jax.numpy as jnp

    from mopa_tpu.ops.lifting import lift_image_feats

    rng = np.random.default_rng(21)
    b, h, w, c, p = 3, 12, 17, 5, 200
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # duplicates + out-of-range (exercises clipping) + padding
    idx = np.stack([rng.integers(-2, h + 2, (b, p)),
                    rng.integers(-2, w + 2, (b, p))], -1).astype(np.int32)
    valid = rng.random((b, p)) > 0.3
    ct = rng.normal(size=(b, p, c)).astype(np.float32)

    def loss(f):
        return jnp.sum(lift_image_feats(f, jnp.asarray(idx),
                                        jnp.asarray(valid)) * jnp.asarray(ct))

    got = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(fm)))

    want = np.zeros_like(fm)
    for bi in range(b):
        for pi in range(p):
            if not valid[bi, pi]:
                continue
            r = min(max(idx[bi, pi, 0], 0), h - 1)
            cc = min(max(idx[bi, pi, 1], 0), w - 1)
            want[bi, r, cc] += ct[bi, pi]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
