"""Fused multi-forward equivalence: domain-segmented batch norm.

The trainer fuses the reference's back-to-back source / target / VGI
forwards (``mopa/train/train_xmuda_mopa.py:217-576``) into ONE forward per
modality. These tests pin the contract: per-domain statistics make the fused
pass numerically identical to running the passes separately, including the
sequential running-stat updates.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.models.resnet34_unet import DomainBatchNorm, UNetResNet34
from mopa_tpu.models.scn_unet import SparseUNet, build_unet_plan


def test_domain_batchnorm_matches_sequential_passes():
    rng = np.random.default_rng(0)
    b, h, w, c = 3, 4, 5, 6
    x0 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    x1 = jnp.asarray(rng.normal(loc=2.0, size=(b, h, w, c)), jnp.float32)

    bn1 = DomainBatchNorm(n_domains=1)
    bn2 = DomainBatchNorm(n_domains=2)
    variables = bn1.init(jax.random.PRNGKey(0), x0, False)
    # make scale/bias non-trivial
    variables = {
        "params": {"scale": jnp.asarray(rng.normal(size=(c,)), jnp.float32),
                   "bias": jnp.asarray(rng.normal(size=(c,)), jnp.float32)},
        "batch_stats": variables["batch_stats"],
    }

    # two sequential single-domain passes
    o0, m0 = bn1.apply(variables, x0, False, mutable=["batch_stats"])
    o1, m1 = bn1.apply({"params": variables["params"],
                        "batch_stats": m0["batch_stats"]},
                       x1, False, mutable=["batch_stats"])

    # one fused two-domain pass
    of, mf = bn2.apply(variables, jnp.concatenate([x0, x1]), False,
                       mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(of[:b]), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(of[b:]), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mf["batch_stats"][k]),
                                   np.asarray(m1["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)

    # eval mode must equal the single-domain eval path
    ev1 = bn1.apply(variables, x0, True)
    ev2 = bn2.apply(variables, jnp.concatenate([x0, x0]), True)
    np.testing.assert_allclose(np.asarray(ev2[:b]), np.asarray(ev1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_sparse_unet_fused_domains_match_separate_forwards():
    rng = np.random.default_rng(1)
    n, m, levels = 200, 4, 3
    scale = 24

    def cloud(seed, batch0):
        r = np.random.default_rng(seed)
        coords = np.unique(r.integers(0, scale, size=(n, 3)).astype(np.int32),
                           axis=0)
        k = coords.shape[0]
        pad = n - k
        coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
        valid = np.concatenate([np.ones(k, bool), np.zeros(pad, bool)])
        bidx = np.full(n, batch0, np.int32)
        feats = r.normal(size=(n, 1)).astype(np.float32)
        return coords, bidx, valid, feats

    c0, b0, v0, f0 = cloud(10, 0)
    c1, b1, v1, f1 = cloud(11, 0)

    model = SparseUNet(in_channels=1, m=m, num_planes=levels,
                       compute_dtype=jnp.float32)
    caps = [n, n, n]

    plan0 = build_unet_plan(c0, b0, v0, levels, capacities=caps)
    variables = model.init(jax.random.PRNGKey(2), jnp.asarray(f0), plan0)

    @jax.jit
    def separate(variables):
        p0 = build_unet_plan(c0, b0, v0, levels, capacities=caps)
        o0, m0 = model.apply(variables, jnp.asarray(f0), p0, train=True,
                             mutable=["batch_stats"])
        p1 = build_unet_plan(c1, b1, v1, levels, capacities=caps)
        o1, m1 = model.apply({"params": variables["params"],
                              "batch_stats": m0["batch_stats"]},
                             jnp.asarray(f1), p1, train=True,
                             mutable=["batch_stats"])
        return o0, o1, m1["batch_stats"]

    @jax.jit
    def fused(variables):
        coords = np.concatenate([c0, c1])
        bidx = np.concatenate([b0, b1 + 1])  # distinct batch entries
        valid = np.concatenate([v0, v1])
        plan = build_unet_plan(coords, bidx, valid, levels,
                               capacities=[2 * x for x in caps],
                               batch_domains=np.asarray([0, 1], np.int32))
        feats = jnp.concatenate([jnp.asarray(f0), jnp.asarray(f1)])
        out, mut = model.apply(variables, feats, plan, train=True,
                               n_domains=2, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    o0, o1, bs_sep = jax.tree_util.tree_map(np.asarray, separate(variables))
    of, bs_fused = jax.tree_util.tree_map(np.asarray, fused(variables))

    np.testing.assert_allclose(of[:n], o0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(of[n:], o1, rtol=2e-4, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        bs_fused, bs_sep)


@pytest.mark.slow
def test_unet_resnet34_fused_domains_match_separate_forwards():
    rng = np.random.default_rng(2)
    b, h, w = 2, 32, 32
    x0 = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)
    x1 = jnp.asarray(rng.normal(loc=0.5, size=(b, h, w, 3)), jnp.float32)

    net1 = UNetResNet34(dropout_rate=0.0, n_domains=1)
    net2 = UNetResNet34(dropout_rate=0.0, n_domains=2)
    variables = net1.init(jax.random.PRNGKey(3), x0, train=False)

    @jax.jit
    def separate(variables):
        o0, m0 = net1.apply(variables, x0, train=True,
                            mutable=["batch_stats"])
        o1, m1 = net1.apply({"params": variables["params"],
                             "batch_stats": m0["batch_stats"]},
                            x1, train=True, mutable=["batch_stats"])
        return o0, o1, m1["batch_stats"]

    @jax.jit
    def fused(variables):
        out, mut = net2.apply(variables, jnp.concatenate([x0, x1]),
                              train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    o0, o1, bs_sep = jax.tree_util.tree_map(np.asarray, separate(variables))
    of, bs_fused = jax.tree_util.tree_map(np.asarray, fused(variables))

    np.testing.assert_allclose(of[:b], o0, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(of[b:], o1, rtol=5e-4, atol=5e-4)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(a, c, rtol=5e-4, atol=5e-5),
        bs_fused, bs_sep)
