"""Golden tests: the fused Pallas submanifold conv vs the XLA wide path.

Runs the Pallas kernel in interpreter mode on CPU (the compiled Mosaic path
is exercised on hardware by tools/gather_micro.py and bench.py); asserts
forward and VJP equality with ``sparse_conv.submanifold_conv_wide`` on real
plans built from random sparse coordinate sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopa_tpu.ops import sparse_conv as sc
from mopa_tpu.ops import sparse_conv_pallas as scp
from mopa_tpu.ops import voxel as voxel_ops


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = scp._INTERPRET
    scp._INTERPRET = True
    yield
    scp._INTERPRET = old


def _random_plan(rng, s, p, cap):
    coords = rng.integers(0, 24, size=(s, p, 3)).astype(np.int32)
    valid = np.ones((s, p), bool)
    valid[:, int(p * 0.8):] = False

    def one(c, v, sid):
        table, inverse, counts = voxel_ops.voxelize(
            c, jnp.full((p,), sid, jnp.int32), v, cap)
        wide = sc.build_wide_plan(table)
        return wide.ranks, wide.sel, table.valid_mask()

    ranks_b, sel_b, valid_b = jax.vmap(one)(
        jnp.asarray(coords), jnp.asarray(valid),
        jnp.arange(s, dtype=jnp.int32))
    off = (jnp.arange(s, dtype=jnp.int32) * cap)[:, None]
    ranks = jnp.where(ranks_b >= 0, ranks_b + off, -1).reshape(-1)
    return ranks, sel_b.reshape(-1), valid_b.reshape(-1)


@pytest.mark.parametrize("cin,cout", [(16, 16), (32, 16)])
def test_forward_matches_wide(cin, cout):
    rng = np.random.default_rng(0)
    s, p, cap = 2, 700, 640
    ranks, sel, valid = _random_plan(rng, s, p, cap)
    feats = jnp.asarray(
        rng.normal(size=(s * cap, cin)).astype(np.float32))
    feats = jnp.where(valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)

    ref = sc.submanifold_conv_wide(feats, sc.WidePlan(ranks, sel), w)
    lr, ls = scp.localize_plan(ranks, sel, cap, s)
    out = scp.submanifold_conv_wide_pallas(feats, lr, ls, w, cap, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unet_with_plan_groups_matches():
    """Full SparseUNet fwd+grad: plan_groups (Pallas route) vs XLA route."""
    from mopa_tpu.models import scn_unet

    rng = np.random.default_rng(2)
    s, p, levels = 2, 400, 3
    caps = scn_unet.capacity_schedule(p, levels)
    coords = rng.integers(0, 40, size=(s, p, 3)).astype(np.int32)
    valid = np.ones((s, p), bool)
    valid[:, int(p * 0.9):] = False
    plan = scn_unet.build_unet_plan_batched(
        jnp.asarray(coords), jnp.asarray(valid), levels, capacities=caps)
    model = scn_unet.SparseUNet(in_channels=1, m=8, num_planes=levels)
    feats = jnp.ones((s * p, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan)
    groups = ((s, tuple(caps)),)

    def run(plan_groups):
        def loss(params):
            out = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              feats, plan, train=True,
                              plan_groups=plan_groups,
                              mutable=["batch_stats"])[0]
            return jnp.sum(out * out), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return l, out, g

    l_ref, out_ref, g_ref = run(None)
    l_pal, out_pal, g_pal = run(groups)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_pal)
    for a, b in zip(flat_p, flat_r):
        b = np.asarray(b)
        # atol scales with the leaf's magnitude: fp32 accumulation order
        # differs between the Pallas per-column GEMMs and the XLA wide GEMM
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3,
                                   atol=2e-3 * max(1.0, np.abs(b).max()))


def test_vjp_matches_wide():
    rng = np.random.default_rng(1)
    s, p, cap = 2, 500, 512
    cin, cout = 16, 16
    ranks, sel, valid = _random_plan(rng, s, p, cap)
    feats = jnp.asarray(rng.normal(size=(s * cap, cin)).astype(np.float32))
    feats = jnp.where(valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.normal(size=(s * cap, cout)).astype(np.float32))

    def loss_ref(f, w_):
        out = sc.submanifold_conv_wide(f, sc.WidePlan(ranks, sel), w_)
        return jnp.sum(out * ct)

    lr, ls = scp.localize_plan(ranks, sel, cap, s)

    def loss_pal(f, w_):
        out = scp.submanifold_conv_wide_pallas(f, lr, ls, w_, cap, s)
        return jnp.sum(out * ct)

    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(feats, w)
    # d_feats at PAD slots is unconstrained in both paths (masked downstream)
    m = np.asarray(valid)[:, None]
    np.testing.assert_allclose(np.asarray(gf_p) * m, np.asarray(gf_r) * m,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)
