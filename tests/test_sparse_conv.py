import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.ops import sparse_conv as sc
from mopa_tpu.ops import voxel


def make_cloud(rng, n=60, scale=8, cin=4, n_pad=5):
    coords = rng.integers(0, scale, size=(n, 3)).astype(np.int32)
    # dedup points so per-point feats == per-voxel feats (simplifies golden)
    coords = np.unique(coords, axis=0)
    n = coords.shape[0]
    batch_idx = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    if n_pad:
        coords = np.concatenate([coords, np.zeros((n_pad, 3), np.int32)])
        batch_idx = np.concatenate([batch_idx, np.zeros(n_pad, np.int32)])
        valid = np.concatenate([valid, np.zeros(n_pad, bool)])
        feats = np.concatenate([feats, 99 * np.ones((n_pad, cin), np.float32)])
    return coords, batch_idx, valid, feats


def dense_from_sparse(coords, feats, valid, scale, cin):
    dense = np.zeros((scale, scale, scale, cin), np.float32)
    for c, f, v in zip(coords, feats, valid):
        if v:
            dense[tuple(c)] = f
    return dense


def dense_conv3(dense, w):
    """Cross-correlation: out[p] = sum_off dense[p+off] @ w[off_index]."""
    offs = sc.kernel_offsets(3)
    s = dense.shape[0]
    out = np.zeros((s, s, s, w.shape[-1]), np.float32)
    padded = np.pad(dense, [(1, 1)] * 3 + [(0, 0)])
    for k, off in enumerate(offs):
        shifted = padded[1 + off[0] : 1 + off[0] + s,
                         1 + off[1] : 1 + off[1] + s,
                         1 + off[2] : 1 + off[2] + s]
        out += shifted @ w[k]
    return out


def test_submanifold_conv_matches_dense():
    rng = np.random.default_rng(0)
    cin, cout, scale = 4, 6, 8
    coords, batch_idx, valid, feats = make_cloud(rng, cin=cin, scale=scale)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    @jax.jit
    def run():
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(jnp.asarray(feats), inverse, counts, table.capacity)
        nbr = sc.build_submanifold_plan(table)
        out = sc.submanifold_conv(vfeats, nbr, jnp.asarray(w))
        return table.coords, table.batch, table.num, out

    t_coords, t_batch, num, out = map(np.asarray, run())
    num = int(num)

    dense = dense_from_sparse(coords, feats, valid, scale, cin)
    ref = dense_conv3(dense, w)
    got = out[:num]
    want = np.stack([ref[tuple(c)] for c in t_coords[:num]])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # padding slots produce zeros only if inputs were zeroed there — not
    # required; what matters is that they are masked downstream.


def test_strided_conv_and_deconv_roundtrip_structure():
    rng = np.random.default_rng(1)
    cin, cmid, scale = 3, 5, 8
    coords, batch_idx, valid, feats = make_cloud(rng, n=40, cin=cin, scale=scale)
    w_down = rng.normal(size=(8, cin, cmid)).astype(np.float32)
    w_up = rng.normal(size=(8, cmid, cin)).astype(np.float32)

    @jax.jit
    def run():
        fine, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(jnp.asarray(feats), inverse, counts, fine.capacity)
        vfeats = jnp.where(fine.valid_mask()[:, None], vfeats, 0.0)
        coarse, f2c = voxel.downsample_coords(fine, capacity=fine.capacity)
        down_nbr = sc.build_down_plan(fine, coarse)
        mid = sc.strided_conv(vfeats, down_nbr, jnp.asarray(w_down))
        off_idx = sc.up_offset_index(fine)
        up = sc.deconv(mid, f2c, off_idx, jnp.asarray(w_up), fine.valid_mask())
        return (fine.coords, fine.num, coarse.coords, coarse.num, f2c, mid, up,
                down_nbr)

    f_coords, f_num, c_coords, c_num, f2c, mid, up, down_nbr = map(np.asarray, run())
    f_num, c_num = int(f_num), int(c_num)

    # golden strided conv: out[c] = sum over fine sites with floor(f/2)==c of
    # feats[f] @ w_down[offset(f)]
    vox_feats = {}
    for c, f, v in zip(coords, feats, valid):
        if v:
            vox_feats[tuple(c)] = f
    ref_mid = np.zeros((c_num, 5), np.float32)
    for ci in range(c_num):
        base = 2 * c_coords[ci]
        for o_idx, off in enumerate(
            [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
        ):
            key = tuple(base + np.asarray(off))
            if key in vox_feats:
                ref_mid[ci] += vox_feats[key] @ w_down[o_idx]
    np.testing.assert_allclose(mid[:c_num], ref_mid, rtol=1e-4, atol=1e-4)

    # golden deconv: out[f] = mid[f2c[f]] @ w_up[f % 2 offset]
    for fi in range(f_num):
        off = f_coords[fi] % 2
        o_idx = off[0] * 4 + off[1] * 2 + off[2]
        want = mid[f2c[fi]] @ w_up[o_idx]
        np.testing.assert_allclose(up[fi], want, rtol=1e-4, atol=1e-4)


def test_batch_norm_masked_stats_and_act():
    rng = np.random.default_rng(2)
    v, c = 50, 4
    feats = rng.normal(size=(v, c)).astype(np.float32) * 3 + 1
    valid = rng.random(v) > 0.3
    scale = np.abs(rng.normal(size=(c,)).astype(np.float32)) + 0.5
    bias = rng.normal(size=(c,)).astype(np.float32)
    st = sc.BNState(jnp.zeros(c), jnp.ones(c))

    @jax.jit
    def run(feats):
        out, new_st = sc.batch_norm_act(
            feats, jnp.asarray(valid), jnp.asarray(scale), jnp.asarray(bias), st,
            training=True, leakiness=0.0)
        out_leaky, _ = sc.batch_norm_act(
            feats, jnp.asarray(valid), jnp.asarray(scale), jnp.asarray(bias), st,
            training=True, leakiness=0.1, act=True)
        return out, new_st, out_leaky

    out, new_st, out_leaky = run(jnp.asarray(feats))
    out = np.asarray(out)

    m = feats[valid].mean(0)
    var = feats[valid].var(0)
    ref = (feats - m) / np.sqrt(var + 1e-4) * scale + bias
    ref_act = np.maximum(ref, 0)
    np.testing.assert_allclose(out[valid], ref_act[valid], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(new_st.running_mean), 0.9 * 0 + 0.1 * m,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_st.running_var), 0.9 * 1 + 0.1 * var,
                               rtol=1e-4, atol=1e-4)
    # leaky path differs below zero
    ref_leaky = np.where(ref >= 0, ref, 0.1 * ref)
    np.testing.assert_allclose(np.asarray(out_leaky)[valid], ref_leaky[valid],
                               rtol=1e-3, atol=1e-3)


def test_conv_grads_flow():
    rng = np.random.default_rng(3)
    cin, cout = 3, 4
    coords, batch_idx, valid, feats = make_cloud(rng, n=30, cin=cin, scale=8)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    @jax.jit
    def loss(w, feats):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(feats, inverse, counts, table.capacity)
        nbr = sc.build_submanifold_plan(table)
        out = sc.submanifold_conv(vfeats, nbr, w)
        mask = table.valid_mask()[:, None]
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    gw, gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(jnp.asarray(w), jnp.asarray(feats))
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gw).sum()) > 0


def _naive_submanifold(feats, nbr, w):
    k = nbr.shape[1]
    out = jnp.zeros((nbr.shape[0], w.shape[-1]), feats.dtype)
    for j in range(k):
        safe = jnp.clip(nbr[:, j], 0, feats.shape[0] - 1)
        g = jnp.where((nbr[:, j] >= 0)[:, None], feats[safe], 0.0)
        out = out + g @ w[j]
    return out


@pytest.mark.slow
def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(7)
    cin, cout, cmid, cup = 3, 5, 4, 6
    coords, batch_idx, valid, feats = make_cloud(rng, n=50, cin=cin, scale=8)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    w_down = rng.normal(size=(8, cout, cmid)).astype(np.float32)
    w_up = rng.normal(size=(8, cmid, cup)).astype(np.float32)

    @jax.jit
    def grads(feats, w, w_down, w_up):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(feats, inverse, counts, table.capacity)
        nbr = sc.build_submanifold_plan(table)
        coarse, f2c = voxel.downsample_coords(table, table.capacity)
        down_nbr = sc.build_down_plan(table, coarse)
        up_off = sc.up_offset_index(table)
        fv = table.valid_mask()

        def loss_custom(vf, w, wd, wu):
            a = sc.submanifold_conv(vf, nbr, w)
            b = sc.strided_conv(a, down_nbr, wd, f2c=f2c, up_off=up_off,
                                fine_valid=fv)
            cdec = sc.deconv(b, f2c, up_off, wu, fv, down_nbr=down_nbr)
            return jnp.sum(jnp.where(fv[:, None], cdec, 0.0) ** 2)

        def loss_naive(vf, w, wd, wu):
            a = _naive_submanifold(vf, nbr, w)
            b = _naive_submanifold(a, down_nbr, wd)
            safe = jnp.clip(f2c, 0, b.shape[0] - 1)
            g = jnp.where((f2c >= 0)[:, None], b[safe], 0.0)
            wsel = wu[jnp.clip(up_off, 0, 7)]
            cdec = jnp.einsum("vc,vcd->vd", g, wsel)
            cdec = jnp.where(fv[:, None], cdec, 0.0)
            return jnp.sum(jnp.where(fv[:, None], cdec, 0.0) ** 2)

        g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(vfeats, w, w_down, w_up)
        g2 = jax.grad(loss_naive, argnums=(0, 1, 2, 3))(vfeats, w, w_down, w_up)
        v1 = loss_custom(vfeats, w, w_down, w_up)
        v2 = loss_naive(vfeats, w, w_down, w_up)
        return g1, g2, v1, v2

    g1, g2, v1, v2 = grads(jnp.asarray(feats), jnp.asarray(w),
                           jnp.asarray(w_down), jnp.asarray(w_up))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def _brute_force_nbr(table_np_coords, table_np_batch, valid_np):
    """O(V^2) reference neighbour map for small tables."""
    offs = sc.kernel_offsets(3)
    v = table_np_coords.shape[0]
    nbr = np.full((v, 27), -1, np.int32)
    index = {}
    for i in range(v):
        if valid_np[i]:
            index[(table_np_batch[i],) + tuple(table_np_coords[i])] = i
    for i in range(v):
        if not valid_np[i]:
            continue
        for k, off in enumerate(offs):
            q = (table_np_batch[i],) + tuple(table_np_coords[i] + off)
            nbr[i, k] = index.get(q, -1)
    return nbr


def test_submanifold_plan_transpose_trick_matches_bruteforce():
    rng = np.random.default_rng(3)
    for n in (40, 120):
        coords, batch_idx, valid, _ = make_cloud(rng, n=n, scale=6)
        # mix in a second batch element to exercise batch separation
        batch_idx = batch_idx.copy()
        batch_idx[::3] = 1

        @jax.jit
        def run():
            table, _, _ = voxel.voxelize(coords, batch_idx, valid)
            return (sc.build_submanifold_plan(table), table.coords,
                    table.batch, table.key_hi)

        nbr, t_coords, t_batch, key_hi = jax.tree_util.tree_map(
            np.asarray, run())
        tvalid = key_hi != np.iinfo(np.int32).max
        ref = _brute_force_nbr(t_coords, t_batch, tvalid)
        np.testing.assert_array_equal(nbr, ref)


def test_down_plan_from_f2c_matches_merge_lookup():
    rng = np.random.default_rng(4)
    coords, batch_idx, valid, _ = make_cloud(rng, n=80, scale=8)

    @jax.jit
    def run():
        table, _, _ = voxel.voxelize(coords, batch_idx, valid)
        coarse, f2c = voxel.downsample_coords(table, table.capacity)
        old = sc.build_down_plan(table, coarse)
        up_off = sc.up_offset_index(table)
        new = sc.down_plan_from_f2c(f2c, up_off, table.valid_mask(),
                                    coarse.capacity)
        return old, new

    old, new = jax.tree_util.tree_map(np.asarray, run())
    np.testing.assert_array_equal(old, new)


def test_rank_lookup_lower_bound():
    rng = np.random.default_rng(13)
    coords, batch_idx, valid, _ = make_cloud(rng, n=200, scale=10)

    @jax.jit
    def run():
        table, _, _ = voxel.voxelize(coords, batch_idx, valid)
        q_coords = jnp.concatenate([
            table.coords,                              # exact keys
            table.coords + jnp.asarray([0, 0, 1]),     # maybe-miss keys
        ])
        q_batch = jnp.concatenate([table.batch, table.batch])
        q_valid = jnp.concatenate([table.valid_mask(), table.valid_mask()])
        q_hi, q_lo = voxel.pack_keys(q_coords, q_batch, q_valid)
        r = voxel.rank_lookup(table, q_hi, q_lo, q_valid)
        return table.key_hi, table.key_lo, q_hi, q_lo, q_valid, r

    khi, klo, qhi, qlo, qv, r = map(np.asarray, run())
    keys = [(h, l) for h, l in zip(khi.tolist(), klo.tolist())]
    for i in range(len(qhi)):
        if not qv[i]:
            assert r[i] == len(khi)
            continue
        want = sum(1 for k in keys if k < (qhi[i], qlo[i]))
        assert r[i] == want, (i, r[i], want)


def test_wide_conv_matches_exact_conv_and_grads():
    """submanifold_conv_wide == submanifold_conv over the exact neighbour
    map, forward and backward (fwd uses 9 wide gathers + dz realignment)."""
    rng = np.random.default_rng(17)
    cin, cout = 5, 7
    coords, batch_idx, valid, feats = make_cloud(rng, n=120, scale=8, cin=cin)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    @jax.jit
    def run(feats, w):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(feats, inverse, counts, table.capacity)
        vfeats = jnp.where(table.valid_mask()[:, None], vfeats, 0.0)
        nbr = sc.build_submanifold_plan(table)
        wide = sc.build_wide_plan(table)

        def loss_exact(f, w):
            return jnp.sum(jnp.where(table.valid_mask()[:, None],
                                     sc.submanifold_conv(f, nbr, w), 0.) ** 2)

        def loss_wide(f, w):
            return jnp.sum(jnp.where(
                table.valid_mask()[:, None],
                sc.submanifold_conv_wide(f, wide, w), 0.) ** 2)

        o1 = sc.submanifold_conv(vfeats, nbr, w)
        o2 = sc.submanifold_conv_wide(vfeats, wide, w)
        g1 = jax.grad(loss_exact, argnums=(0, 1))(vfeats, w)
        g2 = jax.grad(loss_wide, argnums=(0, 1))(vfeats, w)
        mask = table.valid_mask()
        return o1, o2, g1, g2, mask

    o1, o2, (gf1, gw1), (gf2, gw2), mask = jax.tree_util.tree_map(
        np.asarray, run(jnp.asarray(feats), jnp.asarray(w)))
    np.testing.assert_allclose(o2[mask], o1[mask], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gf2[mask], gf1[mask], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gw2, gw1, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_zdense_conv_matches_exact_neighbour_conv():
    """submanifold_conv_zdense (z-padded window tables, no dz realignment)
    must match the exact neighbour-map conv in values AND gradients,
    including z-border scenes (z=0 is common after the positive-octant
    shift) and sparse tables with padding slots."""
    from mopa_tpu.ops import voxel as V
    from mopa_tpu.ops import sparse_conv as SC

    rng = np.random.default_rng(5)
    for lo, hi, n in [(0, 12, 600), (0, 3, 300), (4090, 4096, 300)]:
        coords = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
        pvalid = rng.random(n) > 0.2
        table, _, _ = V.voxelize(jnp.asarray(coords), jnp.zeros(n, jnp.int32),
                                 jnp.asarray(pvalid), capacity=n)
        cin, cout = 4, 6
        feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32)
                        * 0.2)
        nbr = SC.build_submanifold_plan(table)
        ref = SC.submanifold_conv(feats, nbr, w)
        pz = V.build_padded_ztable(table, 5 * n)
        zp = SC.zplan_from_nbr(nbr, pz)
        got = SC.submanifold_conv_zdense(feats, zp, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        gz = jax.grad(lambda f, ww: jnp.sum(
            SC.submanifold_conv_zdense(f, zp, ww) ** 2), argnums=(0, 1))(
            feats, w)
        gr = jax.grad(lambda f, ww: jnp.sum(
            SC.submanifold_conv(f, nbr, ww) ** 2), argnums=(0, 1))(feats, w)
        vmask = np.asarray(table.valid_mask())
        np.testing.assert_allclose(np.asarray(gz[0])[vmask],
                                   np.asarray(gr[0])[vmask],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gz[1]), np.asarray(gr[1]),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,cout", [(48, 48), (64, 32), (130, 40),
                                      (48, 120)])
def test_wide_conv_chunked_matches_exact(cin, cout):
    """The 128-lane-cliff chunked wide-conv path (3*cin or 3*cout >= 128:
    per-dz-subrow sub-112-lane gathers + per-slot GEMMs summed in f32,
    GATHER_FLOOR_r05.json) is numerically the exact neighbour conv, forward
    and backward. Cases: chunked fwd+bwd (48,48); chunked fwd, monolithic
    bwd (64,32); two sub-chunks per subrow (130,40); cout above the lane
    limit falls back to the monolithic backward (48,120)."""
    import mopa_tpu.ops.sparse_conv as sc_mod
    assert sc_mod._CHUNK_GATHER  # default-on path under test
    rng = np.random.default_rng(23)
    coords, batch_idx, valid, feats = make_cloud(rng, n=120, scale=8, cin=cin)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) / cin

    @jax.jit
    def run(feats, w):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        vfeats = voxel.pool_features(feats, inverse, counts, table.capacity)
        vfeats = jnp.where(table.valid_mask()[:, None], vfeats, 0.0)
        nbr = sc.build_submanifold_plan(table)
        wide = sc.build_wide_plan(table)

        def loss_exact(f, w):
            return jnp.sum(jnp.where(table.valid_mask()[:, None],
                                     sc.submanifold_conv(f, nbr, w), 0.) ** 2)

        def loss_wide(f, w):
            return jnp.sum(jnp.where(
                table.valid_mask()[:, None],
                sc.submanifold_conv_wide(f, wide, w), 0.) ** 2)

        o1 = sc.submanifold_conv(vfeats, nbr, w)
        o2 = sc.submanifold_conv_wide(vfeats, wide, w)
        g1 = jax.grad(loss_exact, argnums=(0, 1))(vfeats, w)
        g2 = jax.grad(loss_wide, argnums=(0, 1))(vfeats, w)
        return o1, o2, g1, g2, table.valid_mask()

    o1, o2, (gf1, gw1), (gf2, gw2), mask = jax.tree_util.tree_map(
        np.asarray, run(jnp.asarray(feats), jnp.asarray(w)))
    np.testing.assert_allclose(o2[mask], o1[mask], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gf2[mask], gf1[mask], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gw2, gw1, rtol=1e-3, atol=1e-4)
