import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopa_tpu.ops import voxel


def np_voxelize(coords, batch_idx, valid):
    """Golden numpy reference: unique (b,x,y,z) in lexicographic order."""
    keys = np.stack(
        [batch_idx[valid], coords[valid, 0], coords[valid, 1], coords[valid, 2]], axis=1
    )
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    return uniq, inv


def random_cloud(rng, n, batch=2, scale=64, n_pad=7):
    coords = rng.integers(0, scale, size=(n, 3)).astype(np.int32)
    batch_idx = rng.integers(0, batch, size=(n,)).astype(np.int32)
    valid = np.ones(n, bool)
    if n_pad:
        coords = np.concatenate([coords, np.zeros((n_pad, 3), np.int32)])
        batch_idx = np.concatenate([batch_idx, np.zeros(n_pad, np.int32)])
        valid = np.concatenate([valid, np.zeros(n_pad, bool)])
    return coords, batch_idx, valid


def test_voxelize_matches_numpy_unique():
    rng = np.random.default_rng(0)
    coords, batch_idx, valid = random_cloud(rng, 500, batch=3, scale=16)
    table, inverse, counts = jax.jit(voxel.voxelize)(coords, batch_idx, valid)
    t_batch, t_coords, inverse, counts = map(np.asarray, (table.batch, table.coords, inverse, counts))

    uniq, np_inv = np_voxelize(coords, batch_idx, valid)
    num = int(table.num)
    assert num == uniq.shape[0]

    got = np.concatenate([t_batch[:num][:, None], t_coords[:num]], axis=1)
    np.testing.assert_array_equal(got, uniq)

    # inverse map consistency: every valid point maps to its own voxel coords
    inv = inverse
    assert np.all(inv[valid] >= 0)
    assert np.all(inv[~valid] == -1)
    np.testing.assert_array_equal(t_coords[inv[valid]], coords[valid])
    np.testing.assert_array_equal(t_batch[inv[valid]], batch_idx[valid])

    # counts
    np_counts = np.bincount(np_inv, minlength=num)
    np.testing.assert_array_equal(counts[:num], np_counts)
    assert int(counts[num:].sum()) == 0


def test_mean_pooling_and_unpool():
    coords = np.array([[1, 1, 1], [1, 1, 1], [2, 2, 2], [0, 0, 0]], np.int32)
    batch_idx = np.zeros(4, np.int32)
    valid = np.array([True, True, True, False])
    feats = np.array([[2.0], [4.0], [10.0], [99.0]], np.float32)
    @jax.jit
    def run(feats):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        pooled = voxel.pool_features(feats, inverse, counts, table.capacity)
        return table.num, pooled, voxel.unpool_features(pooled, inverse)

    num, pooled, unpooled = run(jnp.asarray(feats))
    pooled, unpooled = np.asarray(pooled), np.asarray(unpooled)
    assert int(num) == 2
    # voxel order is lexicographic: (1,1,1) then (2,2,2)
    np.testing.assert_allclose(pooled[:2, 0], [3.0, 10.0])
    # padding point contributed nothing
    np.testing.assert_allclose(unpooled[:, 0], [3.0, 3.0, 10.0, 0.0])


def test_lookup_hits_and_misses():
    rng = np.random.default_rng(1)
    coords, batch_idx, valid = random_cloud(rng, 300, batch=2, scale=32)
    @jax.jit
    def run():
        table, _, _ = voxel.voxelize(coords, batch_idx, valid)
        # every stored voxel must be found at its own slot (full-capacity query;
        # padding slots are invalid queries)
        q = voxel.lookup(table, table.coords, table.batch, table.valid_mask())
        miss_coords = jnp.full((5, 3), 1000, jnp.int32)
        q2 = voxel.lookup(table, miss_coords, jnp.zeros(5, jnp.int32), jnp.ones(5, bool))
        q3 = voxel.lookup(table, jnp.array([[-1, 0, 0]], jnp.int32),
                          jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
        q4 = voxel.lookup(table, table.coords[:1], table.batch[:1], jnp.zeros(1, bool))
        return table.num, q, q2, q3, q4

    num, q, q2, q3, q4 = map(np.asarray, run())
    num = int(num)
    np.testing.assert_array_equal(q[:num], np.arange(num))
    assert np.all(q[num:] == -1)
    assert np.all(q2 == -1)
    assert int(q3[0]) == -1
    assert int(q4[0]) == -1


def test_downsample_coords():
    coords = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]], np.int32)
    batch_idx = np.zeros(4, np.int32)
    valid = np.ones(4, bool)
    @jax.jit
    def run():
        table, _, _ = voxel.voxelize(coords, batch_idx, valid)
        return voxel.downsample_coords(table, capacity=4)

    ctable, p2c = run()
    assert int(ctable.num) == 2
    np.testing.assert_array_equal(np.asarray(ctable.coords)[:2], [[0, 0, 0], [1, 1, 1]])
    np.testing.assert_array_equal(np.asarray(p2c)[:4], [0, 0, 1, 1])


def test_voxelize_empty():
    coords = np.zeros((8, 3), np.int32)
    @jax.jit
    def run():
        table, inverse, counts = voxel.voxelize(coords, jnp.zeros(8, jnp.int32),
                                                jnp.zeros(8, bool))
        # lookup into an empty table must not crash or false-hit
        q = voxel.lookup(table, coords[:2], jnp.zeros(2, jnp.int32), jnp.ones(2, bool))
        return table.num, inverse, counts, q

    num, inverse, counts, q = map(np.asarray, run())
    assert int(num) == 0
    assert np.all(inverse == -1)
    assert int(counts.sum()) == 0
    assert np.all(q == -1)


def test_voxelize_under_jit_and_grad_through_pooling():
    rng = np.random.default_rng(2)
    coords, batch_idx, valid = random_cloud(rng, 100, scale=8)
    feats = rng.normal(size=(coords.shape[0], 4)).astype(np.float32)

    def f(feats):
        table, inverse, counts = voxel.voxelize(coords, batch_idx, valid)
        pooled = voxel.pool_features(feats, inverse, counts, table.capacity)
        return jnp.sum(voxel.unpool_features(pooled, inverse) ** 2)

    g = jax.jit(jax.grad(f))(feats)
    assert np.all(np.isfinite(np.asarray(g)))
    # padding rows receive zero grad
    assert np.allclose(np.asarray(g)[~valid], 0.0)


def test_hash_lookup_matches_merge_lookup():
    """Open-addressing hash probe returns exactly the sort-merge's results
    (hits, misses, invalid queries)."""
    import jax

    rng = np.random.default_rng(11)
    n = 3000
    coords = rng.integers(0, 32, (n, 3)).astype(np.int32)
    batch = rng.integers(0, 3, n).astype(np.int32)
    valid = rng.random(n) > 0.1

    @jax.jit
    def run():
        table, _, _ = voxel.voxelize(jnp.asarray(coords), jnp.asarray(batch),
                                     jnp.asarray(valid))
        ht = voxel.build_hash(table)
        # queries: half real neighbours, half random (mostly misses)
        q_coords = jnp.concatenate([
            table.coords + jnp.asarray([1, 0, 0]),
            jnp.asarray(rng.integers(0, 64, (n, 3)).astype(np.int32))])
        q_batch = jnp.concatenate([
            table.batch, jnp.asarray(rng.integers(0, 4, n).astype(np.int32))])
        q_valid = jnp.concatenate([table.valid_mask(),
                                   jnp.asarray(rng.random(n) > 0.2)])
        q_hi, q_lo = voxel.pack_keys(q_coords, q_batch, q_valid)
        want = voxel.merge_lookup(table, q_hi, q_lo, q_valid)
        got = voxel.hash_lookup(table, ht, q_hi, q_lo, q_valid)
        return want, got, ht.n_unplaced

    want, got, unplaced = map(np.asarray, run())
    assert int(unplaced) == 0
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_batched_plan_matches_monolithic_unet_outputs():
    """Per-sample batched plan building + concat_plans produce the same
    per-point SparseUNet outputs as the monolithic plan (slot ids permute,
    semantics identical)."""
    import jax

    from mopa_tpu.models.scn_unet import (SparseUNet, build_unet_plan,
                                          build_unet_plan_batched,
                                          capacity_schedule, concat_plans)

    rng = np.random.default_rng(5)
    s, p, levels = 3, 500, 3
    coords = rng.integers(0, 48, (s, p, 3)).astype(np.int32)
    valid = rng.random((s, p)) > 0.2
    feats = rng.normal(size=(s * p, 1)).astype(np.float32)
    batch_idx = np.repeat(np.arange(s, dtype=np.int32), p)

    model = SparseUNet(m=4, num_planes=levels, full_scale=48)

    # overflow-free capacities so both paths keep every voxel (random dense
    # clouds do not collapse 2x per level like real scans)
    caps = capacity_schedule(p, levels, factors=(1.0,) * levels, floor=128)

    @jax.jit
    def run():
        mono = build_unet_plan(
            jnp.asarray(coords.reshape(-1, 3)), jnp.asarray(batch_idx),
            jnp.asarray(valid.reshape(-1)), levels,
            capacities=[s * c for c in caps])
        batched = build_unet_plan_batched(
            jnp.asarray(coords), jnp.asarray(valid), levels, capacities=caps)
        # also exercise concat_plans: [first 2 samples] + [last sample]
        part1 = build_unet_plan_batched(
            jnp.asarray(coords[:2]), jnp.asarray(valid[:2]), levels,
            capacities=caps)
        part2 = build_unet_plan_batched(
            jnp.asarray(coords[2:]), jnp.asarray(valid[2:]), levels,
            capacities=caps)
        stitched = concat_plans([part1, part2])
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               mono, train=False)
        outs = [model.apply(variables, jnp.asarray(feats), pl, train=False)
                for pl in (mono, batched, stitched)]
        return outs

    o_mono, o_batched, o_stitched = map(np.asarray, run())
    pv = valid.reshape(-1)
    np.testing.assert_allclose(o_batched[pv], o_mono[pv], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(o_stitched[pv], o_mono[pv], rtol=1e-4,
                               atol=1e-4)


def test_merge_lookup_presorted_matches_merge_lookup():
    """merge_lookup_presorted (per-offset shifted-key merge) must agree with
    merge_lookup for constant-shift query streams, including coordinate
    border wraps (masked) and PAD tails."""
    from mopa_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(11)
    offs_np = sc.kernel_offsets(3)
    for trial, (lo, hi) in enumerate([(0, 24), (0, 4), (4090, 4096)]):
        n = 512
        coords = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
        pvalid = rng.random(n) > 0.15
        table, _, _ = voxel.voxelize(jnp.asarray(coords),
                                     jnp.zeros(n, jnp.int32),
                                     jnp.asarray(pvalid), capacity=n)
        valid = np.asarray(table.valid_mask())
        for j in (0, 4, 12):  # a dx offset, a dy offset, the dz offset
            dx, dy, dz = (int(v) for v in offs_np[j])
            q_hi = np.where(valid, np.asarray(table.key_hi) + dx,
                            np.asarray(voxel.PAD_HI))
            q_lo = np.where(valid, np.asarray(table.key_lo)
                            + dy * voxel.SHIFT + dz, np.asarray(voxel.PAD_HI))
            qc = np.asarray(table.coords) + offs_np[j]
            q_valid = valid & np.all((qc >= 0) & (qc < voxel.SHIFT), axis=-1)
            got = np.asarray(voxel.merge_lookup_presorted(
                table, jnp.asarray(q_hi), jnp.asarray(q_lo),
                jnp.asarray(q_valid)))
            # reference: the exact-match merge on packed query coords
            qb = np.asarray(table.batch)
            ref_hi, ref_lo = voxel.pack_keys(jnp.asarray(qc), jnp.asarray(qb),
                                             jnp.asarray(q_valid))
            want = np.asarray(voxel.merge_lookup(table, ref_hi, ref_lo,
                                                 jnp.asarray(q_valid)))
            np.testing.assert_array_equal(got, want, err_msg=f"{trial}/{j}")


def test_build_submanifold_plan_presorted_method_matches_default():
    from mopa_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(12)
    n = 1024
    coords = rng.integers(0, 20, size=(n, 3)).astype(np.int32)
    pvalid = rng.random(n) > 0.1
    table, _, _ = voxel.voxelize(jnp.asarray(coords), jnp.zeros(n, jnp.int32),
                                 jnp.asarray(pvalid), capacity=n)
    a = np.asarray(sc.build_submanifold_plan(table))
    b = np.asarray(sc.build_submanifold_plan(table, method="presorted"))
    np.testing.assert_array_equal(a, b)


def test_voxelize_presorted_matches_sorted_input():
    """voxelize(presorted=True) on voxel-key-sorted input (the train-loader
    contract) must equal the sorting path exactly — table, inverse, counts."""
    rng = np.random.default_rng(13)
    n = 800
    coords = rng.integers(0, 30, size=(n, 3)).astype(np.int32)
    valid = rng.random(n) > 0.2
    key = ((coords[:, 0].astype(np.int64) * 4096 + coords[:, 1]) * 4096
           + coords[:, 2])
    key[~valid] = np.iinfo(np.int64).max  # padding rows last
    perm = np.argsort(key, kind="stable")
    sc, sv = coords[perm], valid[perm]

    t0, inv0, cnt0 = voxel.voxelize(jnp.asarray(sc), jnp.zeros(n, jnp.int32),
                                    jnp.asarray(sv), capacity=n)
    t1, inv1, cnt1 = voxel.voxelize(jnp.asarray(sc), jnp.zeros(n, jnp.int32),
                                    jnp.asarray(sv), capacity=n,
                                    presorted=True)
    np.testing.assert_array_equal(np.asarray(t0.key_hi), np.asarray(t1.key_hi))
    np.testing.assert_array_equal(np.asarray(t0.key_lo), np.asarray(t1.key_lo))
    np.testing.assert_array_equal(np.asarray(t0.coords), np.asarray(t1.coords))
    np.testing.assert_array_equal(np.asarray(inv0), np.asarray(inv1))
    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))


def test_collate_sort_points_preserves_alignment():
    """sort_points reorders every per-point array with one permutation and
    remaps ema_map through the ori permutation."""
    from mopa_tpu.data.collate import collate_padded

    rng = np.random.default_rng(14)
    n, n_ori = 120, 150
    sample = {
        "coords": rng.integers(0, 50, (n, 3)).astype(np.int64),
        "feats": rng.normal(size=(n, 1)).astype(np.float32),
        "seg_label": rng.integers(0, 5, n).astype(np.int64),
        "img_indices": rng.integers(0, 30, (n, 2)).astype(np.int64),
        "ori_coords": rng.integers(0, 50, (n_ori, 3)).astype(np.int64),
        "ori_feats": np.ones((n_ori, 1), np.float32),
        "ori_img_indices": rng.integers(0, 30, (n_ori, 2)).astype(np.int64),
        "ema_map": rng.integers(-1, n_ori, n).astype(np.int32),
        "ori_img": np.zeros((4, 4, 3), np.float32),
        "img": np.zeros((4, 4, 3), np.float32),
        "lidar_path": "x", "scan_pth": "x",
    }
    p = 256
    plain = collate_padded([dict(sample)], p)
    srt = collate_padded([dict(sample)], p, sort_points=True)

    # per-point pairs (coords, label, feats, img_indices) are the same SET
    def rows(batch):
        pv = batch["point_valid"].reshape(-1)
        return {tuple(np.concatenate([
            batch["coords"][i], [batch["seg_label"][i]],
            batch["img_indices"][0, i]]).tolist())
            for i in range(p) if pv[i]}
    assert rows(plain) == rows(srt)
    # coords now sorted by voxel key within the valid prefix
    nvalid = int(srt["num_points"][0])
    c = srt["coords"][:nvalid].astype(np.int64)
    key = (c[:, 0] * 4096 + c[:, 1]) * 4096 + c[:, 2]
    assert np.all(np.diff(key) >= 0)
    # ema_map still points at the SAME ori point (same ori coords row)
    em_p = plain["ema_map"][0]
    em_s = srt["ema_map"][0]
    oc_p = plain["ori_coords"].reshape(-1, 3)
    oc_s = srt["ori_coords"].reshape(-1, 3)
    # match student rows between the two batches via their coord+label tuple
    def sig(batch, i):
        return tuple(np.concatenate([
            batch["coords"][i], [batch["seg_label"][i]],
            batch["img_indices"][0, i]]).tolist())
    lookup = {sig(srt, i): i for i in range(nvalid)}
    for i in range(int(plain["num_points"][0])):
        j = lookup[sig(plain, i)]
        if em_p[i] >= 0 and em_p[i] < n_ori:
            assert em_s[j] >= 0
            np.testing.assert_array_equal(oc_p[em_p[i]], oc_s[em_s[j]])
        # (a -1 stays -1 up to ori-budget truncation differences)


def test_pool_features_sorted_matches_scatter():
    """pool_features_sorted (segmented scan + end gather, scatter-free) ==
    pool_features (colliding scatter-add) on both the perm (unsorted input)
    and identity (presorted input) layouts, values and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mopa_tpu.ops import voxel as V

    rng = np.random.default_rng(3)
    n, cap = 600, 256
    coords = rng.integers(0, 8, (n, 3)).astype(np.int32)
    valid = rng.random(n) < 0.9
    batch = np.zeros(n, np.int32)
    feats = rng.normal(size=(n, 5)).astype(np.float32)

    t, inv, cnt, perm = V.voxelize(jnp.asarray(coords), jnp.asarray(batch),
                                   jnp.asarray(valid), cap, return_perm=True)
    ends = jnp.cumsum(cnt) - 1
    for mode in ("mean", "sum"):
        ref = V.pool_features(jnp.asarray(feats), inv, cnt, cap, mode=mode)
        new = V.pool_features_sorted(jnp.asarray(feats), inv, cnt, ends,
                                     perm, cap, mode)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   rtol=3e-6, atol=3e-6, err_msg=mode)

    def l_old(f):
        return jnp.sum(V.pool_features(f, inv, cnt, cap) ** 2)

    def l_new(f):
        return jnp.sum(V.pool_features_sorted(f, inv, cnt, ends, perm,
                                              cap) ** 2)

    g1 = jax.grad(l_old)(jnp.asarray(feats))
    g2 = jax.grad(l_new)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=3e-5,
                               atol=3e-6)

    # presorted layout: identity perm (None)
    key = (coords[:, 0].astype(np.int64) * 4096
           + coords[:, 1]) * 4096 + coords[:, 2]
    order = np.argsort(np.where(valid, key, 2 ** 62), kind="stable")
    t2, inv2, cnt2 = V.voxelize(jnp.asarray(coords[order]),
                                jnp.asarray(batch),
                                jnp.asarray(valid[order]), cap,
                                presorted=True)
    ends2 = jnp.cumsum(cnt2) - 1
    ref2 = V.pool_features(jnp.asarray(feats[order]), inv2, cnt2, cap)
    new2 = V.pool_features_sorted(jnp.asarray(feats[order]), inv2, cnt2,
                                  ends2, None, cap)
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(new2),
                               rtol=3e-6, atol=3e-6)
