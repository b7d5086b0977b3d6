"""3D submanifold sparse-conv UNet, TPU-native.

Re-design of the reference 3D backbone (``mopa/models/scn_unet.py:9-34``):
``scn.InputLayer(3, full_scale, mode=4)`` → ``scn.SubmanifoldConvolution(1, m,
3)`` → ``scn.UNet(3, block_reps=1, planes=[m, 2m, ..., 7m])`` →
``scn.BatchNormReLU(m)`` → ``scn.OutputLayer(3)``.

The recursive ``scn.UNet`` layer graph (VGG-style, reps=1, non-residual) is::

    U(l):  BNLeakyReLU(p_l) -> SubConv(p_l -> p_l)                 # block
           if l+1 < L:
               skip = x
               BNLeakyReLU(p_l)   -> Convolution(p_l -> p_{l+1}, k2 s2)
               U(l+1)
               BNLeakyReLU(p_{l+1}) -> Deconvolution(p_{l+1} -> p_l, k2 s2)
               x = concat([skip, up])
               BNLeakyReLU(2 p_l) -> SubConv(2 p_l -> p_l)          # fuse

All irregular structure (voxel tables, neighbour maps, down/up maps) is
precomputed once per batch into a :class:`UNetPlan` — a pure function of the
input coordinates — and shared by the forward *and* backward pass. The flax
module then runs only gather-GEMM-scatter compute with static shapes.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mopa_tpu.ops import sparse_conv as sc
from mopa_tpu.ops import voxel as voxel_ops


class LevelPlan(NamedTuple):
    nbr: jax.Array | None   # (V_l, 27) exact neighbour map (legacy path)
    valid: jax.Array        # (V_l,) active-slot mask
    # transition from the previous (finer) level; level 0 holds point maps
    down_nbr: jax.Array | None   # (V_l, 8) coarse->fine gather map (None at l=0)
    f2c: jax.Array | None        # (V_{l-1},) fine->coarse map (None at l=0)
    up_off: jax.Array | None     # (V_{l-1},) kernel-offset idx for deconv
    dom: jax.Array | None = None  # (V_l,) BN-domain id (fused multi-forward)
    # wide-column plans. Preferred: the z-dense form (ranks into a z-padded
    # slot table + p2a active-slot map — sparse_conv.ZPlan; window reads are
    # dz-aligned by construction). Legacy: (ranks, sel) — sparse_conv.WidePlan.
    ranks: jax.Array | None = None  # (V_l * 9,)
    sel: jax.Array | None = None    # (V_l * 9,) packed dz codes (legacy only)
    p2a: jax.Array | None = None    # (Vp_l,) z-dense only


def apply_submanifold(x, lv: LevelPlan, weight, groups=None):
    """Submanifold conv through whichever plan form the level carries.

    ``groups`` (static tuple of (n_samples, cap) table segments) routes the
    conv through the fused Pallas kernel (TPU.PALLAS_CONV); narrow stems
    (Cin < 8) and non-wide plans fall back to the XLA paths.
    """
    if (groups is not None and lv.ranks is not None and lv.p2a is None
            and lv.sel is not None and weight.shape[1] >= 8):
        from mopa_tpu.ops import sparse_conv_pallas as scp

        assert sum(ns * cap for ns, cap in groups) == lv.valid.shape[0], \
            "plan_groups disagree with the level table layout"
        return scp.submanifold_conv_grouped(x, lv.ranks, lv.sel, weight,
                                            groups)
    if lv.p2a is not None:
        return sc.submanifold_conv_zdense(x, sc.ZPlan(lv.ranks, lv.p2a),
                                          weight)
    if lv.ranks is not None:
        return sc.submanifold_conv_wide(x, sc.WidePlan(lv.ranks, lv.sel),
                                        weight)
    return sc.submanifold_conv(x, lv.nbr, weight)


class UNetPlan(NamedTuple):
    levels: tuple
    point_inverse: jax.Array   # (N,) point -> level-0 slot (-1 padding)
    point_counts: jax.Array    # (V_0,)
    num_voxels: jax.Array      # (L,) active voxel counts, diagnostics/overflow
    # scatter-free input pooling (voxel.pool_features_sorted): position of
    # each voxel's LAST point in run order, and run-order -> original-point
    # permutation (None = original order is already run-contiguous, e.g.
    # host-presorted batches). point_end None = legacy scatter pooling.
    point_end: jax.Array | None = None   # (V_0,)
    point_perm: jax.Array | None = None  # (N,)


# Per-level capacity as a fraction of the point budget. Measured on
# LiDAR-geometry scans (ring-structured ground + dense objects, 16k budget):
# true occupancy [0.72, 0.56, 0.39, 0.20, 0.07, 0.025, 0.009] of the budget —
# submanifold tables shrink SLOWLY at fine levels (surfaces stay resolved)
# then collapse; a geometric 0.5 shrink silently overflowed levels 1-3.
# Factors carry ~15-25% headroom; overflow is still counted in
# ``UNetPlan.num_voxels`` vs capacity.
# Sized to hold the TRUE per-level unique-voxel counts of LiDAR-geometry
# scans at the 16,384-point budget (round-4 audit: measured max
# [14173, 12493, 10187, 6343, 2252, 699, 240] over 8x64 scans, + ~8-10%
# headroom). The round-3 schedule was tuned against the plan builder's
# CLAMPED counts — the clamp cascades into coarser levels, so levels 1-5
# still silently dropped up to 35% of active voxels (a lexicographic,
# spatially-biased amputation). bench.py's voxel_occupancy_max audits this
# against builder-independent true counts on every run.
CAP_FACTORS = (0.95, 0.82, 0.67, 0.42, 0.15, 0.047, 0.017)


def capacity_schedule(n_points: int, num_levels: int,
                      factors=None, floor: int = 128) -> List[int]:
    """Static per-level voxel capacities (fractions of the point budget)."""
    if factors is None:
        factors = CAP_FACTORS
    factors = list(factors)
    while len(factors) < num_levels:  # extend geometrically past the table
        factors.append(factors[-1] * 0.5)
    return [max(int(n_points * factors[l]), floor)
            for l in range(num_levels)]


def build_unet_plan_batched(coords, valid, num_levels: int,
                            capacities: Sequence[int] | None = None,
                            sample_domains=None,
                            presorted: bool = False) -> UNetPlan:
    """Per-sample plan building, merged into one flat plan.

    The monolithic plan sorts ~14 V keys per level; at fused-batch sizes
    (hundreds of thousands of voxels) those sorts spill far out of VMEM and
    dominate the step (measured ~0.5 s at 3x8x16k). Voxel tables never cross
    samples (the batch index rides in the key), so the same plan decomposes
    exactly into S independent per-sample plans whose ~230k-key sorts stay
    VMEM-resident — built here with ONE vmapped (batched) sort per level and
    stitched together by adding per-sample slot offsets.

    Args:
        coords: (S, P, 3) int32 per-sample coordinates.
        valid: (S, P) bool.
        sample_domains: optional (S,) int32 BN-domain id per sample.

    Returns a UNetPlan whose flat arrays are layout-compatible with
    :func:`build_unet_plan` on the flattened batch (level-l capacity
    S * cap_l, slots ordered sample-major).
    """
    s, p = valid.shape
    if capacities is None:
        capacities = capacity_schedule(p, num_levels, floor=128)
    capacities = [int(c) for c in capacities]

    def one(c, v, sid):
        # the sample id rides in the key's batch field so stitched tables
        # have globally unique, sample-major-sorted keys (window reads that
        # cross a sample boundary can then never false-match)
        sid_batch = jnp.full((p,), sid, jnp.int32)
        table, inverse, counts, perm = voxel_ops.voxelize(
            c, sid_batch, v, capacities[0], presorted=presorted,
            return_perm=True)
        # per-voxel last-point position in run (sorted) order — runs are
        # contiguous from 0 (valid points sort first), so ends come from the
        # counts alone (voxel.pool_features_sorted)
        end_pos = jnp.cumsum(counts) - 1
        levels = []
        nums = []
        prev = table
        pending = (None, None, None)
        for l in range(num_levels):
            nums.append(prev.num)
            # exact neighbour merge (sorts batch well under vmap), then
            # (ranks, sel) derived elementwise — no gathers anywhere.
            # NOTE: the z-dense variant (sparse_conv.build_zplan — padded
            # slot tables that eliminate the conv-time dz realignment)
            # measured WORSE on both axes at production shapes (plan 478 vs
            # 90 ms, fwd 131 vs 91 ms at 8x16k): its union/compaction sorts
            # triple the plan sort volume and the 5x-padded feats_w
            # materialisation outweighs the align savings. Kept golden-tested
            # for smaller/denser regimes.
            wide = sc.build_wide_plan(prev)
            levels.append((wide.ranks, wide.sel, prev.valid_mask(),
                           pending[0], pending[1], pending[2]))
            if l + 1 < num_levels:
                coarse, f2c = voxel_ops.downsample_coords(prev,
                                                          capacities[l + 1])
                up_off = sc.up_offset_index(prev)
                down_nbr = sc.down_plan_from_f2c(f2c, up_off,
                                                 prev.valid_mask(),
                                                 capacities[l + 1])
                pending = (down_nbr, f2c, up_off)
                prev = coarse
        return levels, inverse, counts, jnp.stack(nums), end_pos, perm

    levels_b, inverse_b, counts_b, nums_b, ends_b, perm_b = jax.vmap(one)(
        coords, valid, jnp.arange(s, dtype=jnp.int32))

    def offset_flat(arr, cap, sentinel_to=-1):
        """(S, cap[, K]) slot-index array -> flat global-slot array.
        Negative entries stay ``sentinel_to``; offsets are value-space."""
        off = (jnp.arange(s, dtype=jnp.int32) * cap).reshape(
            (s,) + (1,) * (arr.ndim - 1))
        out = jnp.where(arr >= 0, arr + off, sentinel_to)
        return out.reshape((s * arr.shape[1],) + arr.shape[2:])

    levels = []
    for l in range(num_levels):
        ranks_b, sel_b, valid_l, down_b, f2c_b, up_b = levels_b[l]
        dom = None
        if sample_domains is not None:
            dom = jnp.repeat(jnp.asarray(sample_domains, jnp.int32),
                             capacities[l])
        # ranks are table positions; the all-miss sentinel (== capacity)
        # lands on the next sample's first row after offsetting — harmless,
        # its sel rows are already 3 (invalid)
        levels.append(LevelPlan(
            nbr=None,
            valid=valid_l.reshape(-1),
            down_nbr=(offset_flat(down_b, capacities[l - 1])
                      if down_b is not None else None),
            f2c=(offset_flat(f2c_b, capacities[l])
                 if f2c_b is not None else None),
            up_off=(up_b.reshape(-1) if up_b is not None else None),
            dom=dom,
            ranks=offset_flat(ranks_b, capacities[l]),
            sel=sel_b.reshape(-1),
        ))
    # point-space (not slot-space) offsets for the pooling run positions
    poff = (jnp.arange(s, dtype=jnp.int32) * p)[:, None]
    return UNetPlan(levels=tuple(levels),
                    point_inverse=offset_flat(inverse_b, capacities[0]),
                    point_counts=counts_b.reshape(-1),
                    num_voxels=jnp.sum(nums_b, axis=0),
                    point_end=(ends_b + poff).reshape(-1),
                    point_perm=(None if presorted
                                else (perm_b + poff).reshape(-1)))


HOST_PLAN_KEYS = ("rankn", "ebits", "cbits", "downn", "downe", "f2c",
                  "upoffn", "inverse", "counts", "nums", "fix")


def plan_from_host_arrays(arrs, capacities, num_levels: int,
                          sample_domains=None) -> UNetPlan:
    """Decode loader-shipped DELTA-COMPRESSED plan arrays (wire format v3,
    ``native/mopa_loader.cpp::mopa_build_plan3`` via ``collate_padded``'s
    ``hp_*`` keys) into a UNetPlan bit-identical to
    :func:`build_unet_plan_batched`'s output for the same samples.

    Per-column rank sequences and per-octant down maps are monotone (sorted
    query keys merged into sorted tables), so the wire carries 4-BIT deltas
    (73% zeros, 99.2% <= 14 measured; misses hold the previous value — their
    gathered rows are dead, masked by the dz-select codes) integrated back
    here with one cumsum per level; deltas > 14 saturate to 15 and arrive as
    (position, excess) fixups scatter-added first. The CENTER xy-column is
    not on the wire at all: a voxel is always its own dz=0 neighbour and its
    dz=-1 neighbour, when present, is the immediately preceding table row,
    so rank = slot - e0. dz-select codes are recomputed from 27 packed
    existence bits per voxel; per-level valid masks from the kept-voxel
    counts. ``f2c`` stays absolute (component-wise halving does not preserve
    lexicographic order, so it is NOT monotone); octants ride as nibbles.
    Net: ~56% fewer plan bytes over the host->device link (the tunnel link
    is the e2e bottleneck) for a few cheap in-graph passes.
    """
    capacities = [int(c) for c in capacities]
    nibs = {}
    for key in ("rankn", "downn", "upoffn"):
        packed = jnp.asarray(arrs[key])
        lo = (packed & 15).astype(jnp.int32)
        hi = (packed >> 4).astype(jnp.int32)
        nibs[key] = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    s = nibs["rankn"].shape[0]
    sum1 = sum(capacities)
    sum8r = sum1 * 8
    sum8d = sum(capacities[1:]) * 8
    f2c_b = jnp.asarray(arrs["f2c"]).astype(jnp.int32)

    def apply_fixups(deltas, base, length):
        """Scatter-add the packed (pos << 11 | excess) fixups that land in
        [base, base + length) of the virtual unpacked [rankn|downn] space.
        Excesses > 2047 arrive as several same-pos entries; the add sums."""
        fix = jnp.asarray(arrs["fix"]).astype(jnp.int32)  # (S, F)
        pos, extra = fix >> 11, fix & 2047
        local = pos - base
        ok = (fix >= 0) & (local >= 0) & (local < length)
        soff = (jnp.arange(s, dtype=jnp.int32) * length)[:, None]
        flat_pos = jnp.where(ok, local + soff, 0)
        flat = deltas.astype(jnp.int32).reshape(-1)
        return flat.at[flat_pos.reshape(-1)].add(
            jnp.where(ok, extra, 0).reshape(-1)).reshape(s, length)

    rank_deltas = apply_fixups(nibs["rankn"][:, :sum8r], 0, sum8r)
    down_deltas = apply_fixups(nibs["downn"][:, :sum8d], sum8r, sum8d)
    eb = jnp.asarray(arrs["ebits"]).astype(jnp.int32)  # (S, sum1*3) bytes
    w24 = (eb[:, 0::3] | (eb[:, 1::3] << 8) | (eb[:, 2::3] << 16))
    cb = jnp.asarray(arrs["cbits"]).astype(jnp.int32)
    cbit_all = ((cb[:, :, None] >> jnp.arange(8, dtype=jnp.int32)) & 1
                ).reshape(s, -1)
    upoff_b = nibs["upoffn"]
    downe = jnp.asarray(arrs["downe"]).astype(jnp.int32)
    nums_b = jnp.asarray(arrs["nums"]).astype(jnp.int32)  # (S, L)

    def soff(cap):
        return (jnp.arange(s, dtype=jnp.int32) * cap).reshape(s, 1, 1)

    levels = []
    o8r = o1 = o8 = of = oe = oc = 0
    for l in range(num_levels):
        cap = capacities[l]
        w = w24[:, o1:o1 + cap, None]
        r8 = jnp.cumsum(
            rank_deltas[:, o8r:o8r + cap * 8].reshape(s, cap, 8), axis=1)
        # center column: the voxel itself is its dz=0 neighbour; its dz=-1
        # neighbour, when it exists (the cbits bit), is the immediately
        # preceding table row (lexicographic keys differ by exactly 1), and
        # its dz=+1 bit is the NEXT row's dz=-1 bit
        ncb = ((cap + 7) // 8) * 8
        e0c = cbit_all[:, oc:oc + ncb][:, :cap]
        center = jnp.arange(cap, dtype=jnp.int32)[None, :] - e0c
        ranks = jnp.concatenate(
            [r8[:, :, :4], center[:, :, None], r8[:, :, 4:]], axis=2)
        ranks = (ranks + soff(cap)).reshape(-1)
        valid2 = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                  < nums_b[:, l][:, None])
        # dz-select codes from the three per-column existence bits (matches
        # the e0/e1/e2 -> t formulas of sparse_conv.wide_from_nbr)
        shifts = 3 * jnp.arange(8, dtype=jnp.int32)
        e0n = ((w >> shifts) & 1) == 1
        e1n = ((w >> (shifts + 1)) & 1) == 1
        e2n = ((w >> (shifts + 2)) & 1) == 1

        def ins(nc, c):
            return jnp.concatenate([nc[:, :, :4], c[:, :, None], nc[:, :, 4:]],
                                   axis=2)

        e0 = ins(e0n, e0c == 1)
        e1 = ins(e1n, valid2)
        e2 = ins(e2n, jnp.pad(e0c, ((0, 0), (0, 1)))[:, 1:] == 1)
        t0 = jnp.where(e0, 0, jnp.where(e1, 1, jnp.where(e2, 2, 3)))
        t1 = jnp.where(e0 & e1, 1, jnp.where((e0 | e1) & e2, 2, 3))
        t2 = jnp.where(e0 & e1 & e2, 2, 3)
        sel = (t0 + t1 * 4 + t2 * 16).reshape(-1)
        valid_l = valid2.reshape(-1)
        down = f2c = upoff = None
        if l >= 1:
            capf = capacities[l - 1]
            dloc = jnp.cumsum(
                down_deltas[:, o8:o8 + cap * 8].reshape(s, cap, 8), axis=1)
            de = downe[:, oe:oe + cap, None]
            dok = ((de >> jnp.arange(8, dtype=jnp.int32)) & 1) == 1
            down = jnp.where(dok, dloc + soff(capf), -1).reshape(-1, 8)
            fv = f2c_b[:, of:of + capf]
            f2c = jnp.where(fv >= 0,
                            fv + soff(cap).reshape(s, 1), -1).reshape(-1)
            upoff = upoff_b[:, of:of + capf].reshape(-1)
            o8 += cap * 8
            of += capf
            oe += cap
        dom = None
        if sample_domains is not None:
            dom = jnp.repeat(jnp.asarray(sample_domains, jnp.int32), cap)
        levels.append(LevelPlan(nbr=None, valid=valid_l, down_nbr=down,
                                f2c=f2c, up_off=upoff, dom=dom,
                                ranks=ranks, sel=sel))
        o8r += cap * 8
        o1 += cap
        oc += ncb
    cap0 = capacities[0]
    inv = jnp.asarray(arrs["inverse"]).astype(jnp.int32)
    ioff = (jnp.arange(s, dtype=jnp.int32) * cap0).reshape(s, 1)
    inverse = jnp.where(inv >= 0, inv + ioff, -1).reshape(-1)
    counts_b2 = jnp.asarray(arrs["counts"]).astype(jnp.int32)  # (S, cap0)
    nums = jnp.sum(nums_b, axis=0)
    # host-presorted batches: each voxel's points are one contiguous run in
    # point order, so the scatter-free pooling end positions come from the
    # per-sample counts alone (+ the sample's point-space base)
    p_pts = inv.shape[1]
    poff = (jnp.arange(s, dtype=jnp.int32) * p_pts)[:, None]
    point_end = (jnp.cumsum(counts_b2, axis=1) - 1 + poff).reshape(-1)
    return UNetPlan(levels=tuple(levels), point_inverse=inverse,
                    point_counts=counts_b2.reshape(-1), num_voxels=nums,
                    point_end=point_end, point_perm=None)


def build_unet_plan(coords: jax.Array, batch_idx: jax.Array, valid: jax.Array,
                    num_levels: int, capacities: Sequence[int] | None = None,
                    batch_domains=None) -> UNetPlan:
    """Build all tables and maps for one batch. jit-compatible, int32 only.

    ``batch_domains``: optional host int32 array mapping batch index -> BN
    domain id, for fusing several independent forwards (src/trg/VGI) into one
    (see ``sparse_conv.batch_norm_act`` domain mode). None = single domain.
    """
    n = coords.shape[0]
    if capacities is None:
        capacities = capacity_schedule(n, num_levels)
    if batch_domains is not None:
        batch_domains = jnp.asarray(batch_domains, jnp.int32)
    table, inverse, counts = voxel_ops.voxelize(coords, batch_idx, valid,
                                                capacities[0])
    levels = []
    nums = []
    prev = table
    pending = (None, None, None)  # (down_nbr, f2c, up_off) feeding this level
    for l in range(num_levels):
        nums.append(prev.num)
        dom = None
        if batch_domains is not None:
            dom = batch_domains[jnp.clip(prev.batch, 0,
                                         batch_domains.shape[0] - 1)]
        levels.append(
            LevelPlan(nbr=sc.build_submanifold_plan(prev), valid=prev.valid_mask(),
                      down_nbr=pending[0], f2c=pending[1], up_off=pending[2],
                      dom=dom)
        )
        if l + 1 < num_levels:
            coarse, f2c = voxel_ops.downsample_coords(prev, capacities[l + 1])
            up_off = sc.up_offset_index(prev)
            down_nbr = sc.down_plan_from_f2c(f2c, up_off, prev.valid_mask(),
                                             capacities[l + 1])
            pending = (down_nbr, f2c, up_off)
            prev = coarse
    return UNetPlan(levels=tuple(levels), point_inverse=inverse,
                    point_counts=counts, num_voxels=jnp.stack(nums))


def concat_plans(plans: Sequence[UNetPlan]) -> UNetPlan:
    """Concatenate flat plans (same level count) into one, shifting slot and
    point indices by the preceding plans' capacities. Used to fuse plan
    groups of different per-sample sizes (src/trg vs the VGI cat batch) into
    one multi-domain forward."""
    num_levels = len(plans[0].levels)

    def shifted(arrs, strides):
        """Concat index arrays, adding cumulative value-space offsets."""
        out, off = [], 0
        for a, stride in zip(arrs, strides):
            out.append(jnp.where(a >= 0, a + off, -1))
            off += stride
        return jnp.concatenate(out)

    levels = []
    for l in range(num_levels):
        caps = [p.levels[l].valid.shape[0] for p in plans]
        lv = [p.levels[l] for p in plans]
        if l == 0:
            down = f2c = up = None
        else:
            fine_caps = [p.levels[l - 1].valid.shape[0] for p in plans]
            down = shifted([x.down_nbr for x in lv], fine_caps)
            f2c = shifted([x.f2c for x in lv], caps)
            up = jnp.concatenate([x.up_off for x in lv])
        dom = (jnp.concatenate([x.dom for x in lv])
               if lv[0].dom is not None else None)
        if lv[0].p2a is not None:
            # z-dense: ranks live in padded-slot space (per-plan sentinel ==
            # that plan's padded size, mapped to the joint sentinel); p2a
            # values live in active-slot space
            vps = [x.p2a.shape[0] for x in lv]
            total_vp = sum(vps)
            r_parts, p_parts = [], []
            off_vp = off_cap = 0
            for x, vp_i, cap_i in zip(lv, vps, caps):
                r_parts.append(jnp.where(x.ranks < vp_i, x.ranks + off_vp,
                                         total_vp))
                p_parts.append(jnp.where(x.p2a >= 0, x.p2a + off_cap, -1))
                off_vp += vp_i
                off_cap += cap_i
            ranks = jnp.concatenate(r_parts)
            p2a = jnp.concatenate(p_parts)
        else:
            ranks = (shifted([x.ranks for x in lv], caps)
                     if lv[0].ranks is not None else None)
            p2a = None
        levels.append(LevelPlan(
            nbr=(shifted([x.nbr for x in lv], caps)
                 if lv[0].nbr is not None else None),
            valid=jnp.concatenate([x.valid for x in lv]),
            down_nbr=down, f2c=f2c, up_off=up, dom=dom,
            ranks=ranks,
            sel=(jnp.concatenate([x.sel for x in lv])
                 if lv[0].sel is not None else None),
            p2a=p2a))
    cap0 = [p.levels[0].valid.shape[0] for p in plans]
    npts = [p.point_inverse.shape[0] for p in plans]
    have_end = all(p.point_end is not None for p in plans)
    if have_end:
        # point-space offsets; a plan with no explicit perm contributes the
        # identity over its own point range
        point_end = shifted([p.point_end for p in plans], npts)
        if any(p.point_perm is not None for p in plans):
            parts, off = [], 0
            for p, n in zip(plans, npts):
                perm = (jnp.arange(n, dtype=jnp.int32)
                        if p.point_perm is None else p.point_perm)
                parts.append(perm + off)
                off += n
            point_perm = jnp.concatenate(parts)
        else:
            point_perm = None
    else:
        point_end = point_perm = None
    return UNetPlan(
        levels=tuple(levels),
        point_inverse=shifted([p.point_inverse for p in plans], cap0),
        point_counts=jnp.concatenate([p.point_counts for p in plans]),
        num_voxels=sum(p.num_voxels for p in plans),
        point_end=point_end, point_perm=point_perm)


class _BN(nn.Module):
    """Masked BatchNorm(+LeakyReLU) over active voxels with running stats."""

    features: int
    leakiness: float = 0.0
    act: bool = True
    momentum: float = 0.9
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, valid, train: bool, dom=None, n_domains: int = 1):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        st = sc.BNState(ra_mean.value, ra_var.value)
        out, new_st = sc.batch_norm_act(
            x, valid, scale, bias, st, training=train, momentum=self.momentum,
            eps=self.eps, leakiness=self.leakiness, act=self.act,
            dom=dom, n_domains=n_domains)
        if train and not self.is_initializing():
            ra_mean.value = new_st.running_mean
            ra_var.value = new_st.running_var
        return out


def _conv_init(key, shape, dtype=jnp.float32):
    """SCN-style init: normal with std sqrt(2 / (kernel_volume * fan_in))."""
    k, cin, _ = shape
    std = (2.0 / (k * cin)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class SparseUNet(nn.Module):
    """The scn.UNet stack (stem conv + recursive UNet + final BNReLU)."""

    in_channels: int = 1
    m: int = 16
    num_planes: int = 7
    block_reps: int = 1
    residual_blocks: bool = False
    full_scale: int = 4096
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.m

    @nn.compact
    def __call__(self, point_feats: jax.Array, plan: UNetPlan,
                 train: bool = False, n_domains: int = 1, plan_groups=None):
        assert not self.residual_blocks, "shipped configs use VGG-style blocks"
        assert self.block_reps == 1, "shipped configs use block_reps=1"
        planes = [(i + 1) * self.m for i in range(self.num_planes)]
        cdt = self.compute_dtype

        def groups_at(l):
            """Static (n_samples, cap_l) segments for level l's flat table
            (``plan_groups`` carries per-group capacity schedules)."""
            if plan_groups is None:
                return None
            return tuple((ns, caps[l]) for ns, caps in plan_groups)

        # InputLayer mode=4: mean-pool duplicate points into level-0 voxels
        # (scatter-free segmented-scan path when the plan carries run ends)
        cap0 = plan.levels[0].valid.shape[0]
        if plan.point_end is not None:
            x = voxel_ops.pool_features_sorted(
                point_feats.astype(cdt), plan.point_inverse,
                plan.point_counts, plan.point_end, plan.point_perm, cap0)
        else:
            x = voxel_ops.pool_features(point_feats.astype(cdt),
                                        plan.point_inverse,
                                        plan.point_counts, cap0)

        # stem: SubmanifoldConvolution(in_channels -> m), no bias (ref :27)
        w_stem = self.param("stem", _conv_init, (27, self.in_channels, self.m))
        x = apply_submanifold(x, plan.levels[0], w_stem, groups_at(0))

        x = self._level(0, x, plan, planes, train, n_domains, groups_at)

        x = _BN(self.m, leakiness=0.0, act=True, name="final_bn")(
            x, plan.levels[0].valid, train, plan.levels[0].dom, n_domains)

        # OutputLayer: voxel -> point unmapping
        return voxel_ops.unpool_features(x, plan.point_inverse)

    def _level(self, l: int, x, plan: UNetPlan, planes, train: bool,
               n_domains: int, groups_at=lambda l: None):
        p = planes[l]
        lv = plan.levels[l]
        # block: BNLeakyReLU -> SubConv(p -> p)
        x = _BN(p, name=f"l{l}_bn1")(x, lv.valid, train, lv.dom, n_domains)
        w1 = self.param(f"l{l}_conv1", _conv_init, (27, p, p))
        x = apply_submanifold(x, lv, w1, groups_at(l))

        if l + 1 < len(planes):
            q = planes[l + 1]
            nxt = plan.levels[l + 1]
            skip = x
            # down: BNLeakyReLU -> Convolution(p -> q, k2 s2)
            y = _BN(p, name=f"l{l}_bn_down")(x, lv.valid, train, lv.dom,
                                             n_domains)
            w_down = self.param(f"l{l}_down", _conv_init, (8, p, q))
            y = sc.strided_conv(y, nxt.down_nbr, w_down, f2c=nxt.f2c,
                                up_off=nxt.up_off, fine_valid=lv.valid)

            y = self._level(l + 1, y, plan, planes, train, n_domains,
                            groups_at)

            # up: BNLeakyReLU -> Deconvolution(q -> p, k2 s2)
            y = _BN(q, name=f"l{l}_bn_up")(y, nxt.valid, train, nxt.dom,
                                           n_domains)
            w_up = self.param(f"l{l}_up", _conv_init, (8, q, p))
            y = sc.deconv(y, nxt.f2c, nxt.up_off, w_up, lv.valid,
                          down_nbr=nxt.down_nbr)

            # join + fuse: BNLeakyReLU(2p) -> SubConv(2p -> p)
            x = jnp.concatenate([skip, y], axis=-1)
            x = _BN(2 * p, name=f"l{l}_bn2")(x, lv.valid, train, lv.dom,
                                             n_domains)
            w2 = self.param(f"l{l}_conv2", _conv_init, (27, 2 * p, p))
            x = apply_submanifold(x, lv, w2, groups_at(l))
        return x
