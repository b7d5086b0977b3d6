"""Sparse convolution primitives: gather-GEMM-scatter over voxel hash tables.

TPU-native replacement for SparseConvNet's CUDA kernels (reference 3D backbone
``mopa/models/scn_unet.py:25-30``):

* ``SubmanifoldConvolution(dim, a, b, 3, False)`` → :func:`submanifold_conv`
  over a per-level neighbour map (V, 27).
* ``Convolution(dim, a, b, 2, 2, False)`` (stride-2 down) → :func:`strided_conv`
  over a coarse→fine gather map (Vc, 8).
* ``Deconvolution(dim, a, b, 2, 2, False)`` → :func:`deconv` through the
  fine→coarse map plus per-site kernel offsets.
* ``BatchNormLeakyReLU`` / ``BatchNormReLU`` → :func:`batch_norm_act`, masked
  so padding slots never pollute batch statistics.

Everything is static-shaped, jit-compatible and autodiff-friendly (gathers
differentiate to scatter-adds). The neighbour maps depend only on voxel
coordinates, so they are built once per batch ("plan") and shared by every
conv at that level — including the backward pass.

Weight layout: ``(K, Cin, Cout)`` with K = kernel volume. Kernel offsets are
enumerated lexicographically with dx slowest, dz fastest (documented for the
torch checkpoint import shim in ``mopa_tpu.models.torch_compat``).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mopa_tpu.ops import voxel as voxel_ops


def kernel_offsets(kernel_size: int = 3) -> np.ndarray:
    """All (dx, dy, dz) offsets, dx slowest / dz fastest; int32 (K, 3)."""
    r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    return np.asarray(list(itertools.product(r, r, r)), dtype=np.int32)


def build_submanifold_plan(table: voxel_ops.VoxelTable, kernel_size: int = 3,
                           ht: "voxel_ops.HashTable | None" = None,
                           method: str = "merge") -> jax.Array:
    """Neighbour map for a submanifold conv: (V, K) slot indices, -1 = miss.

    Active output sites == active input sites (the submanifold property).

    Only the FIRST half of the kernel offsets is resolved by sort-merge
    lookup: for a fixed offset o the match u -> v (key(v) == key(u) + o) is
    injective, so the map for -o is its transpose — one collision-free
    scatter per half-offset instead of another merge. The centre offset is
    the identity. This halves the dominant per-level merge sort (14V keys
    instead of 27V).
    """
    # NOTE: a z-adjacency variant (one rank query per (dx, dy) column, 3x
    # smaller merge sort, candidate-window key compares) measured SLOWER on
    # v5e than the direct merge — the per-query candidate gathers cost more
    # than the larger sort saves. The transpose trick below has no per-query
    # gathers, only one flat scatter. Likewise an open-addressing hash probe
    # (``voxel.build_hash``/``hash_lookup``, pass via ``ht=``) measured 1.4x
    # slower at fused-batch sizes: 12 probe rounds of random HBM gathers lose
    # to the streaming sort. The winning lever is building plans PER SAMPLE
    # (VMEM-resident sorts) — see ``scn_unet.build_unet_plan_batched``.
    offs_np = kernel_offsets(kernel_size)  # (K, 3), dz fastest; offs[K-1-k] == -offs[k]
    k = offs_np.shape[0]
    half = k // 2
    offs = jnp.asarray(offs_np[:half])
    v = table.capacity
    valid = table.valid_mask()
    if method == "presorted" and ht is None:  # measured dead end — see NOTE
        # Per-offset shifted-key merges: each offset's query stream is the
        # table's keys plus a constant (monotone — stays sorted; PAD slots
        # keep PAD keys and stay at the tail), so the 27-offset build
        # decomposes into 13 VMEM-sized 2V merges with a shift-compare hit
        # rule. The SORTS are 2.1x faster than the monolithic 14V sort
        # (27.6 vs 57.9 ms at V=16k, S=8) — but the 13 per-offset
        # scatter-backs under the sample vmap are ruinous (the whole plan
        # build measured 183.8 vs 74.8 ms end-to-end), so the monolithic
        # merge below stays the default. Kept (with golden tests) as the
        # scaffold for a future scatter-free readout.
        d_hi = jnp.asarray(offs_np[:half, 0])                     # (13,)
        d_lo = jnp.asarray(offs_np[:half, 1] * voxel_ops.SHIFT
                           + offs_np[:half, 2])
        q_hi = jnp.where(valid[None, :], table.key_hi[None, :] + d_hi[:, None],
                         voxel_ops.PAD_HI)
        q_lo = jnp.where(valid[None, :], table.key_lo[None, :] + d_lo[:, None],
                         voxel_ops.PAD_HI)
        qc = table.coords[None, :, :] + offs[:, None, :]          # (13, V, 3)
        q_valid = valid[None, :] & jnp.all(
            (qc >= 0) & (qc < voxel_ops.SHIFT), axis=-1)
        nbr_half = jax.vmap(
            lambda h, l, m: voxel_ops.merge_lookup_presorted(table, h, l, m)
        )(q_hi, q_lo, q_valid).T                                  # (V, 13)
    else:
        q_coords = (table.coords[:, None, :] + offs[None, :, :]).reshape(
            v * half, 3)
        in_range = jnp.all((q_coords >= 0) & (q_coords < voxel_ops.SHIFT),
                           axis=-1)
        q_valid = jnp.repeat(valid, half) & in_range
        q_batch = jnp.repeat(table.batch, half)
        q_hi, q_lo = voxel_ops.pack_keys(q_coords, q_batch, q_valid)
        if ht is not None:
            nbr_half = voxel_ops.hash_lookup(table, ht, q_hi, q_lo,
                                             q_valid).reshape(v, half)
        else:
            nbr_half = voxel_ops.merge_lookup(table, q_hi, q_lo,
                                              q_valid).reshape(v, half)

    slots = jnp.arange(v, dtype=jnp.int32)
    centre = jnp.where(valid, slots, -1)
    # second half by transposition: nbr[u, j] = w  =>  nbr[w, k-1-j] = u.
    # The scatter is collision-free (u -> u+o is injective); misses land in
    # the trailing dump slot.
    hit = nbr_half >= 0
    flat_tgt = jnp.where(
        hit, nbr_half * half + (half - 1 - jnp.arange(half, dtype=jnp.int32))[None, :],
        v * half)
    u_src = jnp.broadcast_to(slots[:, None], (v, half))
    nbr_mirror = jnp.full((v * half + 1,), -1, jnp.int32).at[
        flat_tgt.reshape(-1)].set(u_src.reshape(-1))[:-1].reshape(v, half)
    return jnp.concatenate([nbr_half, centre[:, None], nbr_mirror], axis=1)


class WidePlan(NamedTuple):
    """Wide-column submanifold plan: one lower-bound rank per (dx, dy) column
    instead of 27 exact neighbour slots.

    TPU gathers are RATE-bound (per-row cost): 27 V narrow row-gathers per
    conv measured 2.4x slower than 9 V triple-width rows of the same total
    bytes. Keys sort z-fastest, so for each (dx, dy) column the (up to) three
    dz in {-1, 0, 1} neighbours occupy CONSECUTIVE table rows starting at the
    lower bound of key(x+dx, y+dy, z-1); the conv gathers one (3 Cin)-wide
    row per column from a shift-packed feature array and realigns dz slots
    with a tiny plan-time permutation (ranks/sel derive elementwise from the
    exact neighbour merge — see :func:`wide_from_nbr`).

    All arrays are FLAT 1-D: small trailing dims ((V, 9) / (V, 9, 3)) would
    be tile-padded to (.., 128) on TPU, inflating memory ~14x.

    Attributes:
        ranks: (V*9,) int32 lower-bound table positions, v-major then column
            (columns enumerate (dx, dy) with dx slowest; column 4 = centre).
            capacity == all-miss sentinel.
        sel: (V*9,) int32 packed dz codes: bits [2j, 2j+2) hold the dz slot
            (0..2) of gathered row j, 3 = invalid.
    """

    ranks: jax.Array
    sel: jax.Array


WIDE_COLS = np.asarray([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                       dtype=np.int32)  # (9, 2)


def wide_from_nbr(nbr: jax.Array, capacity: int | None = None) -> WidePlan:
    """Derive the wide plan from the exact (V, 27) neighbour map — pure
    elementwise math, ZERO gathers (gathering candidate keys at the ranks
    measured ~85 ms/step; the exact map comes from the same merge sort).

    A column's existing dz candidates occupy CONSECUTIVE table rows (keys
    are consecutive integers in a sorted unique table), so the window start
    is the smallest existing slot and sel is the sorted order of existing
    dz's.
    """
    v = nbr.shape[0] if capacity is None else capacity
    ranks_cols = []
    code_cols = []
    for c in range(9):
        s0, s1, s2 = nbr[:, 3 * c], nbr[:, 3 * c + 1], nbr[:, 3 * c + 2]
        e0, e1, e2 = s0 >= 0, s1 >= 0, s2 >= 0
        r = jnp.where(e0, s0, jnp.where(e1, s1, jnp.where(e2, s2, v)))
        t0 = jnp.where(e0, 0, jnp.where(e1, 1, jnp.where(e2, 2, 3)))
        t1 = jnp.where(e0 & e1, 1, jnp.where((e0 | e1) & e2, 2, 3))
        t2 = jnp.where(e0 & e1 & e2, 2, 3)
        ranks_cols.append(r)
        code_cols.append(t0 + (t1 << 2) + (t2 << 4))
    ranks = jnp.stack(ranks_cols, axis=1).reshape(-1)
    sel = jnp.stack(code_cols, axis=1).reshape(-1)
    return WidePlan(ranks=ranks, sel=sel)


def build_wide_plan(table: voxel_ops.VoxelTable) -> WidePlan:
    """Build the wide-column plan (see :class:`WidePlan`)."""
    return wide_from_nbr(build_submanifold_plan(table), table.capacity)


class ZPlan(NamedTuple):
    """z-dense wide-column plan: window reads are dz-aligned BY CONSTRUCTION.

    The level's voxel table is z-padded (``voxel.build_padded_ztable``) so
    that for every queried column window, the keys (z-1, z, z+1) are all
    present as consecutive padded slots (inactive ones read zero features).
    The conv then needs NO per-window dz realignment — the 6 masked adds of
    the :class:`WidePlan` path (on lane-padded narrow arrays) disappear;
    the only extra work is scattering active features into the padded slots
    (one ``Vp``-row take per conv).

    Attributes:
        ranks: (V*9,) int32 padded-slot window starts, v-major then column
            (columns enumerate (dx, dy), dx slowest; column 4 = centre).
            ``Vp`` = all-miss sentinel (reads dedicated zero rows).
        p2a: (Vp,) int32 active-table slot per padded slot, -1 = zero slot.
    """

    ranks: jax.Array
    p2a: jax.Array


def zplan_from_nbr(nbr: jax.Array, pz: "voxel_ops.PaddedZTable") -> ZPlan:
    """Derive the z-dense plan from the exact (V, 27) neighbour map.

    The window start for column c of voxel v is the padded slot of key
    (x+dx, y+dy, z-1): if the dz=-1 neighbour is active it is ``a2p`` of it;
    else if dz=0 (or dz=+1) is active, the z-1 slot sits exactly 1 (or 2)
    below its ``a2p`` slot (the padded table contains every key within +-2
    of an active key, and keys are consecutive integers). Columns with no
    active window voxel get the zero-window sentinel ``Vp``.
    """
    v = nbr.shape[0]
    vp = pz.capacity
    ap = pz.a2p[jnp.clip(nbr, 0, v - 1).reshape(-1)].reshape(nbr.shape)
    cols = []
    for c in range(9):
        s0, s1, s2 = nbr[:, 3 * c], nbr[:, 3 * c + 1], nbr[:, 3 * c + 2]
        a0, a1, a2 = ap[:, 3 * c], ap[:, 3 * c + 1], ap[:, 3 * c + 2]
        start = jnp.where(s0 >= 0, a0,
                          jnp.where(s1 >= 0, a1 - 1,
                                    jnp.where(s2 >= 0, a2 - 2, vp)))
        cols.append(start)
    return ZPlan(ranks=jnp.stack(cols, axis=1).reshape(-1), p2a=pz.p2a)


def build_zplan(table: voxel_ops.VoxelTable,
                pad_capacity: int | None = None) -> ZPlan:
    """Build the z-dense plan DIRECTLY from the padded key table — one
    column-start merge replaces both the 27-neighbour merge and the
    a2p/searchsorted readout of :func:`zplan_from_nbr`.

    For column (dx, dy) of voxel v, the window-start query is the key
    (x+dx, y+dy, z-1) in the padded table's private packing. A hit is a
    valid window iff the two FOLLOWING padded slots hold exactly the keys
    z and z+1 (verified with one key gather at ``slot + 2`` — sorted unique
    keys make the middle row automatic). A consecutive all-padding window
    reads zero features and is harmless; a non-consecutive hit (padding from
    a voxel 2-3 z-steps away, active voxels beyond the window) must be
    masked to the zero-window sentinel or it would misplace features.
    """
    v = table.capacity
    vp = 5 * v if pad_capacity is None else int(pad_capacity)
    pz = voxel_ops.build_padded_ztable_keys(table, vp)
    valid = table.valid_mask()
    zbase = voxel_ops.SHIFT + 8
    base_lo = (table.coords[:, 1].astype(jnp.int32) * zbase
               + table.coords[:, 2] + 4)
    d_hi = jnp.asarray(WIDE_COLS[:, 0])                  # (9,) dx
    d_lo = jnp.asarray(WIDE_COLS[:, 1]) * zbase - 1      # (9,) dy*zbase + dz
    q_hi = jnp.where(valid[:, None], table.key_hi[:, None] + d_hi[None, :],
                     voxel_ops.PAD_HI)
    q_lo = jnp.where(valid[:, None], base_lo[:, None] + d_lo[None, :],
                     voxel_ops.PAD_HI)
    qc_x = table.coords[:, 0:1] + jnp.asarray(WIDE_COLS[:, 0])[None, :]
    qc_y = table.coords[:, 1:2] + jnp.asarray(WIDE_COLS[:, 1])[None, :]
    q_valid = (valid[:, None] & (qc_x >= 0) & (qc_x < voxel_ops.SHIFT)
               & (qc_y >= 0) & (qc_y < voxel_ops.SHIFT))
    slots = voxel_ops.merge_lookup_keys(
        pz.key_hi, pz.key_lo, q_hi.reshape(-1), q_lo.reshape(-1),
        q_valid.reshape(-1))
    probe = jnp.clip(slots + 2, 0, vp - 1)
    ok = ((slots >= 0) & (pz.key_hi[probe] == q_hi.reshape(-1))
          & (pz.key_lo[probe] == q_lo.reshape(-1) + 2))
    ranks = jnp.where(ok, slots, vp)
    return ZPlan(ranks=ranks, p2a=pz.p2a)


def _zdense_fwd_impl(feats, weight, plan: ZPlan):
    k, cin, cout = weight.shape
    v = plan.ranks.shape[0] // 9
    vp = plan.p2a.shape[0]
    # scatter-free placement of active features into padded slots
    feats_pad = _masked_take(feats, plan.p2a)              # (Vp, C)
    zero = jnp.zeros((3, cin), feats.dtype)
    fp = jnp.concatenate([feats_pad, zero])                # (Vp+3, C)
    feats_w = jnp.concatenate([fp[:vp + 1], fp[1:vp + 2], fp[2:vp + 3]],
                              axis=1)                      # (Vp+1, 3C)
    g = feats_w[jnp.clip(plan.ranks, 0, vp)]               # (V*9, 3C)
    aligned = g.reshape(v, 27 * cin)                       # dz-ordered already
    w2d = weight.reshape(k * cin, cout).astype(feats.dtype)
    return jnp.dot(aligned, w2d, preferred_element_type=feats.dtype), aligned


@jax.custom_vjp
def _submanifold_conv_zdense(feats, weight, ranks, p2a):
    out, _ = _zdense_fwd_impl(feats, weight, ZPlan(ranks, p2a))
    return out


def _zdense_fwd(feats, weight, ranks, p2a):
    out, _ = _zdense_fwd_impl(feats, weight, ZPlan(ranks, p2a))
    # rematerialise the (V, 27C) gathered array in the backward instead of
    # saving it: ~14 convs x (V, 27C) residuals dominated step HBM (OOM at
    # batch 8 with honest capacities); the re-gather is one fused take
    return out, (feats, weight, ranks, p2a)


def _zdense_bwd(res, g):
    """Scatter-free: d_feats is the SAME z-dense conv of the cotangent with
    mirrored, transposed weights (submanifold symmetry — see _wide_bwd)."""
    feats, weight, ranks, p2a = res
    k, cin, cout = weight.shape
    g = g.astype(feats.dtype)
    _, aligned = _zdense_fwd_impl(feats, weight, ZPlan(ranks, p2a))
    d_w = jnp.dot(aligned.T, g, preferred_element_type=jnp.float32)
    d_w = d_w.reshape(k, cin, cout).astype(weight.dtype)
    w_bwd = jnp.transpose(weight[::-1], (0, 2, 1))  # (K, Cout, Cin)
    d_feats, _ = _zdense_fwd_impl(g, w_bwd, ZPlan(ranks, p2a))
    return d_feats.astype(feats.dtype), d_w, None, None


_submanifold_conv_zdense.defvjp(_zdense_fwd, _zdense_bwd)


def submanifold_conv_zdense(feats: jax.Array, plan: ZPlan,
                            weight: jax.Array) -> jax.Array:
    """Submanifold conv through a :class:`ZPlan` (numerically identical to
    :func:`submanifold_conv` over the exact neighbour map)."""
    return _submanifold_conv_zdense(feats, weight, plan.ranks, plan.p2a)


def _wide_gather_align(feats: jax.Array, plan: WidePlan) -> jax.Array:
    """8 triple-width row gathers + dz realignment -> (V, 27*Cin) in the
    kernel_offsets layout (dx slowest, dz fastest). 2-D shapes throughout —
    (V, 9, 3, C) temps would be tile-padded ~14x on TPU.

    The CENTRE column (dx=dy=0) never gathers: its window rows are always
    ``v-1, v, v+1`` in the active table (a voxel is its own dz=0 neighbour,
    and z-adjacent keys are consecutive table rows), so its 3C block is
    three C-wide masked SHIFTS of the feature array — gathers are per-ROW
    rate-bound on TPU, so dropping 1 of 9 columns cuts conv gather rows by
    11% in both the forward and the cotangent backward."""
    v = plan.ranks.shape[0] // 9
    cin = feats.shape[1]
    ranks8, sel8, sel_c = _drop_centre_col(plan, v)
    # NOTE: a flat-operand overlapping slice gather (slice_sizes=(3C,) at
    # starts ranks*C, eliminating this windowed-concat materialisation)
    # reproducibly CRASHED the v5e TPU worker at production shapes — keep
    # the (V+1, 3C) shifted-concat form.
    zero = jnp.zeros((2, cin), feats.dtype)
    fp = jnp.concatenate([feats, zero])
    feats_w = jnp.concatenate([fp[:v], fp[1:v + 1], fp[2:v + 2]], axis=1)
    g = feats_w[jnp.clip(ranks8, 0, v - 1)]          # (V*8, 3C)
    # per-row dz slots of the three gathered rows
    t0 = sel8 & 3
    t1 = (sel8 >> 2) & 3
    t2 = (sel8 >> 4) & 3
    # dz slot t can only be fed by gathered subrow j <= t (window codes are
    # strictly increasing: t_j >= j). Group the 6 (t, j) pairs by the lane
    # shift s = t - j: aligned = m0*g + m1*(g >> C lanes) + m2*(g >> 2C) —
    # three FULL-WIDTH masked adds XLA fuses into one pass, instead of six
    # C-wide ops on lane-padded narrow slices (measured ~108 ms/step).
    sh1 = jnp.pad(g[:, :2 * cin], ((0, 0), (cin, 0)))        # subrow j -> j+1
    sh2 = jnp.pad(g[:, :cin], ((0, 0), (2 * cin, 0)))        # subrow j -> j+2
    # masks as pure rank-2 broadcasts ((V8, 1) codes x (1, 3C) lane slots) so
    # XLA keeps them virtual inside the fusion — stacked/repeated mask arrays
    # materialised (V9, 3, C) temps and OOM'd at batch 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * cin), 1) // cin
    t0c, t1c, t2c = t0[:, None], t1[:, None], t2[:, None]
    m0 = jnp.where(lane == 0, t0c == 0, jnp.where(lane == 1, t1c == 1,
                                                  t2c == 2))
    m1 = jnp.where(lane == 1, t0c == 1,
                   jnp.where(lane == 2, t1c == 2, False))
    m2 = (lane == 2) & (t0c == 2)
    dt = feats.dtype
    aligned8 = (m0.astype(dt) * g + m1.astype(dt) * sh1
                + m2.astype(dt) * sh2).reshape(v, 24 * cin)
    # centre 3C block from shifts: [e_prev*f[v-1], e_mid*f[v], e_next*f[v+1]]
    tc0 = sel_c & 3
    e_prev = (tc0 == 0)[:, None].astype(dt)
    e_mid = (tc0 < 2)[:, None].astype(dt)          # dz=0 present iff v valid
    e_next = ((((sel_c >> 2) & 3) == 2)
              | (((sel_c >> 4) & 3) == 2))[:, None].astype(dt)
    prev = jnp.concatenate([zero[:1], feats[:v - 1]])
    nxt = fp[1:v + 1]
    centre = jnp.concatenate([e_prev * prev, e_mid * feats[:v],
                              e_next * nxt], axis=1)
    return jnp.concatenate([aligned8[:, :12 * cin], centre,
                            aligned8[:, 12 * cin:]], axis=1)


def _drop_centre_col(plan: WidePlan, v: int):
    """Split the flat v-major (V*9,) plan arrays into the 8 gathered columns
    and the centre column's sel codes."""
    r = plan.ranks.reshape(v, 9)
    s = plan.sel.reshape(v, 9)
    ranks8 = jnp.concatenate([r[:, :4], r[:, 5:]], axis=1).reshape(v * 8)
    sel8 = jnp.concatenate([s[:, :4], s[:, 5:]], axis=1).reshape(v * 8)
    return ranks8, sel8, s[:, 4]


# XLA's row-gather rate on this TPU is ~400 M rows/s for rows NARROWER than
# 128 lanes and cliffs ~5x to ~64-81 M rows/s at >= 128 lanes (measured,
# GATHER_FLOOR_r05.json; a cliff, not a per-vreg slope). Gathers whose rows
# would cross the cliff are split into sub-limit lane chunks that are
# consumed SEPARATELY (per-dz-subrow masked adds + per-slot GEMMs summed in
# f32) — concatenating the chunk gathers back together lets XLA re-fuse them
# into one slow wide gather (measured: chunked+concat is SLOWER than
# monolithic, chunked+separate-consumers is ~2.8x faster). Set
# MOPA_CHUNK_GATHER=0 to force the monolithic path (A/B lever).
import os as _os

_GATHER_LANE_LIMIT = 112
_CHUNK_GATHER = _os.environ.get("MOPA_CHUNK_GATHER", "1") != "0"


def _wide_conv_chunked(x, weight, ranks8, ts, sel_c, v):
    """dot(aligned(x), weight) without materialising the (V, 27C) aligned
    array and with every gather row under the 128-lane cliff.

    x: (V, C) table; weight: (27, C, D) in kernel_offsets order; ranks8:
    (V*8,) gathered-column ranks; ts: per-row dz-slot codes (t0, t1, t2);
    sel_c: (V,) centre-column codes. Returns (V, D) f32-accumulated.
    The per-slot GEMM reshape works because (V*8, cw) rows are v-major with
    the 8 gathered columns consecutive: A_t.reshape(v, 8*cw) lays out
    [col0 | col1 | ... | col7] exactly matching the stacked per-column
    weight rows."""
    c = x.shape[1]
    d = weight.shape[2]
    dt = x.dtype
    idx = jnp.clip(ranks8, 0, v - 1)
    fp = jnp.concatenate([x, jnp.zeros((2, c), dt)])
    # gathered col position p -> kernel column (p < 4 ? p : p + 1)
    wcols = jnp.concatenate([weight[:4 * 3].reshape(4, 3, c, d),
                             weight[5 * 3:].reshape(4, 3, c, d)], axis=0)
    nsub = -(-c // _GATHER_LANE_LIMIT)
    bounds = [round(i * c / nsub) for i in range(nsub + 1)]
    out = jnp.zeros((v, d), jnp.float32)
    for s in range(nsub):
        a, b = bounds[s], bounds[s + 1]
        fs = fp[:, a:b]
        g = [fs[idx + j] for j in range(3)]      # 3 sub-limit row gathers
        for t in range(3):
            acc = None
            for j in range(t + 1):               # code t_j >= j always
                m = (ts[j] == t)[:, None].astype(dt)
                acc = m * g[j] if acc is None else acc + m * g[j]
            A = acc.reshape(v, 8 * (b - a))
            wt = wcols[:, t, a:b, :].reshape(8 * (b - a), d).astype(dt)
            out = out + jnp.dot(A, wt, preferred_element_type=jnp.float32)
    # centre column (kernel col 4): three C-wide masked shifts, no gathers
    tc0 = sel_c & 3
    e_prev = (tc0 == 0)[:, None].astype(dt)
    e_mid = (tc0 < 2)[:, None].astype(dt)
    e_next = ((((sel_c >> 2) & 3) == 2)
              | (((sel_c >> 4) & 3) == 2))[:, None].astype(dt)
    prev = jnp.concatenate([jnp.zeros((1, c), dt), x[:v - 1]])
    nxt = fp[1:v + 1]
    wc = weight[4 * 3:5 * 3]                     # (3, C, D)
    for blk, wci in ((e_prev * prev, wc[0]), (e_mid * x[:v], wc[1]),
                     (e_next * nxt, wc[2])):
        out = out + jnp.dot(blk, wci.astype(dt),
                            preferred_element_type=jnp.float32)
    return out


def _wide_codes(plan, v):
    ranks8, sel8, sel_c = _drop_centre_col(plan, v)
    ts = (sel8 & 3, (sel8 >> 2) & 3, (sel8 >> 4) & 3)
    return ranks8, ts, sel_c


def _wide_fwd_impl(feats, weight, plan):
    k, cin, cout = weight.shape
    if _CHUNK_GATHER and 3 * cin > 127:
        v = plan.ranks.shape[0] // 9
        ranks8, ts, sel_c = _wide_codes(plan, v)
        out = _wide_conv_chunked(feats, weight, ranks8, ts, sel_c, v)
        return out.astype(feats.dtype), None
    aligned = _wide_gather_align(feats, plan)
    w2d = weight.reshape(k * cin, cout).astype(feats.dtype)
    return jnp.dot(aligned, w2d, preferred_element_type=feats.dtype), aligned


@jax.custom_vjp
def _submanifold_conv_wide(feats, weight, ranks, sel):
    out, _ = _wide_fwd_impl(feats, weight, WidePlan(ranks, sel))
    return out


def _wide_fwd(feats, weight, ranks, sel):
    out, _ = _wide_fwd_impl(feats, weight, WidePlan(ranks, sel))
    # residuals: only the small inputs — the bwd gathers the COTANGENT once
    # and needs neither the (V, 27C) aligned array nor a feats re-gather
    return out, (feats, weight, ranks, sel)


def _wide_bwd(res, g):
    """Scatter-free AND single-gather: d_feats is the SAME wide conv of the
    cotangent with mirrored, transposed weights (u is v's neighbour at o iff
    v is u's at -o and kernel_offsets enumerates symmetrically), and d_w
    reuses THAT aligned cotangent instead of re-gathering the forward input:

        d_w[k] = sum_v feats[nbr(v,k)] g[v]^T            (definition)
               = sum_u feats[u] g[nbr(u, K-1-k)]^T       (mirror substitution)
               = feats^T @ aligned_g[:, block K-1-k]

    so the backward runs ONE window gather+align (of g) where it previously
    ran two (re-gathering feats for d_w was ~1/3 of all step gather time).
    """
    feats, weight, ranks, sel = res
    k, cin, cout = weight.shape
    g = g.astype(feats.dtype)
    if _CHUNK_GATHER and 3 * cout > 127 and cout <= _GATHER_LANE_LIMIT:
        # chunked twin of the monolithic path below: the SAME three
        # sub-limit cotangent gathers feed both d_feats (per-slot GEMMs)
        # and d_w (p assembled from small per-slot GEMM outputs) — one
        # window gather total, every row under the 128-lane cliff.
        v = ranks.shape[0] // 9
        ranks8, ts, sel_c = _wide_codes(WidePlan(ranks, sel), v)
        idx = jnp.clip(ranks8, 0, v - 1)
        dt = g.dtype
        fp = jnp.concatenate([g, jnp.zeros((2, cout), dt)])
        gs = [fp[idx + j] for j in range(3)]           # (V*8, cout) each
        w_bwd = jnp.transpose(weight[::-1], (0, 2, 1))  # (27, cout, cin)
        wcols = jnp.concatenate([w_bwd[:12].reshape(4, 3, cout, cin),
                                 w_bwd[15:].reshape(4, 3, cout, cin)],
                                axis=0)
        d_feats = jnp.zeros((v, cin), jnp.float32)
        p_t = []
        for t in range(3):
            acc = None
            for j in range(t + 1):
                m = (ts[j] == t)[:, None].astype(dt)
                acc = m * gs[j] if acc is None else acc + m * gs[j]
            a_t = acc.reshape(v, 8 * cout)
            wt = wcols[:, t].reshape(8 * cout, cin).astype(dt)
            d_feats = d_feats + jnp.dot(a_t, wt,
                                        preferred_element_type=jnp.float32)
            p_t.append(jnp.dot(feats.T, a_t,
                               preferred_element_type=jnp.float32))
        # centre column: masked shifts of g, no gathers
        tc0 = sel_c & 3
        e_prev = (tc0 == 0)[:, None].astype(dt)
        e_mid = (tc0 < 2)[:, None].astype(dt)
        e_next = ((((sel_c >> 2) & 3) == 2)
                  | (((sel_c >> 4) & 3) == 2))[:, None].astype(dt)
        prev = jnp.concatenate([jnp.zeros((1, cout), dt), g[:v - 1]])
        centre_g = jnp.concatenate([e_prev * prev, e_mid * g[:v],
                                    e_next * fp[1:v + 1]], axis=1)
        d_feats = d_feats + jnp.dot(
            centre_g, w_bwd[12:15].reshape(3 * cout, cin).astype(dt),
            preferred_element_type=jnp.float32)
        p_c = jnp.dot(feats.T, centre_g, preferred_element_type=jnp.float32)
        # assemble p (cin, 27*cout) in aligned-block order b = 3*kc + t
        pieces = []
        for kc in range(9):
            for t in range(3):
                if kc == 4:
                    pieces.append(p_c[:, t * cout:(t + 1) * cout])
                else:
                    c = kc if kc < 4 else kc - 1
                    pieces.append(p_t[t][:, c * cout:(c + 1) * cout])
        p = jnp.concatenate(pieces, axis=1)
        d_w = p.reshape(cin, k, cout)[:, ::-1, :].transpose(1, 0, 2)
        return (d_feats.astype(feats.dtype), d_w.astype(weight.dtype),
                None, None)
    aligned_g = _wide_gather_align(g, WidePlan(ranks, sel))  # (V, 27*Cout)
    w_bwd = jnp.transpose(weight[::-1], (0, 2, 1)).reshape(k * cout, cin)
    d_feats = jnp.dot(aligned_g, w_bwd.astype(g.dtype),
                      preferred_element_type=g.dtype)
    p = jnp.dot(feats.T, aligned_g, preferred_element_type=jnp.float32)
    d_w = p.reshape(cin, k, cout)[:, ::-1, :].transpose(1, 0, 2)
    return d_feats.astype(feats.dtype), d_w.astype(weight.dtype), None, None


_submanifold_conv_wide.defvjp(_wide_fwd, _wide_bwd)


def submanifold_conv_wide(feats: jax.Array, plan: WidePlan,
                          weight: jax.Array) -> jax.Array:
    """Submanifold conv through a :class:`WidePlan` (numerically identical to
    :func:`submanifold_conv` over the exact neighbour map)."""
    return _submanifold_conv_wide(feats, weight, plan.ranks, plan.sel)


def build_down_plan(fine: voxel_ops.VoxelTable, coarse: voxel_ops.VoxelTable) -> jax.Array:
    """Gather map for a size-2/stride-2 convolution: (Vc, 8) fine slots, -1 miss.

    Output site c gathers input sites at ``2*c + o`` for o in {0,1}^3.
    """
    offs = jnp.asarray(
        np.asarray(list(itertools.product((0, 1), repeat=3)), dtype=np.int32)
    )  # (8, 3), dz fastest
    vc = coarse.capacity
    valid = coarse.valid_mask()
    q_coords = (2 * coarse.coords[:, None, :] + offs[None, :, :]).reshape(vc * 8, 3)
    in_range = jnp.all((q_coords >= 0) & (q_coords < voxel_ops.SHIFT), axis=-1)
    q_valid = jnp.repeat(valid, 8) & in_range
    q_batch = jnp.repeat(coarse.batch, 8)
    q_hi, q_lo = voxel_ops.pack_keys(q_coords, q_batch, q_valid)
    nbr = voxel_ops.merge_lookup(fine, q_hi, q_lo, q_valid)
    return nbr.reshape(vc, 8)


def down_plan_from_f2c(f2c: jax.Array, up_off: jax.Array, fine_valid: jax.Array,
                       coarse_capacity: int) -> jax.Array:
    """(Vc, 8) down-conv gather map as the inverse of (f2c, up_off) — one
    collision-free scatter, no sort.

    Each fine site f is the unique input of coarse site f2c[f] at kernel
    offset up_off[f] (``2*c + o`` decomposition is a bijection), so
    ``down_nbr[f2c[f], up_off[f]] = f``. Produces exactly
    :func:`build_down_plan`'s output when f2c came from
    ``voxel.downsample_coords``.
    """
    vc = int(coarse_capacity)
    vf = f2c.shape[0]
    ok = fine_valid & (f2c >= 0)
    flat = jnp.where(ok, f2c * 8 + up_off, vc * 8)
    src = jnp.arange(vf, dtype=jnp.int32)
    return jnp.full((vc * 8 + 1,), -1, jnp.int32).at[flat].set(
        src)[:-1].reshape(vc, 8)


def up_offset_index(fine: voxel_ops.VoxelTable) -> jax.Array:
    """Per fine-site kernel-offset index into the (8, Cin, Cout) deconv weight:
    ``o = 4*(x%2) + 2*(y%2) + (z%2)`` (same dx-slowest order as build_down_plan)."""
    rem = fine.coords % 2
    return rem[:, 0] * 4 + rem[:, 1] * 2 + rem[:, 2]


def _masked_take(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of feats at idx; idx < 0 yields zeros."""
    safe = jnp.clip(idx, 0, feats.shape[0] - 1)
    out = feats[safe]
    return jnp.where((idx >= 0)[:, None], out, 0.0)


def _gather_concat(feats: jax.Array, nbr: jax.Array) -> jax.Array:
    """One fused gather of all K neighbours: (V, K*C).

    A single big take keeps the TPU gather units busy and feeds ONE
    MXU-friendly (V, K*C) x (K*C, Cout) GEMM instead of K skinny ones.
    """
    v, k = nbr.shape
    flat = nbr.reshape(v * k)
    safe = jnp.clip(flat, 0, feats.shape[0] - 1)
    g = feats[safe]
    g = jnp.where((flat >= 0)[:, None], g, 0.0)
    return g.reshape(v, k * feats.shape[1])


def _conv_fwd_impl(feats, weight, nbr):
    k, cin, cout = weight.shape
    gathered = _gather_concat(feats, nbr)  # (V, K*Cin)
    w2d = weight.reshape(k * cin, cout).astype(feats.dtype)
    return jnp.dot(gathered, w2d, preferred_element_type=feats.dtype), gathered


@jax.custom_vjp
def _submanifold_conv(feats, weight, nbr):
    out, _ = _conv_fwd_impl(feats, weight, nbr)
    return out


def _submanifold_fwd(feats, weight, nbr):
    out, _ = _conv_fwd_impl(feats, weight, nbr)
    return out, (feats, weight, nbr)  # gathered rematerialised in bwd


def _submanifold_bwd(res, g):
    """Scatter-free backward.

    The submanifold property (output sites == input sites) makes the conv
    transpose another gather-GEMM over the SAME neighbour map with offsets
    reversed: u is v's neighbour at offset o iff v is u's neighbour at -o,
    and kernel_offsets enumerates symmetrically (offsets[K-1-k] == -offsets[k]).
    XLA scatter-adds with colliding indices serialise on TPU; this avoids
    them entirely.
    """
    feats, weight, nbr = res
    k, cin, cout = weight.shape
    g = g.astype(feats.dtype)
    # d_feats[u] = sum_k g[nbr[u, K-1-k]] @ weight[k]^T
    nbr_rev = nbr[:, ::-1]
    g_gathered = _gather_concat(g, nbr_rev)  # (V, K*Cout), block k mirrored
    w_t = jnp.transpose(weight, (0, 2, 1)).reshape(k * cout, cin)
    d_feats = jnp.dot(g_gathered, w_t.astype(g.dtype),
                      preferred_element_type=feats.dtype)
    # d_w[k] = sum_v feats[nbr(v,k)] g[v]^T = sum_u feats[u] g[nbr(u,K-1-k)]^T
    # = feats^T @ g_gathered block k — reuses the mirrored cotangent gather
    # instead of re-gathering feats (halves backward gather volume)
    p = jnp.dot(feats.T, g_gathered, preferred_element_type=jnp.float32)
    d_w = p.reshape(cin, k, cout).transpose(1, 0, 2).astype(weight.dtype)
    return d_feats.astype(feats.dtype), d_w, None


_submanifold_conv.defvjp(_submanifold_fwd, _submanifold_bwd)


def submanifold_conv(feats: jax.Array, nbr: jax.Array, weight: jax.Array,
                     bias: jax.Array | None = None) -> jax.Array:
    """out[v] = sum_k feats[nbr[v,k]] @ weight[k]  (misses contribute zero).

    feats: (V, Cin); nbr: (V, K); weight: (K, Cin, Cout). Fused gather + one
    GEMM forward; custom scatter-free backward.
    """
    out = _submanifold_conv(feats, weight, nbr)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _down_gather_wide(feats: jax.Array, nbr: jax.Array) -> jax.Array:
    """(Vc, 8) stride-2 gather as 4 DOUBLE-width window reads -> (Vc, 8*C).

    The 8 kernel offsets pair by (dx, dy): offsets 2j / 2j+1 differ only in
    dz, and their fine keys (2x+a, 2y+b, 2z) / (.., 2z+1) are CONSECUTIVE
    integers — adjacent rows of the sorted-unique fine table whenever both
    exist. Gathers are per-row rate-bound on TPU, so one 2C-wide row per
    pair halves the down-conv gather rows. Window starts and existence
    masks derive ELEMENTWISE from the exact (Vc, 8) map — no extra plan
    arrays, no wire changes. Output blocks align with
    ``weight.reshape(8*Cin, Cout)`` (dz-fastest offset order)."""
    vc = nbr.shape[0]
    vf, c = feats.shape
    s0, s1 = nbr[:, 0::2], nbr[:, 1::2]                  # (Vc, 4) dz pairs
    e0, e1 = s0 >= 0, s1 >= 0
    rank = jnp.where(e0, s0, jnp.where(e1, s1, vf)).reshape(vc * 4)
    zero = jnp.zeros((1, c), feats.dtype)
    fp = jnp.concatenate([feats, zero])
    fw = jnp.concatenate([fp[:vf], fp[1:vf + 1]], axis=1)  # (Vf, 2C)
    g = fw[jnp.clip(rank, 0, vf - 1)]                    # (Vc*4, 2C)
    # dz alignment: [e0 ? g[:C] : 0, e0&e1 ? g[C:] : (e1 ? g[:C] : 0)]
    e0f = e0.reshape(vc * 4, 1)
    e1f = e1.reshape(vc * 4, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * c), 1) >= c
    dt = feats.dtype
    m0 = jnp.where(lane, e0f & e1f, e0f).astype(dt)
    m1 = (lane & (~e0f) & e1f).astype(dt)
    sh1 = jnp.pad(g[:, :c], ((0, 0), (c, 0)))            # subrow 0 -> slot 1
    return (m0 * g + m1 * sh1).reshape(vc, 8 * c)


def _down_fwd_impl(fine_feats, weight, down_nbr):
    k, cin, cout = weight.shape
    gathered = _down_gather_wide(fine_feats, down_nbr)   # (Vc, 8*Cin)
    w2d = weight.reshape(k * cin, cout).astype(fine_feats.dtype)
    return jnp.dot(gathered, w2d,
                   preferred_element_type=fine_feats.dtype), gathered


@jax.custom_vjp
def _strided_conv(fine_feats, weight, down_nbr, f2c, up_off, fine_valid):
    out, _ = _down_fwd_impl(fine_feats, weight, down_nbr)
    return out


def _strided_fwd(fine_feats, weight, down_nbr, f2c, up_off, fine_valid):
    out, _ = _down_fwd_impl(fine_feats, weight, down_nbr)
    return out, (fine_feats, weight, down_nbr, f2c, up_off, fine_valid)


def _offset_tiled(x: jax.Array, up_off: jax.Array, k: int,
                  valid: jax.Array | None = None) -> jax.Array:
    """(V, C) -> (V, K*C) with row v's block ``up_off[v]`` holding x[v] and
    the other blocks zero. Turns the per-row kernel-offset weight select of
    deconv / strided-conv-backward into ONE MXU GEMM against the stacked
    (K*C, D) weights: out[v] = sum_o 1[up_off[v]==o] * x[v] @ W[o]. K-times
    the minimal FLOPs, but these GEMMs are tiny and the alternative —
    gathering per-row (C, D) weight slabs and a batched matvec einsum —
    materialises a (V, C, D) temp off the MXU (measured: the einsum path
    dominated deconv time)."""
    c = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k * c), 1) // c
    m = (lane == up_off[:, None]).astype(x.dtype)
    if valid is not None:
        m = m * valid[:, None].astype(x.dtype)
    return m * jnp.tile(x, (1, k))


def _strided_bwd(res, g):
    """d_fine[f] = g[f2c[f]] @ W[up_off[f]]^T — the deconv access pattern,
    again no scatters."""
    fine_feats, weight, down_nbr, f2c, up_off, fine_valid = res
    k, cin, cout = weight.shape
    g = g.astype(fine_feats.dtype)
    gathered = _down_gather_wide(fine_feats, down_nbr)
    d_w = jnp.dot(gathered.T, g, preferred_element_type=jnp.float32)
    d_w = d_w.reshape(k, cin, cout).astype(weight.dtype)
    g_f = _masked_take(g, f2c)  # (Vf, Cout)
    g_t = _offset_tiled(g_f, up_off, k, fine_valid)  # (Vf, K*Cout)
    w_t = jnp.transpose(weight, (0, 2, 1)).reshape(k * cout, cin)
    d_fine = jnp.dot(g_t, w_t.astype(g.dtype), preferred_element_type=g.dtype)
    return d_fine.astype(fine_feats.dtype), d_w, None, None, None, None


_strided_conv.defvjp(_strided_fwd, _strided_bwd)


def strided_conv(fine_feats: jax.Array, down_nbr: jax.Array, weight: jax.Array,
                 f2c: jax.Array = None, up_off: jax.Array = None,
                 fine_valid: jax.Array = None) -> jax.Array:
    """Stride-2 conv: out (Vc, Cout) from fine feats via the (Vc, 8) plan.

    f2c/up_off/fine_valid enable the scatter-free custom backward; when
    omitted, falls back to autodiff through the fused gather (scatter-add)."""
    if f2c is None:
        out, _ = _conv_fwd_impl(fine_feats, weight, down_nbr)
        return out
    return _strided_conv(fine_feats, weight, down_nbr, f2c, up_off, fine_valid)


@jax.custom_vjp
def _deconv(coarse_feats, weight, f2c, up_off, fine_valid, down_nbr):
    k, cin, cout = weight.shape
    gathered = _masked_take(coarse_feats, f2c)  # (Vf, Cin)
    tiled = _offset_tiled(gathered, up_off, k, fine_valid)  # (Vf, K*Cin)
    w2d = weight.reshape(k * cin, cout).astype(gathered.dtype)
    return jnp.dot(tiled, w2d, preferred_element_type=gathered.dtype)


def _deconv_fwd(coarse_feats, weight, f2c, up_off, fine_valid, down_nbr):
    out = _deconv(coarse_feats, weight, f2c, up_off, fine_valid, down_nbr)
    return out, (coarse_feats, weight, f2c, up_off, fine_valid, down_nbr)


def _deconv_bwd(res, g):
    """d_coarse[c] = sum_o g[down_nbr[c,o]] @ W[o]^T (gather-GEMM via the
    down plan); d_W[o] = masked coarse[f2c]^T @ g."""
    coarse_feats, weight, f2c, up_off, fine_valid, down_nbr = res
    k, cin, cout = weight.shape
    g = jnp.where(fine_valid[:, None], g, 0.0).astype(coarse_feats.dtype)
    g_gathered = _down_gather_wide(g, down_nbr)  # (Vc, K*Cout)
    w_t = jnp.transpose(weight, (0, 2, 1)).reshape(k * cout, cin)
    d_coarse = jnp.dot(g_gathered, w_t.astype(g.dtype),
                       preferred_element_type=coarse_feats.dtype)
    # d_W[o] = (masked coarse[f2c] at offset o)^T @ g — one GEMM over the
    # offset-tiled array instead of a (V, K, Cin, Cout) one-hot einsum
    gathered = _masked_take(coarse_feats, f2c)  # (Vf, Cin)
    tiled = _offset_tiled(gathered, up_off, k, fine_valid)  # (Vf, K*Cin)
    d_w = jnp.dot(tiled.T, g, preferred_element_type=jnp.float32)
    d_w = d_w.reshape(k, cin, cout)
    return (d_coarse.astype(coarse_feats.dtype), d_w.astype(weight.dtype),
            None, None, None, None)


_deconv.defvjp(_deconv_fwd, _deconv_bwd)


def deconv(coarse_feats: jax.Array, fine_to_coarse: jax.Array,
           up_off_idx: jax.Array, weight: jax.Array,
           fine_valid: jax.Array, down_nbr: jax.Array = None) -> jax.Array:
    """Stride-2 transpose conv onto the fine level's active sites.

    out[f] = coarse_feats[f2c[f]] @ weight[offset(f)];
    coarse_feats: (Vc, Cin); weight: (8, Cin, Cout). Passing ``down_nbr``
    enables the scatter-free custom backward."""
    if down_nbr is None:
        k, cin, cout = weight.shape
        gathered = _masked_take(coarse_feats, fine_to_coarse)
        tiled = _offset_tiled(gathered, up_off_idx, k, fine_valid)
        return jnp.dot(tiled, weight.reshape(k * cin, cout).astype(
            gathered.dtype), preferred_element_type=gathered.dtype)
    return _deconv(coarse_feats, weight, fine_to_coarse, up_off_idx,
                   fine_valid, down_nbr)


class BNState(NamedTuple):
    running_mean: jax.Array
    running_var: jax.Array


def batch_norm_act(feats: jax.Array, valid: jax.Array, scale: jax.Array,
                   bias: jax.Array, state: BNState, *, training: bool,
                   momentum: float = 0.9, eps: float = 1e-4,
                   leakiness: float = 0.0, act: bool = True,
                   dom: jax.Array | None = None, n_domains: int = 1):
    """Masked batch norm + (leaky) ReLU over active voxels.

    Replicates ``scn.BatchNormLeakyReLU`` semantics (eps=1e-4, momentum=0.9,
    running = momentum*running + (1-momentum)*batch) while excluding padding
    slots from the statistics. Statistics are computed in float32.

    Domain-segmented mode (``dom``/``n_domains``): several independent
    forward passes (e.g. source / target / VGI-mixed batches) fused into ONE
    call compute statistics PER DOMAIN and normalise each voxel with its own
    domain's stats — numerically identical to running the passes separately,
    which is how the reference trains (train_xmuda_mopa.py runs src, trg and
    cat forwards back to back). Running stats apply the per-domain updates
    sequentially in domain order; a domain with zero active voxels leaves the
    running stats untouched (the reference skips that forward entirely).

    Returns (out, new_state).
    """
    f32 = feats.astype(jnp.float32)
    if not training:
        mean, var = state.running_mean, state.running_var
        out = (f32 - mean) * (jax.lax.rsqrt(var + eps)
                              * scale.astype(jnp.float32)) \
            + bias.astype(jnp.float32)
        new_state = state
    elif dom is None or n_domains == 1:
        m = valid.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(f32 * m, axis=0) / n
        var = jnp.sum(jnp.square(f32 - mean) * m, axis=0) / n
        new_state = BNState(
            running_mean=momentum * state.running_mean + (1.0 - momentum) * mean,
            running_var=momentum * state.running_var + (1.0 - momentum) * var,
        )
        out = (f32 - mean) * (jax.lax.rsqrt(var + eps)
                              * scale.astype(jnp.float32)) \
            + bias.astype(jnp.float32)
    else:
        d = int(n_domains)
        onehot = ((dom[:, None] == jnp.arange(d, dtype=dom.dtype)[None, :])
                  & valid[:, None]).astype(jnp.float32)       # (V, D)
        counts = jnp.sum(onehot, axis=0)                       # (D,)
        denom = jnp.maximum(counts, 1.0)[:, None]
        mean = (onehot.T @ f32) / denom                        # (D, C)
        # broadcast per-domain stats back to voxels via onehot GEMMs, NOT
        # mean[dom] gathers: a take's VJP is a scatter-add over V rows
        # (~5.5 M rows/s on TPU — measured ~70 ms/step across the UNet's
        # BNs), while the GEMM transposes to another GEMM on the MXU.
        mean_v = onehot @ mean                                 # (V, C)
        centered = f32 - mean_v
        var = (onehot.T @ jnp.square(centered)) / denom        # (D, C)
        rm, rv = state.running_mean, state.running_var
        for i in range(d):  # sequential per-domain running update
            has = counts[i] > 0
            mom_i = jnp.where(has, momentum, 1.0)
            rm = mom_i * rm + (1.0 - mom_i) * mean[i]
            rv = mom_i * rv + (1.0 - mom_i) * var[i]
        new_state = BNState(running_mean=rm, running_var=rv)
        inv = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)[None, :]
        out = centered * (onehot @ inv) + bias.astype(jnp.float32)
    if act:
        if leakiness > 0.0:
            out = jnp.where(out >= 0, out, leakiness * out)
        else:
            out = jnp.maximum(out, 0.0)
    return out.astype(feats.dtype), new_state
