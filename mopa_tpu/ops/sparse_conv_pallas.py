"""Fused gather+GEMM submanifold convolution as a Pallas TPU kernel.

The XLA wide-conv path (``sparse_conv.submanifold_conv_wide``) materialises a
(V, 27*Cin) aligned array in HBM between the window gather and the GEMM —
at the production fused-batch shapes that round trip (plus the windowed-
concat source) is ~20x the conv's true input/output bytes, and the row
gather itself runs at XLA's HBM gather rate. This kernel keeps the whole
per-sample feature table VMEM-resident, performs the 9 window-column row
gathers as in-VMEM ``tpu.dynamic_gather``s (Mosaic lowers
``jnp.take_along_axis(tab, idx, axis=0)`` with idx.shape == tab.shape to a
sublane gather — the only gather form Mosaic supports), realigns dz
sub-rows with the same packed sel-code masks as the XLA path, and
accumulates the 9 per-column GEMMs on the MXU — HBM traffic collapses to
the (V, Cin) read + (V, Cout) write.

Semantics are identical to ``sparse_conv.submanifold_conv_wide`` over the
same :class:`sparse_conv.WidePlan` (ranks/sel in LOCAL per-sample slot
space here; the flat global plan is localised by the wrapper). The custom
VJP mirrors ``sparse_conv._wide_bwd``: d_feats is the same wide conv of the
cotangent with mirrored transposed weights, and d_w reuses that aligned
cotangent (one gather total), accumulated across grid steps in a
VMEM-resident output block.

Reference parity: this implements scn.SubmanifoldConvolution(dim=3, k=3)
(``/root/reference/mopa/models/scn_unet.py:25-30``) exactly like the XLA
paths; golden tests pin it to ``submanifold_conv_wide``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sublane granule: per-sample tables are padded to a multiple of this
PAD = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _gather_window(tab, ranks, sel, c, capp, cw, out_dtype):
    """Column c's dz-aligned (capp, 3*C) window rows from the VMEM table.

    tab: (capp, C) float32 — Mosaic's ``tpu.dynamic_gather`` requires the
    index and data bitwidths to MATCH, so bf16 tables are gathered through
    a one-time f32 view and the aligned window is cast back to ``out_dtype``
    for the MXU dot. The gather form wants indices shaped like the operand,
    so the (capp,) per-row rank broadcasts across lanes; rows rc, rc+1,
    rc+2 cover the column's z-run and the packed dz-select codes route each
    gathered sub-row to its dz slot (codes strictly increasing; slot 0 only
    ever comes from sub-row 0).
    """
    rc = jnp.clip(ranks[:, c], 0, capp - 1)
    idx0 = jnp.broadcast_to(rc[:, None], (capp, cw))
    g0 = jnp.take_along_axis(tab, idx0, axis=0)
    g1 = jnp.take_along_axis(tab, jnp.minimum(idx0 + 1, capp - 1), axis=0)
    g2 = jnp.take_along_axis(tab, jnp.minimum(idx0 + 2, capp - 1), axis=0)
    sc = sel[:, c]
    t0 = (sc & 3)[:, None]
    t1 = ((sc >> 2) & 3)[:, None]
    t2 = ((sc >> 4) & 3)[:, None]
    dt = tab.dtype
    a0 = (t0 == 0).astype(dt) * g0
    a1 = (t0 == 1).astype(dt) * g0 + (t1 == 1).astype(dt) * g1
    a2 = ((t0 == 2).astype(dt) * g0 + (t1 == 2).astype(dt) * g1
          + (t2 == 2).astype(dt) * g2)
    return jnp.concatenate([a0, a1, a2], axis=1).astype(out_dtype)


def _conv_kernel(f_ref, r_ref, s_ref, w_ref, o_ref, *, capp, cin, cout,
                 acc_dtype):
    """One sample of the fused forward (grid = (S,)).

    f_ref: (1, capp, Cin) sample feature table, VMEM-resident.
    r_ref/s_ref: (1, capp, 9) local window ranks / packed dz-select codes.
    w_ref: (27*Cin, Cout) weights, kernel_offsets layout (dx slow, dz fast).
    o_ref: (1, capp, Cout).
    """
    dt = f_ref.dtype
    tab = f_ref[0].astype(jnp.float32)                 # gather-width match
    ranks = r_ref[0]
    sel = s_ref[0]
    acc = jnp.zeros((capp, cout), acc_dtype)
    for c in range(9):
        xc = _gather_window(tab, ranks, sel, c, capp, cin, dt)
        wc = w_ref[pl.ds(3 * cin * c, 3 * cin), :]     # (3*Cin, Cout)
        acc = acc + jnp.dot(xc, wc, preferred_element_type=acc_dtype)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(g_ref, r_ref, s_ref, wt_ref, f_ref, do_ref, dw_ref, *,
                capp, cin, cout, acc_dtype):
    """Backward grid step: d_feats for one sample (the same wide conv of the
    cotangent with mirrored transposed weights) + d_w accumulation.

    g_ref: (1, capp, Cout) cotangent table. wt_ref: (27*Cout, Cin) mirrored
    transposed weights. f_ref: (1, capp, Cin) forward-input table.
    do_ref: (1, capp, Cin) d_feats out. dw_ref: (9*Cin, 3*Cout) f32
    accumulator, column-blocked along SUBLANES (static sublane slices lower
    cleanly where non-128-aligned lane slices would not); constant index
    map — it lives across the whole sequential grid and flushes at the end.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dt = g_ref.dtype
    tab = g_ref[0].astype(jnp.float32)                 # (capp, Cout)
    ranks = r_ref[0]
    sel = s_ref[0]
    fb = f_ref[0]                                      # (capp, Cin)
    acc = jnp.zeros((capp, cin), acc_dtype)
    for c in range(9):
        xc = _gather_window(tab, ranks, sel, c, capp, cout, dt)  # aligned g
        wc = wt_ref[pl.ds(3 * cout * c, 3 * cout), :]
        acc = acc + jnp.dot(xc, wc, preferred_element_type=acc_dtype)
        # d_w column block: fb^T @ xc -> (Cin, 3*Cout), at sublane block c
        dw_ref[pl.ds(cin * c, cin), :] += jax.lax.dot_general(
            fb, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    do_ref[0] = acc.astype(do_ref.dtype)


def _pad_tables(feats, ranks, sel, cap, s, extra=()):
    """Reshape flat per-sample arrays to (S, capp, ...) padded tables."""
    capp = _cdiv(cap, PAD) * PAD
    pad = capp - cap

    def padrow(x, fill):
        x = x.reshape(s, cap, -1)
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)], constant_values=fill)
        return x

    out = [padrow(feats, 0), padrow(ranks, 0), padrow(sel, 63)]
    out.extend(padrow(x, 0) for x in extra)
    return capp, out


@functools.partial(jax.jit, static_argnames=("cap", "s", "interpret"))
def _fwd_call(feats, ranks, sel, w2d, *, cap, s, interpret=False):
    cin = feats.shape[-1]
    cout = w2d.shape[-1]
    capp, (tab, r, se) = _pad_tables(feats, ranks, sel, cap, s)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, capp=capp, cin=cin, cout=cout,
                          acc_dtype=jnp.float32),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, capp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, capp, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, capp, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, capp, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, capp, cout), feats.dtype),
        interpret=interpret,
    )(tab, r, se, w2d)
    return out[:, :cap].reshape(s * cap, cout)


@functools.partial(jax.jit, static_argnames=("cap", "s", "interpret"))
def _bwd_call(g, ranks, sel, wt2d, feats, *, cap, s, interpret=False):
    cout = g.shape[-1]
    cin = feats.shape[-1]
    capp, (gt, r, se, fb) = _pad_tables(g, ranks, sel, cap, s,
                                        extra=(feats,))
    do, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, capp=capp, cin=cin, cout=cout,
                          acc_dtype=jnp.float32),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, capp, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, capp, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, capp, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cout, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, capp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, capp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, 3 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, capp, cin), g.dtype),
            jax.ShapeDtypeStruct((9 * cin, 3 * cout), jnp.float32),
        ),
        interpret=interpret,
    )(gt, r, se, wt2d, fb)
    # (9*Cin, 3*Cout) column-sublane blocks -> (Cin, 27*Cout) lane layout
    dw = dw.reshape(9, cin, 3 * cout).transpose(1, 0, 2).reshape(
        cin, 27 * cout)
    return do[:, :cap].reshape(s * cap, cin), dw


_INTERPRET = False  # tests force True; CPU auto-detects (no Mosaic there)


def _interp() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _conv_pallas(feats, weight, ranks, sel, cap, s):
    cin = weight.shape[1]
    cout = weight.shape[2]
    w2d = weight.reshape(27 * cin, cout).astype(feats.dtype)
    return _fwd_call(feats, ranks, sel, w2d, cap=cap, s=s,
                     interpret=_interp())


def _conv_pallas_fwd(feats, weight, ranks, sel, cap, s):
    out = _conv_pallas(feats, weight, ranks, sel, cap, s)
    return out, (feats, weight, ranks, sel)


def _conv_pallas_bwd(cap, s, res, g):
    feats, weight, ranks, sel = res
    k, cin, cout = weight.shape
    g = g.astype(feats.dtype)
    # mirrored transposed weights: u is v's neighbour at o iff v is u's at -o
    wt = jnp.transpose(weight[::-1], (0, 2, 1)).reshape(
        k * cout, cin).astype(g.dtype)
    d_feats, p = _bwd_call(g, ranks, sel, wt, feats, cap=cap, s=s,
                           interpret=_interp())
    # p is (Cin, 27*Cout) with column blocks in MIRRORED offset order
    d_w = p.reshape(cin, k, cout)[:, ::-1, :].transpose(1, 0, 2)
    return (d_feats.astype(feats.dtype), d_w.astype(weight.dtype),
            None, None)


_conv_pallas.defvjp(_conv_pallas_fwd, _conv_pallas_bwd)


def submanifold_conv_wide_pallas(feats: jax.Array, ranks: jax.Array,
                                 sel: jax.Array, weight: jax.Array,
                                 cap: int, n_samples: int) -> jax.Array:
    """Fused submanifold conv over a LOCAL per-sample wide plan.

    feats: (S*cap, Cin) sample-major flat table. ranks/sel: (S*cap*9,) as
    produced by ``sparse_conv.build_wide_plan`` per sample (ranks in local
    slot space — use :func:`localize_plan` on a flat global plan). weight:
    (27, Cin, Cout). Numerically identical to
    ``sparse_conv.submanifold_conv_wide``.
    """
    return _conv_pallas(feats, weight, ranks, sel, cap, n_samples)


def submanifold_conv_grouped(feats: jax.Array, ranks: jax.Array,
                             sel: jax.Array, weight: jax.Array,
                             groups) -> jax.Array:
    """Fused submanifold conv over a GLOBAL flat plan made of uniform groups.

    ``concat_plans`` stitches plan groups of different per-sample capacities
    (the src+trg group at the point budget, the VGI cat group at its own)
    into one flat table; within each group the layout is uniform
    sample-major. ``groups`` is a static tuple of (n_samples, cap) in table
    order; per group the flat rows are sliced out, ranks re-localised, and
    the kernel applied, so every DMA'd VMEM table stays per-sample sized.
    """
    outs = []
    row0 = 0
    for (ns, cap) in groups:
        rows = ns * cap
        f = jax.lax.dynamic_slice_in_dim(feats, row0, rows, axis=0)
        r = jax.lax.dynamic_slice_in_dim(ranks, row0 * 9, rows * 9, axis=0)
        se = jax.lax.dynamic_slice_in_dim(sel, row0 * 9, rows * 9, axis=0)
        # group ranks are global: subtract the group base + sample base
        rl = r.reshape(ns, cap * 9) - (
            row0 + jnp.arange(ns, dtype=r.dtype)[:, None] * cap)
        outs.append(_conv_pallas(f, weight, rl.reshape(-1), se, cap, ns))
        row0 += rows
    return jnp.concatenate(outs, axis=0)


def localize_plan(ranks: jax.Array, sel: jax.Array, cap: int,
                  n_samples: int):
    """Global flat (S*cap*9,) wide-plan arrays -> per-sample local ranks.

    The batched plan builder offsets ranks into value space (slot + s*cap;
    the all-miss sentinel == cap lands on the next sample's first row, its
    sel code 63 keeps it masked). The kernel gathers from per-sample VMEM
    tables, so ranks are re-localised by subtracting the sample base.
    """
    r = ranks.reshape(n_samples, cap * 9)
    base = (jnp.arange(n_samples, dtype=ranks.dtype) * cap)[:, None]
    return (r - base).reshape(-1), sel
