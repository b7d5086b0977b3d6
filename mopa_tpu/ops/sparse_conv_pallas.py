"""Fused gather+GEMM submanifold convolution as a Pallas TPU kernel.

The XLA wide-conv path (``sparse_conv.submanifold_conv_wide``) materialises a
(V, 27*Cin) aligned array in HBM between the window gather and the GEMM —
at the production fused-batch shapes that round trip (plus the windowed-
concat source) is ~20x the conv's true input/output bytes, and the row
gather itself runs at XLA's HBM gather rate. This kernel keeps the whole
per-sample feature table VMEM-resident, performs the 9 window-column row
gathers as in-VMEM ``jnp.take``s, realigns dz sub-rows with the same packed
sel-code masks as the XLA path, and accumulates the 9 per-column GEMMs on
the MXU — HBM traffic collapses to the (V, Cin) read + (V, Cout) write.

Semantics are identical to ``sparse_conv.submanifold_conv_wide`` over the
same :class:`sparse_conv.WidePlan` (ranks/sel in LOCAL per-sample slot
space here; the flat global plan is localised by the wrapper). The custom
VJP mirrors ``sparse_conv._wide_bwd``: d_feats is the same wide conv of the
cotangent with mirrored transposed weights, and d_w reuses that aligned
cotangent (one gather total), accumulated across grid blocks in VMEM
scratch.

Reference parity: this implements scn.SubmanifoldConvolution(dim=3, k=3)
(``/root/reference/mopa/models/scn_unet.py:25-30``) exactly like the XLA
paths; golden tests pin it to ``submanifold_conv_wide``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# voxel block per grid step (rows of the output computed per iteration)
BLOCK = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _conv_kernel(f_ref, r_ref, s_ref, w_ref, o_ref, *, cap, cin, cout,
                 acc_dtype):
    """One (sample, voxel-block) grid step of the fused forward.

    f_ref: (1, cap, Cin) sample feature table (VMEM-resident, reused across
        the sample's blocks — the index map keeps it fixed over b).
    r_ref/s_ref: (1, B, 9) local window ranks / packed dz-select codes.
    w_ref: (27*Cin, Cout) weights, kernel_offsets layout (dx slow, dz fast).
    o_ref: (1, B, Cout).
    """
    tab = f_ref[0]                                   # (cap, Cin)
    ranks = r_ref[0]                                 # (B, 9) int32
    sel = s_ref[0]                                   # (B, 9) int32
    b = ranks.shape[0]
    acc = jnp.zeros((b, cout), acc_dtype)
    for c in range(9):
        rc = jnp.clip(ranks[:, c], 0, cap - 1)
        # window rows rc, rc+1, rc+2 (valid sub-rows never point past the
        # last active row, so the clip only ever touches masked lanes)
        g0 = jnp.take(tab, rc, axis=0)               # (B, Cin)
        g1 = jnp.take(tab, jnp.minimum(rc + 1, cap - 1), axis=0)
        g2 = jnp.take(tab, jnp.minimum(rc + 2, cap - 1), axis=0)
        sc = sel[:, c]
        t0 = (sc & 3)[:, None]
        t1 = ((sc >> 2) & 3)[:, None]
        t2 = ((sc >> 4) & 3)[:, None]
        dt = tab.dtype
        # dz slot t receives gathered sub-row j iff t_j == t (codes strictly
        # increasing; slot 0 only ever comes from sub-row 0, etc.)
        a0 = (t0 == 0).astype(dt) * g0
        a1 = (t0 == 1).astype(dt) * g0 + (t1 == 1).astype(dt) * g1
        a2 = ((t0 == 2).astype(dt) * g0 + (t1 == 2).astype(dt) * g1
              + (t2 == 2).astype(dt) * g2)
        xc = jnp.concatenate([a0, a1, a2], axis=1)   # (B, 3*Cin)
        wc = w_ref[pl.ds(3 * cin * c, 3 * cin), :]   # (3*Cin, Cout)
        acc = acc + jnp.dot(xc, wc, preferred_element_type=acc_dtype)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(g_ref, r_ref, s_ref, wt_ref, f_ref, do_ref, dw_ref, *,
                cap, cin, cout, acc_dtype):
    """Backward grid step: d_feats block (same wide conv of the cotangent
    with mirrored transposed weights) + d_w accumulation.

    g_ref: (1, cap, Cout) cotangent table. wt_ref: (27*Cout, Cin) mirrored
    transposed weights. f_ref: (1, B, Cin) forward-input rows of this block.
    do_ref: (1, B, Cin) d_feats out. dw_ref: (9*Cin, 3*Cout) f32 accumulator,
    column-blocked along SUBLANES (static sublane slices lower cleanly where
    non-128-aligned lane slices would not); constant index map — it lives
    across the whole sequential grid and flushes once at the end.
    """
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    tab = g_ref[0]                                    # (cap, Cout)
    ranks = r_ref[0]
    sel = s_ref[0]
    fb = f_ref[0]                                     # (B, Cin)
    b = ranks.shape[0]
    acc = jnp.zeros((b, cin), acc_dtype)
    for c in range(9):
        rc = jnp.clip(ranks[:, c], 0, cap - 1)
        g0 = jnp.take(tab, rc, axis=0)
        g1 = jnp.take(tab, jnp.minimum(rc + 1, cap - 1), axis=0)
        g2 = jnp.take(tab, jnp.minimum(rc + 2, cap - 1), axis=0)
        sc = sel[:, c]
        t0 = (sc & 3)[:, None]
        t1 = ((sc >> 2) & 3)[:, None]
        t2 = ((sc >> 4) & 3)[:, None]
        dt = tab.dtype
        a0 = (t0 == 0).astype(dt) * g0
        a1 = (t0 == 1).astype(dt) * g0 + (t1 == 1).astype(dt) * g1
        a2 = ((t0 == 2).astype(dt) * g0 + (t1 == 2).astype(dt) * g1
              + (t2 == 2).astype(dt) * g2)
        xc = jnp.concatenate([a0, a1, a2], axis=1)    # (B, 3*Cout) aligned g
        wc = wt_ref[pl.ds(3 * cout * c, 3 * cout), :]
        acc = acc + jnp.dot(xc, wc, preferred_element_type=acc_dtype)
        # d_w column block: fb^T @ xc -> (Cin, 3*Cout), at sublane block c
        dw_ref[pl.ds(cin * c, cin), :] += jax.lax.dot_general(
            fb, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    do_ref[0] = acc.astype(do_ref.dtype)


def _pad_to_blocks(x, nbb, fill):
    """(S, cap[, K]) -> (S, nbb[, K]) padded with ``fill``."""
    pad = nbb - x.shape[1]
    if pad == 0:
        return x
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("cap", "s", "interpret"))
def _fwd_call(feats, ranks, sel, w2d, *, cap, s, interpret=False):
    cin = feats.shape[-1]
    cout = w2d.shape[-1]
    nbb = _cdiv(cap, BLOCK) * BLOCK
    tab = feats.reshape(s, cap, cin)
    r = _pad_to_blocks(ranks.reshape(s, cap, 9), nbb, 0)
    se = _pad_to_blocks(sel.reshape(s, cap, 9), nbb, 63)  # all-miss codes
    out = pl.pallas_call(
        functools.partial(_conv_kernel, cap=cap, cin=cin, cout=cout,
                          acc_dtype=jnp.float32),
        grid=(s, nbb // BLOCK),
        in_specs=[
            pl.BlockSpec((1, cap, cin), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 9), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 9), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cin, cout), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, cout), lambda i, b: (i, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, nbb, cout), feats.dtype),
        interpret=interpret,
    )(tab, r, se, w2d)
    return out[:, :cap].reshape(s * cap, cout)


@functools.partial(jax.jit, static_argnames=("cap", "s", "interpret"))
def _bwd_call(g, ranks, sel, wt2d, feats, *, cap, s, interpret=False):
    cout = g.shape[-1]
    cin = feats.shape[-1]
    nbb = _cdiv(cap, BLOCK) * BLOCK
    gt = g.reshape(s, cap, cout)
    r = _pad_to_blocks(ranks.reshape(s, cap, 9), nbb, 0)
    se = _pad_to_blocks(sel.reshape(s, cap, 9), nbb, 63)
    fb = _pad_to_blocks(feats.reshape(s, cap, cin), nbb, 0)
    do, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, cap=cap, cin=cin, cout=cout,
                          acc_dtype=jnp.float32),
        grid=(s, nbb // BLOCK),
        in_specs=[
            pl.BlockSpec((1, cap, cout), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 9), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 9), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cout, cin), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, cin), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK, cin), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, 3 * cout), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, nbb, cin), g.dtype),
            jax.ShapeDtypeStruct((9 * cin, 3 * cout), jnp.float32),
        ),
        interpret=interpret,
    )(gt, r, se, wt2d, fb)
    # (9*Cin, 3*Cout) column-sublane blocks -> (Cin, 27*Cout) lane layout
    dw = dw.reshape(9, cin, 3 * cout).transpose(1, 0, 2).reshape(
        cin, 27 * cout)
    return do[:, :cap].reshape(s * cap, cin), dw


_INTERPRET = False  # flipped by tests on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _conv_pallas(feats, weight, ranks, sel, cap, s):
    cin = weight.shape[1]
    cout = weight.shape[2]
    w2d = weight.reshape(27 * cin, cout).astype(feats.dtype)
    return _fwd_call(feats, ranks, sel, w2d, cap=cap, s=s,
                     interpret=_INTERPRET)


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
                           interpret=_INTERPRET)
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
