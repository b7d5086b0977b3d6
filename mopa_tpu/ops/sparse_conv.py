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


def build_submanifold_plan(table: voxel_ops.VoxelTable, kernel_size: int = 3) -> jax.Array:
    """Neighbour map for a submanifold conv: (V, K) slot indices, -1 = miss.

    Active output sites == active input sites (the submanifold property).
    """
    offs = jnp.asarray(kernel_offsets(kernel_size))  # (K, 3)
    k = offs.shape[0]
    v = table.capacity
    valid = table.valid_mask()
    q_coords = (table.coords[:, None, :] + offs[None, :, :]).reshape(v * k, 3)
    q_batch = jnp.repeat(table.batch, k)
    q_valid = jnp.repeat(valid, k)
    nbr = voxel_ops.lookup(table, q_coords, q_batch, q_valid)
    return nbr.reshape(v, k)


def build_down_plan(fine: voxel_ops.VoxelTable, coarse: voxel_ops.VoxelTable) -> jax.Array:
    """Gather map for a size-2/stride-2 convolution: (Vc, 8) fine slots, -1 miss.

    Output site c gathers input sites at ``2*c + o`` for o in {0,1}^3.
    """
    offs = jnp.asarray(
        np.asarray(list(itertools.product((0, 1), repeat=3)), dtype=np.int32)
    )  # (8, 3), dx slowest
    vc = coarse.capacity
    valid = coarse.valid_mask()
    q_coords = (2 * coarse.coords[:, None, :] + offs[None, :, :]).reshape(vc * 8, 3)
    q_batch = jnp.repeat(coarse.batch, 8)
    q_valid = jnp.repeat(valid, 8)
    nbr = voxel_ops.lookup(fine, q_coords, q_batch, q_valid)
    return nbr.reshape(vc, 8)


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


def submanifold_conv(feats: jax.Array, nbr: jax.Array, weight: jax.Array,
                     bias: jax.Array | None = None) -> jax.Array:
    """out[v] = sum_k feats[nbr[v,k]] @ weight[k]  (misses contribute zero).

    feats: (V, Cin); nbr: (V, K); weight: (K, Cin, Cout).
    """
    k = nbr.shape[1]
    cout = weight.shape[-1]
    # output sites are the rows of the neighbour map (== input sites for
    # submanifold convs, coarse sites for strided convs)
    out = jnp.zeros((nbr.shape[0], cout), dtype=feats.dtype)
    for j in range(k):
        gathered = _masked_take(feats, nbr[:, j])
        out = out + jnp.dot(gathered, weight[j].astype(feats.dtype),
                            preferred_element_type=out.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def strided_conv(fine_feats: jax.Array, down_nbr: jax.Array, weight: jax.Array) -> jax.Array:
    """Stride-2 conv: out (Vc, Cout) from fine feats via the (Vc, 8) plan."""
    return submanifold_conv(fine_feats, down_nbr, weight)


def deconv(coarse_feats: jax.Array, fine_to_coarse: jax.Array,
           up_off_idx: jax.Array, weight: jax.Array,
           fine_valid: jax.Array) -> jax.Array:
    """Stride-2 transpose conv onto the fine level's active sites.

    out[f] = coarse_feats[f2c[f]] @ weight[offset(f)];
    coarse_feats: (Vc, Cin); weight: (8, Cin, Cout).
    """
    gathered = _masked_take(coarse_feats, fine_to_coarse)  # (Vf, Cin)
    cout = weight.shape[-1]
    out = jnp.zeros((gathered.shape[0], cout), dtype=gathered.dtype)
    for o in range(8):
        sel = (up_off_idx == o) & fine_valid
        out = out + jnp.dot(jnp.where(sel[:, None], gathered, 0.0),
                            weight[o].astype(gathered.dtype),
                            preferred_element_type=out.dtype)
    return out


class BNState(NamedTuple):
    running_mean: jax.Array
    running_var: jax.Array


def batch_norm_act(feats: jax.Array, valid: jax.Array, scale: jax.Array,
                   bias: jax.Array, state: BNState, *, training: bool,
                   momentum: float = 0.9, eps: float = 1e-4,
                   leakiness: float = 0.0, act: bool = True):
    """Masked batch norm + (leaky) ReLU over active voxels.

    Replicates ``scn.BatchNormLeakyReLU`` semantics (eps=1e-4, momentum=0.9,
    running = momentum*running + (1-momentum)*batch) while excluding padding
    slots from the statistics. Statistics are computed in float32.

    Returns (out, new_state).
    """
    f32 = feats.astype(jnp.float32)
    if training:
        m = valid.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(f32 * m, axis=0) / n
        var = jnp.sum(jnp.square(f32 - mean) * m, axis=0) / n
        new_state = BNState(
            running_mean=momentum * state.running_mean + (1.0 - momentum) * mean,
            running_var=momentum * state.running_var + (1.0 - momentum) * var,
        )
    else:
        mean, var = state.running_mean, state.running_var
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    out = (f32 - mean) * inv + bias.astype(jnp.float32)
    if act:
        if leakiness > 0.0:
            out = jnp.where(out >= 0, out, leakiness * out)
        else:
            out = jnp.maximum(out, 0.0)
    return out.astype(feats.dtype), new_state
