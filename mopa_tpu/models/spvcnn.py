"""SPVCNN (sparse point-voxel CNN) backbone, TPU-native.

The reference routes an ``SPVCNN`` 3D-backbone TYPE through its configs,
collate helpers and eval path (``mopa/config/xmuda.py:226-231``,
``mopa/data/collate.py:11-42`` ``inverse_to_all``,
``mopa/data/utils/validate.py:97-100``, A2D2 torchsparse branch
``mopa/data/a2d2/a2d2_dataloader.py:289-311``) but ships no model —
``Net3DSeg`` raises NotImplementedError (``mopa/models/xmuda_arch.py:97``).
This module provides a working TPU-native SPVCNN after the public
architecture (mit-han-lab/spvnas ``core/models/semantic_kitti/spvcnn.py``):
a sparse voxel UNet (stem, 4 strided stages with residual blocks, 4 deconv
stages with skip concats) interleaved with a point branch — voxel->point
gathers plus per-point linear transforms at stem/bottleneck/mid/end.

Divergence from torchsparse (documented): voxel->point uses nearest-voxel
gathering instead of trilinear devoxelization — with 5 cm voxels the
trilinear weights collapse to the dominant corner, and nearest keeps the
whole network on the precomputed :class:`UNetPlan` maps with static shapes.

All irregular structure comes from a 5-level :class:`UNetPlan` (shared with
``SparseUNet``); compute is gather-GEMM with static shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mopa_tpu.models.scn_unet import _BN, UNetPlan, apply_submanifold
from mopa_tpu.ops import sparse_conv as sc
from mopa_tpu.ops import voxel as voxel_ops

# torchsparse SPVCNN channel schedule (cr = 1.0)
DEFAULT_CS = (32, 32, 64, 128, 256, 256, 128, 96, 96)
NUM_LEVELS = 5  # stem + 4 strides


def _conv_init(key, shape, dtype=jnp.float32):
    k, cin, _ = shape
    std = (2.0 / (k * cin)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def compose_point_maps(plan: UNetPlan):
    """Per level: (point -> level-l voxel slot) index maps ((N,) int32, -1
    for unmapped/padding points)."""
    maps = [plan.point_inverse]
    idx = plan.point_inverse
    for l in range(1, len(plan.levels)):
        f2c = plan.levels[l].f2c
        safe = jnp.clip(idx, 0, f2c.shape[0] - 1)
        idx = jnp.where(idx >= 0, f2c[safe], -1)
        maps.append(idx)
    return maps


def voxel_to_point(vfeats, point_map):
    """Nearest-voxel devoxelization: gather each point's voxel feature."""
    safe = jnp.clip(point_map, 0, vfeats.shape[0] - 1)
    out = vfeats[safe]
    return jnp.where((point_map >= 0)[:, None], out, 0.0)


def point_to_voxel(pfeats, point_map, capacity):
    """Scatter-mean of point features into level-l voxels."""
    ok = point_map >= 0
    tgt = jnp.where(ok, point_map, capacity)
    sums = jnp.zeros((capacity + 1, pfeats.shape[1]), pfeats.dtype
                     ).at[tgt].add(jnp.where(ok[:, None], pfeats, 0.0))
    counts = jnp.zeros((capacity + 1,), pfeats.dtype).at[tgt].add(
        ok.astype(pfeats.dtype))
    return sums[:-1] / jnp.maximum(counts[:-1, None], 1.0)


class ResidualBlock(nn.Module):
    """Conv3-BN-ReLU-Conv3-BN + (1x1-BN) skip, ReLU (torchsparse
    ``ResidualBlock``)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self, x, lv, train: bool, n_domains: int):
        w1 = self.param("conv1", _conv_init, (27, self.cin, self.cout))
        h = apply_submanifold(x, lv, w1)
        h = _BN(self.cout, act=True, name="bn1")(h, lv.valid, train, lv.dom,
                                                 n_domains)
        w2 = self.param("conv2", _conv_init, (27, self.cout, self.cout))
        h = apply_submanifold(h, lv, w2)
        h = _BN(self.cout, act=False, name="bn2")(h, lv.valid, train, lv.dom,
                                                  n_domains)
        if self.cin != self.cout:
            wd = self.param("down", _conv_init, (1, self.cin, self.cout))
            skip = jnp.dot(x, wd[0].astype(x.dtype))
            skip = _BN(self.cout, act=False, name="bn_skip")(
                skip, lv.valid, train, lv.dom, n_domains)
        else:
            skip = x
        return jnp.maximum(h + skip, 0.0)


class SPVCNN(nn.Module):
    in_channels: int = 4
    cs: Sequence[int] = DEFAULT_CS
    dropout: float = 0.3
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.cs[8]

    @nn.compact
    def __call__(self, point_feats: jax.Array, plan: UNetPlan,
                 train: bool = False, n_domains: int = 1):
        """point_feats (N, in_channels); plan: 5-level UNetPlan over the
        point coordinates. Returns per-point features (N, cs[8])."""
        assert len(plan.levels) == NUM_LEVELS, (
            "SPVCNN needs a 5-level plan, got {}".format(len(plan.levels)))
        cs = list(self.cs)
        cdt = self.compute_dtype
        pmaps = compose_point_maps(plan)
        lv = plan.levels
        pvalid = pmaps[0] >= 0  # padding points never map to a voxel
        pdom = None
        if lv[0].dom is not None:
            safe0 = jnp.clip(pmaps[0], 0, lv[0].dom.shape[0] - 1)
            pdom = lv[0].dom[safe0]

        def bn(c, name):
            return _BN(c, act=True, name=name)

        def point_mlp(feats, cout, tag):
            h = nn.Dense(cout, name=f"point_transform{tag}")(feats)
            return bn(cout, f"pt_bn{tag}")(h, pvalid, train, pdom, n_domains)

        z = point_feats.astype(cdt)
        # stem (level 0): two subm convs
        cap0 = lv[0].valid.shape[0]
        x0 = point_to_voxel(z, pmaps[0], cap0)
        w_s1 = self.param("stem1", _conv_init, (27, self.in_channels, cs[0]))
        x0 = apply_submanifold(x0, lv[0], w_s1)
        x0 = bn(cs[0], "stem_bn1")(x0, lv[0].valid, train, lv[0].dom,
                                   n_domains)
        w_s2 = self.param("stem2", _conv_init, (27, cs[0], cs[0]))
        x0 = apply_submanifold(x0, lv[0], w_s2)
        x0 = bn(cs[0], "stem_bn2")(x0, lv[0].valid, train, lv[0].dom,
                                   n_domains)
        z0 = voxel_to_point(x0, pmaps[0])

        # encoder: stride-2 conv + 2 residual blocks per stage
        skips = [x0]
        x = point_to_voxel(z0, pmaps[0], cap0)
        for i in range(1, 5):
            nxt = lv[i]
            prev = lv[i - 1]
            w_d = self.param(f"down{i}", _conv_init, (8, cs[i - 1], cs[i - 1]))
            y = sc.strided_conv(x, nxt.down_nbr, w_d, f2c=nxt.f2c,
                                up_off=nxt.up_off, fine_valid=prev.valid)
            y = bn(cs[i - 1], f"down_bn{i}")(y, nxt.valid, train, nxt.dom,
                                             n_domains)
            y = ResidualBlock(cs[i - 1], cs[i], name=f"res{i}a")(
                y, nxt, train, n_domains)
            y = ResidualBlock(cs[i], cs[i], name=f"res{i}b")(
                y, nxt, train, n_domains)
            skips.append(y)
            x = y

        # bottleneck point fusion
        z1 = voxel_to_point(x, pmaps[4])
        z1 = z1 + point_mlp(z0, cs[4], "0")
        z1 = nn.Dropout(self.dropout, deterministic=not train)(z1)

        # decoder stage helper: deconv level l -> l-1, concat skip, residuals
        def up_stage(feats, l, cout, skip, skip_c, tag):
            nxt = lv[l]
            fine = lv[l - 1]
            cin = feats.shape[-1]
            w_u = self.param(f"up{tag}", _conv_init, (8, cin, cout))
            y = sc.deconv(feats, nxt.f2c, nxt.up_off, w_u, fine.valid,
                          down_nbr=nxt.down_nbr)
            y = bn(cout, f"up_bn{tag}")(y, fine.valid, train, fine.dom,
                                        n_domains)
            y = jnp.concatenate([y, skip], axis=-1)
            y = ResidualBlock(cout + skip_c, cout, name=f"upres{tag}a")(
                y, fine, train, n_domains)
            y = ResidualBlock(cout, cout, name=f"upres{tag}b")(
                y, fine, train, n_domains)
            return y

        y1 = point_to_voxel(z1, pmaps[4], lv[4].valid.shape[0])
        y1 = up_stage(y1, 4, cs[5], skips[3], cs[3], "1")
        y2 = up_stage(y1, 3, cs[6], skips[2], cs[2], "2")

        # mid point fusion
        z2 = voxel_to_point(y2, pmaps[2])
        z2 = z2 + point_mlp(z1, cs[6], "1")
        z2 = nn.Dropout(self.dropout, deterministic=not train)(z2)

        y3 = point_to_voxel(z2, pmaps[2], lv[2].valid.shape[0])
        y3 = up_stage(y3, 2, cs[7], skips[1], cs[1], "3")
        y4 = up_stage(y3, 1, cs[8], skips[0], cs[0], "4")

        # final point fusion
        z3 = voxel_to_point(y4, pmaps[0])
        z3 = z3 + point_mlp(z2, cs[8], "2")
        return z3.astype(jnp.float32)
