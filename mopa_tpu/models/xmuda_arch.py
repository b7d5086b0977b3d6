"""xMUDA dual-network architecture: 2D image net + 3D point net.

Re-design of the reference wrappers (``mopa/models/xmuda_arch.py:22-126``):

* :class:`Net2DSeg` — UNetResNet34 features, vectorised 2D→3D lifting over a
  padded (B, P, 2) pixel-index tensor, linear seg head (+ optional second head
  for dual-head xMUDA, + optional dense ``seg_logit_all`` map for the SAM
  consistency loss).
* :class:`Net3DSeg` — SparseUNet over a precomputed :class:`UNetPlan`, linear
  head(s) on the 16-channel point features.

Batch convention (TPU static shapes): every per-point tensor is padded to a
per-sample budget P; ``point_valid`` (B, P) masks padding. The 3D branch
consumes flattened (B*P, ...) tensors whose batch index rides in the voxel
coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mopa_tpu.models.resnet34_unet import UNetResNet34
from mopa_tpu.models.scn_unet import SparseUNet, UNetPlan
from mopa_tpu.ops.lifting import lift_image_feats


class Net2DSeg(nn.Module):
    num_classes: int
    dual_head: bool
    backbone_2d: str = "UNetResNet34"
    output_all: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    pretrained: bool = True
    depth_pred: bool = False

    @nn.compact
    def __call__(self, img, img_indices, point_valid, train: bool = False,
                 n_domains: int = 1):
        """
        Args:
            img: (B, H, W, 3) images (NHWC).
            img_indices: (B, P, 2) int32 per-point (row, col).
            point_valid: (B, P) bool.
            n_domains: >1 fuses several independent forwards stacked on the
                batch axis, with per-domain batch-norm statistics.

        Returns dict with 'feats' (B*P, 64), 'seg_logit' (B*P, C),
        optionally 'seg_logit2' and dense 'seg_logit_all' (B, H, W, C).
        """
        if self.backbone_2d != "UNetResNet34":
            raise NotImplementedError(
                "2D backbone {} not supported".format(self.backbone_2d))
        x = UNetResNet34(pretrained=self.pretrained, dtype=self.compute_dtype,
                         n_domains=n_domains, depth_pred=self.depth_pred,
                         name="net_2d")(img, train=train)
        # lift in the compute dtype: the lifting backward is a scatter-add of
        # (B*P, 64) rows into the dense map — f32 doubles its traffic

        head = nn.Dense(self.num_classes, name="linear")
        preds = {}
        if self.depth_pred:
            x, preds["depth_pred"] = x  # (B, H, W, 1) dense depth
        if self.output_all:
            preds["seg_logit_all"] = head(x.astype(jnp.float32))

        b, p = img_indices.shape[:2]
        img_feats = lift_image_feats(x, img_indices, point_valid)
        img_feats = img_feats.astype(jnp.float32).reshape(b * p, -1)
        preds["feats"] = img_feats
        preds["seg_logit"] = head(img_feats)
        if self.dual_head:
            preds["seg_logit2"] = nn.Dense(self.num_classes, name="linear2")(img_feats)
        return preds


class Net3DSeg(nn.Module):
    num_classes: int
    dual_head: bool
    backbone_3d: str = "SCN"
    in_channels: int = 1
    m: int = 16
    num_planes: int = 7
    block_reps: int = 1
    residual_blocks: bool = False
    full_scale: int = 4096
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_feats, plan: UNetPlan, train: bool = False,
                 n_domains: int = 1, proj_in=None, proj_xy=None,
                 plan_groups=None):
        """
        Args:
            point_feats: (B*P, in_channels) per-point features (ones for SCN;
                xyz+intensity for SPVCNN).
            plan: precomputed UNetPlan for this batch's coordinates
                (7 levels for SCN, 5 for SPVCNN; unused by SalsaNext).
            n_domains: >1 fuses several independent forwards into one with
                per-domain batch norm (plan must carry domain ids).
            proj_in: (B, H, W, 5) range images — SalsaNext only.
            proj_xy: (B, P, 2) int (py, px) per-point range-image pixels —
                SalsaNext only; features are gathered per point so the heads
                stay per-point like the other backbones.

        Returns dict with 'feats' (B*P, out_c) and 'seg_logit' (B*P, C)
        (+ 'seg_logit2' when dual_head; + 'seg_logit_all' (B, H, W, C) dense
        range logits for SalsaNext, consumed by eval's range_to_point/KNN).
        """
        dense_feats = None
        if self.backbone_3d == "SCN":
            feats = SparseUNet(
                in_channels=self.in_channels, m=self.m,
                num_planes=self.num_planes, block_reps=self.block_reps,
                residual_blocks=self.residual_blocks,
                full_scale=self.full_scale, compute_dtype=self.compute_dtype,
                name="net_3d")(point_feats, plan, train=train,
                               n_domains=n_domains, plan_groups=plan_groups)
        elif "SPVCNN" in self.backbone_3d:
            from mopa_tpu.models.spvcnn import SPVCNN

            feats = SPVCNN(in_channels=self.in_channels,
                           compute_dtype=self.compute_dtype,
                           name="net_3d")(point_feats, plan, train=train,
                                          n_domains=n_domains)
        elif "SalsaNext" in self.backbone_3d:
            from mopa_tpu.models.salsanext import SalsaNext

            assert proj_in is not None and proj_xy is not None, \
                "SalsaNext needs proj_in range images and proj_xy pixels"
            dense_feats = SalsaNext(
                in_channels=proj_in.shape[-1],
                compute_dtype=self.compute_dtype,
                name="net_3d")(proj_in, train=train)
            b, p = proj_xy.shape[:2]
            py = jnp.clip(proj_xy[..., 0], 0, dense_feats.shape[1] - 1)
            px = jnp.clip(proj_xy[..., 1], 0, dense_feats.shape[2] - 1)
            feats = jax.vmap(lambda fm, y, x: fm[y, x])(dense_feats, py, px)
            feats = feats.reshape(b * p, -1)
        else:
            raise NotImplementedError(
                "3D backbone {} not supported".format(self.backbone_3d))
        feats = feats.astype(jnp.float32)
        head = nn.Dense(self.num_classes, name="linear")
        preds = {
            "feats": feats,
            "seg_logit": head(feats),
        }
        if self.dual_head:
            preds["seg_logit2"] = nn.Dense(self.num_classes, name="linear2")(feats)
        if dense_feats is not None:
            # dense range logits for eval-time range_to_point / KNN
            preds["seg_logit_all"] = head(dense_feats.astype(jnp.float32))
        return preds
