"""SalsaNext range-image backbone in flax (NHWC).

The reference wires a ``SalsaNext`` 3D-backbone TYPE through its configs,
datasets and eval path (``mopa/config/xmuda.py:233-238``,
``mopa/data/collate.py:11-123`` ``range_to_point``,
``mopa/data/utils/validate.py:97-109``) but ships no model implementation —
``Net3DSeg`` raises NotImplementedError for it (``mopa/models/xmuda_arch.py:97``).
This module provides a working TPU-native SalsaNext following the public
architecture (TiagoCortinhal/SalsaNext ``train/tasks/semantic/modules/
SalsaNext.py``): three residual-context blocks, four pooled residual
dilation blocks, a non-pooled bottleneck and four pixel-shuffle up blocks.
The segmentation heads live in ``Net3DSeg`` (per-point, after range->point
gathering), so this backbone ends at the 32-channel feature map.

Input: (B, H, W, 5) range images (range, x, y, z, intensity).
Output: (B, H, W, 32) features.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def pixel_shuffle(x, r=2):
    """torch PixelShuffle semantics on NHWC: channel index c*r^2 + i*r + j."""
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def _conv(feats, kernel, dilation=1, name=None):
    return nn.Conv(feats, (kernel, kernel),
                   kernel_dilation=(dilation, dilation), padding="SAME",
                   name=name)


class ResContextBlock(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.relu(nn.Conv(self.out, (1, 1), name="conv1")(x))
        h = nn.relu(_conv(self.out, 3, name="conv2")(shortcut))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(h)
        h = nn.relu(_conv(self.out, 3, dilation=2, name="conv3")(h))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(h)
        return shortcut + h


class ResBlock(nn.Module):
    out: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.relu(nn.Conv(self.out, (1, 1), name="conv1")(x))
        a1 = nn.relu(_conv(self.out, 3, name="conv2")(x))
        a1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn1")(a1)
        a2 = nn.relu(_conv(self.out, 3, dilation=2, name="conv3")(a1))
        a2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn2")(a2)
        a3 = nn.relu(nn.Conv(self.out, (2, 2), kernel_dilation=(2, 2),
                             padding=((1, 1), (1, 1)), name="conv4")(a2))
        a3 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn3")(a3)
        cat = jnp.concatenate([a1, a2, a3], axis=-1)
        cat = nn.relu(nn.Conv(self.out, (1, 1), name="conv5")(cat))
        cat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           name="bn4")(cat)
        res = shortcut + cat
        if not self.pooling:
            if self.drop_out:
                res = nn.Dropout(self.dropout_rate, deterministic=not train)(res)
            return res, res
        pooled = nn.avg_pool(res, (3, 3), strides=(2, 2), padding="SAME")
        if self.drop_out:
            pooled = nn.Dropout(self.dropout_rate,
                                deterministic=not train)(pooled)
        return pooled, res


class UpBlock(nn.Module):
    out: int
    dropout_rate: float = 0.2
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool):
        up = pixel_shuffle(x, 2)
        if self.drop_out:
            up = nn.Dropout(self.dropout_rate, deterministic=not train)(up)
        # pad/crop to the skip's spatial dims (odd input sizes)
        if up.shape[1] != skip.shape[1] or up.shape[2] != skip.shape[2]:
            up = up[:, :skip.shape[1], :skip.shape[2]]
            pad_h = skip.shape[1] - up.shape[1]
            pad_w = skip.shape[2] - up.shape[2]
            if pad_h or pad_w:
                up = jnp.pad(up, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        h = jnp.concatenate([up, skip], axis=-1)
        if self.drop_out:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        e1 = nn.relu(_conv(self.out, 3, name="conv1")(h))
        e1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn1")(e1)
        e2 = nn.relu(_conv(self.out, 3, dilation=2, name="conv2")(e1))
        e2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn2")(e2)
        e3 = nn.relu(nn.Conv(self.out, (2, 2), kernel_dilation=(2, 2),
                             padding=((1, 1), (1, 1)), name="conv3")(e2))
        e3 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn3")(e3)
        cat = jnp.concatenate([e1, e2, e3], axis=-1)
        cat = nn.relu(nn.Conv(self.out, (1, 1), name="conv4")(cat))
        cat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           name="bn4")(cat)
        if self.drop_out:
            cat = nn.Dropout(self.dropout_rate, deterministic=not train)(cat)
        return cat


class SalsaNext(nn.Module):
    in_channels: int = 5
    base: int = 32
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.base

    @nn.compact
    def __call__(self, proj_in, train: bool = False):
        """proj_in: (B, H, W, in_channels) range image. -> (B, H, W, base)."""
        m = self.base
        x = proj_in.astype(self.compute_dtype)
        x = ResContextBlock(m, name="downCntx")(x, train)
        x = ResContextBlock(m, name="downCntx2")(x, train)
        x = ResContextBlock(m, name="downCntx3")(x, train)

        d1, s1 = ResBlock(2 * m, 0.2, pooling=True, drop_out=False,
                          name="resBlock1")(x, train)
        d2, s2 = ResBlock(4 * m, 0.2, pooling=True, name="resBlock2")(d1, train)
        d3, s3 = ResBlock(8 * m, 0.2, pooling=True, name="resBlock3")(d2, train)
        d4, s4 = ResBlock(8 * m, 0.2, pooling=True, name="resBlock4")(d3, train)
        d5, _ = ResBlock(8 * m, 0.2, pooling=False, name="resBlock5")(d4, train)

        u1 = UpBlock(4 * m, 0.2, name="upBlock1")(d5, s4, train)
        u2 = UpBlock(4 * m, 0.2, name="upBlock2")(u1, s3, train)
        u3 = UpBlock(2 * m, 0.2, name="upBlock3")(u2, s2, train)
        u4 = UpBlock(m, 0.2, drop_out=False, name="upBlock4")(u3, s1, train)
        return u4.astype(jnp.float32)
