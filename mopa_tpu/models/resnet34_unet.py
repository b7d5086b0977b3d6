"""UNet on a ResNet34 encoder, in flax (NHWC, TPU-native).

Faithful re-design of the reference 2D backbone
(``mopa/models/resnet34_unet.py:83-191``):

* torchvision-style ResNet34 encoder with **conv1 stride reduced to 1**
  (reference :93) so the first skip is full resolution;
* 4 downsampling stages (maxpool + layer2/3/4 strides);
* decoder of ConvTranspose(k2,s2)+BN+ReLU stages with skip concatenation and
  3x3 conv+BN+ReLU fusions, final 3x3 conv to 64 channels (reference :106-110);
* dropout p=0.4 after layer3 and layer4 (reference :113,154,159);
* input padded to a multiple of 16 and cropped back (reference :131-138,185-186).

Pretrained torchvision weights can be imported from a ``.pth`` state_dict via
``mopa_tpu.models.torch_compat.load_resnet34_encoder`` (torchvision itself is
not in the TPU image and there is no network egress, so ``pretrained=True``
only takes effect when a weights file is provided).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class DomainBatchNorm(nn.Module):
    """BatchNorm whose batch decomposes into ``n_domains`` equal leading
    groups with INDEPENDENT statistics per group.

    With ``n_domains == 1`` this is numerically identical to
    ``nn.BatchNorm(momentum, epsilon, dtype=float32)`` (same variable names /
    shapes, so checkpoints and the torch import are unaffected). With D > 1,
    an input of shape (D*B, H, W, C) is normalised per domain — exactly what
    D back-to-back forwards of batch B produce (the reference runs separate
    source / target forwards; fusing them into one big conv pass is the TPU
    win, per-domain stats keep the math identical). Running stats apply the
    per-domain updates sequentially in domain order.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        f32 = x.astype(jnp.float32)
        d = int(self.n_domains)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            out = (f32 - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale) \
                + bias
            return out.astype(x.dtype)
        if d == 1:
            mean = jnp.mean(f32, axis=tuple(range(f32.ndim - 1)))
            var = jnp.mean(jnp.square(f32 - mean),
                           axis=tuple(range(f32.ndim - 1)))
            new_mean = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            new_var = self.momentum * ra_var.value + (1 - self.momentum) * var
            out = (f32 - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale) \
                + bias
        else:
            n = f32.shape[0]
            assert n % d == 0, (n, d)
            g = f32.reshape((d, n // d) + f32.shape[1:])
            axes = tuple(range(1, g.ndim - 1))
            mean = jnp.mean(g, axis=axes)                      # (D, C)
            var = jnp.mean(jnp.square(g - mean.reshape(
                (d,) + (1,) * (g.ndim - 2) + (c,))), axis=axes)
            rm, rv = ra_mean.value, ra_var.value
            for i in range(d):  # sequential per-domain running update
                rm = self.momentum * rm + (1 - self.momentum) * mean[i]
                rv = self.momentum * rv + (1 - self.momentum) * var[i]
            new_mean, new_var = rm, rv
            bshape = (d,) + (1,) * (g.ndim - 2) + (c,)
            out = (g - mean.reshape(bshape)) * (
                jax.lax.rsqrt(var.reshape(bshape) + self.epsilon) * scale) + bias
            out = out.reshape(f32.shape)
        if not self.is_initializing():
            ra_mean.value = new_mean
            ra_var.value = new_var
        return out.astype(x.dtype)


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (3x3 conv, BN, ReLU) x2 + skip."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = DomainBatchNorm(n_domains=self.n_domains, name="bn1")(y, not train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = DomainBatchNorm(n_domains=self.n_domains, name="bn2")(y, not train)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = DomainBatchNorm(n_domains=self.n_domains,
                                       name="downsample_bn")(residual, not train)
        return nn.relu(y + residual)


class ResLayer(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            downsample = i == 0 and (stride != 1 or x.shape[-1] != self.planes)
            x = BasicBlock(self.planes, stride, downsample, dtype=self.dtype,
                           n_domains=self.n_domains, name=f"block{i}")(x, train)
        return x


class DecStage(nn.Module):
    """3x3 conv + BN + ReLU fusion after skip concat (reference dec_stage)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = DomainBatchNorm(n_domains=self.n_domains, name="bn")(x, not train)
        return nn.relu(x)


class TConvStage(nn.Module):
    """ConvTranspose(k2,s2) + BN + ReLU upsampling (reference dec_stage t_conv)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="tconv")(x)
        x = DomainBatchNorm(n_domains=self.n_domains, name="bn")(x, not train)
        return nn.relu(x)


class BottleneckPad(nn.Module):
    """Dilated bottleneck residual block (reference
    ``mopa/models/resnet34_unet.py:10-49``): 1x1 -> 3x3 (dilated) -> 1x1 x4
    with BN after each conv and an optional 1x1+BN downsample on the skip."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        nd = self.n_domains
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = DomainBatchNorm(n_domains=nd, name="bn1")(y, not train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = DomainBatchNorm(n_domains=nd, name="bn2")(y, not train)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = DomainBatchNorm(n_domains=nd, name="bn3")(y, not train)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = DomainBatchNorm(n_domains=nd,
                                       name="downsample_bn")(residual,
                                                             not train)
        return nn.relu(y + residual)


class InitialTaskPredictionModule(nn.Module):
    """Depth-prediction head (reference ``resnet34_unet.py:52-80``): two
    BottleneckPad blocks then a 1x1 conv to one channel. The reference ships
    this but never wires it (``UNetResNet34.__init__`` has no ``depth_pred``
    arg and ``Net2DSeg`` never emits ``depth_pred``; the TRAIN.DEPTH_PRED
    hook at ``train_xmuda_mopa.py:405-410`` would KeyError). This rebuild
    wires the *intended* path end-to-end behind the same config flag."""

    intermediate_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        inter = self.intermediate_channels
        need_ds = x.shape[-1] != inter
        x = BottleneckPad(inter // 4, downsample=need_ds, dtype=self.dtype,
                          n_domains=self.n_domains, name="bottleneck1")(
            x, train)
        x = BottleneckPad(inter // 4, downsample=False, dtype=self.dtype,
                          n_domains=self.n_domains, name="bottleneck2")(
            x, train)
        return nn.Conv(1, (1, 1), name="conv_out")(x.astype(jnp.float32))


class UNetResNet34(nn.Module):
    """Full-resolution 64-channel feature UNet (NHWC)."""

    pretrained: bool = True  # weight import handled externally (torch_compat)
    dropout_rate: float = 0.4
    dtype: jnp.dtype = jnp.float32
    n_domains: int = 1
    depth_pred: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad input to multiple of 16 (4 downsample stages)
        h, w = x.shape[1], x.shape[2]
        pad_h = (-h) % 16
        pad_w = (-w) % 16
        if pad_h or pad_w:
            x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])

        x = x.astype(self.dtype)
        nd = self.n_domains
        # ----- encoder -----
        inter = []
        x = nn.Conv(64, (7, 7), strides=(1, 1), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)  # stride 1, not 2 (ref :93)
        x = DomainBatchNorm(n_domains=nd, name="bn1")(x, not train)
        x = nn.relu(x)
        inter.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResLayer(64, 3, 1, dtype=self.dtype, n_domains=nd,
                     name="layer1")(x, train)
        inter.append(x)
        x = ResLayer(128, 4, 2, dtype=self.dtype, n_domains=nd,
                     name="layer2")(x, train)
        inter.append(x)
        x = ResLayer(256, 6, 2, dtype=self.dtype, n_domains=nd,
                     name="layer3")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        inter.append(x)
        x = ResLayer(512, 3, 2, dtype=self.dtype, n_domains=nd,
                     name="layer4")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        # ----- decoder -----
        x = TConvStage(256, dtype=self.dtype, n_domains=nd,
                       name="dec_t_conv_stage5")(x, train)
        x = jnp.concatenate([inter[3], x], axis=-1)
        x = DecStage(256, dtype=self.dtype, n_domains=nd,
                     name="dec_conv_stage4")(x, train)

        x = TConvStage(128, dtype=self.dtype, n_domains=nd,
                       name="dec_t_conv_stage4")(x, train)
        x = jnp.concatenate([inter[2], x], axis=-1)
        x = DecStage(128, dtype=self.dtype, n_domains=nd,
                     name="dec_conv_stage3")(x, train)

        x = TConvStage(64, dtype=self.dtype, n_domains=nd,
                       name="dec_t_conv_stage3")(x, train)
        x = jnp.concatenate([inter[1], x], axis=-1)
        x = DecStage(64, dtype=self.dtype, n_domains=nd,
                     name="dec_conv_stage2")(x, train)

        x = TConvStage(64, dtype=self.dtype, n_domains=nd,
                       name="dec_t_conv_stage2")(x, train)
        x = jnp.concatenate([inter[0], x], axis=-1)
        x = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="dec_conv_stage1")(x)

        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        if self.depth_pred:
            depth = InitialTaskPredictionModule(
                dtype=self.dtype, n_domains=nd, name="depth_head")(x, train)
            return x, depth
        return x
