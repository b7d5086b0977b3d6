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

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (3x3 conv, BN, ReLU) x2 + skip."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResLayer(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            downsample = i == 0 and (stride != 1 or x.shape[-1] != self.planes)
            x = BasicBlock(self.planes, stride, downsample, dtype=self.dtype,
                           name=f"block{i}")(x, train)
        return x


class DecStage(nn.Module):
    """3x3 conv + BN + ReLU fusion after skip concat (reference dec_stage)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class TConvStage(nn.Module):
    """ConvTranspose(k2,s2) + BN + ReLU upsampling (reference dec_stage t_conv)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="tconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class UNetResNet34(nn.Module):
    """Full-resolution 64-channel feature UNet (NHWC)."""

    pretrained: bool = True  # weight import handled externally (torch_compat)
    dropout_rate: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad input to multiple of 16 (4 downsample stages)
        h, w = x.shape[1], x.shape[2]
        pad_h = (-h) % 16
        pad_w = (-w) % 16
        if pad_h or pad_w:
            x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])

        x = x.astype(self.dtype)
        # ----- encoder -----
        inter = []
        x = nn.Conv(64, (7, 7), strides=(1, 1), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)  # stride 1, not 2 (ref :93)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        inter.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResLayer(64, 3, 1, dtype=self.dtype, name="layer1")(x, train)
        inter.append(x)
        x = ResLayer(128, 4, 2, dtype=self.dtype, name="layer2")(x, train)
        inter.append(x)
        x = ResLayer(256, 6, 2, dtype=self.dtype, name="layer3")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        inter.append(x)
        x = ResLayer(512, 3, 2, dtype=self.dtype, name="layer4")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        # ----- decoder -----
        x = TConvStage(256, dtype=self.dtype, name="dec_t_conv_stage5")(x, train)
        x = jnp.concatenate([inter[3], x], axis=-1)
        x = DecStage(256, dtype=self.dtype, name="dec_conv_stage4")(x, train)

        x = TConvStage(128, dtype=self.dtype, name="dec_t_conv_stage4")(x, train)
        x = jnp.concatenate([inter[2], x], axis=-1)
        x = DecStage(128, dtype=self.dtype, name="dec_conv_stage3")(x, train)

        x = TConvStage(64, dtype=self.dtype, name="dec_t_conv_stage3")(x, train)
        x = jnp.concatenate([inter[1], x], axis=-1)
        x = DecStage(64, dtype=self.dtype, name="dec_conv_stage2")(x, train)

        x = TConvStage(64, dtype=self.dtype, name="dec_t_conv_stage2")(x, train)
        x = jnp.concatenate([inter[0], x], axis=-1)
        x = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="dec_conv_stage1")(x)

        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        return x
