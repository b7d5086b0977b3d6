"""Checkpoint import parity: a reference-architecture torch model's outputs
must match our flax model after importing its state_dict.

The torch UNetResNet34 below mirrors the reference
(``mopa/models/resnet34_unet.py:83-191``) without torchvision (not in the
image): BasicBlock ResNet34 encoder with stride-1 conv1, transpose-conv
decoder with skip concats, dropout disabled in eval.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mopa_tpu.models.torch_compat import import_reference_2d, unflatten_into
from mopa_tpu.models.xmuda_arch import Net2DSeg


class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + residual)


def _layer(inplanes, planes, blocks, stride):
    mods = [TBasicBlock(inplanes, planes, stride)]
    for _ in range(blocks - 1):
        mods.append(TBasicBlock(planes, planes))
    return tnn.Sequential(*mods)


class TUNetResNet34(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 1, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = _layer(64, 64, 3, 1)
        self.layer2 = _layer(64, 128, 4, 2)
        self.layer3 = _layer(128, 256, 6, 2)
        self.layer4 = _layer(256, 512, 3, 2)

        def dec(tin, tout, cin, cout):
            t_conv = tnn.Sequential(tnn.ConvTranspose2d(tin, tout, 2, 2),
                                    tnn.BatchNorm2d(tout), tnn.ReLU(True))
            conv = tnn.Sequential(tnn.Conv2d(cin, cout, 3, padding=1),
                                  tnn.BatchNorm2d(cout), tnn.ReLU(True))
            return t_conv, conv

        self.dec_t_conv_stage5 = tnn.Sequential(
            tnn.ConvTranspose2d(512, 256, 2, 2), tnn.BatchNorm2d(256),
            tnn.ReLU(True))
        self.dec_conv_stage4 = tnn.Sequential(
            tnn.Conv2d(512, 256, 3, padding=1), tnn.BatchNorm2d(256),
            tnn.ReLU(True))
        self.dec_t_conv_stage4 = tnn.Sequential(
            tnn.ConvTranspose2d(256, 128, 2, 2), tnn.BatchNorm2d(128),
            tnn.ReLU(True))
        self.dec_conv_stage3 = tnn.Sequential(
            tnn.Conv2d(256, 128, 3, padding=1), tnn.BatchNorm2d(128),
            tnn.ReLU(True))
        self.dec_t_conv_stage3 = tnn.Sequential(
            tnn.ConvTranspose2d(128, 64, 2, 2), tnn.BatchNorm2d(64),
            tnn.ReLU(True))
        self.dec_conv_stage2 = tnn.Sequential(
            tnn.Conv2d(128, 64, 3, padding=1), tnn.BatchNorm2d(64),
            tnn.ReLU(True))
        self.dec_t_conv_stage2 = tnn.Sequential(
            tnn.ConvTranspose2d(64, 64, 2, 2), tnn.BatchNorm2d(64),
            tnn.ReLU(True))
        self.dec_conv_stage1 = tnn.Conv2d(128, 64, 3, padding=1)

    def forward(self, x):
        inter = []
        x = F.relu(self.bn1(self.conv1(x)))
        inter.append(x)
        x = self.maxpool(x)
        x = self.layer1(x)
        inter.append(x)
        x = self.layer2(x)
        inter.append(x)
        x = self.layer3(x)
        inter.append(x)
        x = self.layer4(x)
        x = self.dec_t_conv_stage5(x)
        x = self.dec_conv_stage4(torch.cat([inter[3], x], 1))
        x = self.dec_t_conv_stage4(x)
        x = self.dec_conv_stage3(torch.cat([inter[2], x], 1))
        x = self.dec_t_conv_stage3(x)
        x = self.dec_conv_stage2(torch.cat([inter[1], x], 1))
        x = self.dec_t_conv_stage2(x)
        return self.dec_conv_stage1(torch.cat([inter[0], x], 1))


class TNet2DSeg(tnn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        self.net_2d = TUNetResNet34()
        self.linear = tnn.Linear(64, num_classes)
        self.linear2 = tnn.Linear(64, num_classes)


def test_2d_checkpoint_import_output_parity():
    torch.manual_seed(0)
    tmodel = TNet2DSeg()
    # randomise BN stats so eval mode actually uses them
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.1)
            m.running_var.data.uniform_(0.5, 1.5)
    tmodel.eval()

    state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params_flat, stats_flat = import_reference_2d(state_dict)

    rng = np.random.default_rng(0)
    b, h, w, p = 1, 32, 48, 64
    img = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    idx = np.stack([rng.integers(0, h, (b, p)), rng.integers(0, w, (b, p))],
                   -1).astype(np.int32)
    valid = np.ones((b, p), bool)

    model = Net2DSeg(num_classes=5, dual_head=True, output_all=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(idx), jnp.asarray(valid), train=False)
    params = unflatten_into(variables["params"], params_flat)
    batch_stats = unflatten_into(variables["batch_stats"], stats_flat)
    preds = model.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(img), jnp.asarray(idx), jnp.asarray(valid),
                        train=False)

    with torch.no_grad():
        timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        feat = tmodel.net_2d(timg).permute(0, 2, 3, 1).numpy()  # (B,H,W,64)
        lifted = feat[0][idx[0, :, 0], idx[0, :, 1]]
        tlogit = lifted @ tmodel.linear.weight.numpy().T \
            + tmodel.linear.bias.numpy()
        tlogit2 = lifted @ tmodel.linear2.weight.numpy().T \
            + tmodel.linear2.bias.numpy()

    np.testing.assert_allclose(np.asarray(preds["seg_logit"]), tlogit,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(preds["seg_logit2"]), tlogit2,
                               rtol=1e-3, atol=1e-3)
