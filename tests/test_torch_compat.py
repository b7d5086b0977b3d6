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


def test_load_resnet34_encoder_matches_reference_import():
    """The torchvision-style encoder import must agree key-for-key with the
    (output-parity-tested) full-model importer's encoder subset."""
    from mopa_tpu.models.torch_compat import load_resnet34_encoder

    torch.manual_seed(1)
    tmodel = TUNetResNet34()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.1)
            m.running_var.data.uniform_(0.5, 1.5)
    # torchvision-style names: the reference wraps torchvision modules under
    # net_2d., so the in-test model's bare names ARE torchvision's (plus fc,
    # absent here — load_resnet34_encoder must not require it)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.startswith("dec_")}
    p_new, s_new = load_resnet34_encoder(sd)

    full_sd = {"net_2d." + k: v.numpy() for k, v in tmodel.state_dict().items()}
    full_sd["linear.weight"] = np.zeros((5, 64), np.float32)
    full_sd["linear.bias"] = np.zeros((5,), np.float32)
    p_ref, s_ref = import_reference_2d(full_sd)

    enc_keys = [k for k in p_ref
                if not k.startswith("net_2d.dec_") and not k.startswith("linear")]
    assert sorted(p_new) == sorted(enc_keys)
    for k in enc_keys:
        np.testing.assert_array_equal(p_new[k], p_ref[k])
    enc_stats = [k for k in s_ref if not k.startswith("net_2d.dec_")]
    assert sorted(s_new) == sorted(enc_stats)
    for k in enc_stats:
        np.testing.assert_array_equal(s_new[k], s_ref[k])


def test_pretrained_flag_loads_encoder_weights(tmp_path):
    """create_train_state consumes MODEL_2D pretrained via TPU.RESNET34_WEIGHTS."""
    import os

    from mopa_tpu.config.xmuda import cfg as base_cfg
    from mopa_tpu.data.build import build_dataloader
    from mopa_tpu.train import trainer as trainer_mod
    from mopa_tpu.train.common import device_batch

    torch.manual_seed(2)
    tmodel = TUNetResNet34()
    sd = {k: v for k, v in tmodel.state_dict().items()
          if not k.startswith("dec_")}
    weights_path = tmp_path / "resnet34.pth"
    torch.save(sd, weights_path)

    c = base_cfg.clone()
    c.merge_from_file(os.path.join(os.path.dirname(__file__),
                                   "../configs/synthetic/mopa_smoke.yaml"))
    c.TRAIN.BATCH_SIZE = 1
    c.TPU.POINT_BUDGET = 128
    c.TPU.RESNET34_WEIGHTS = str(weights_path)
    c.MODEL_3D.SCN.num_planes = 3
    c.MODEL_3D.SCN.m = 4
    for d in (c.DATASET_SOURCE.SyntheticSCN, c.DATASET_TARGET.SyntheticSCN):
        d.n_points = 200
        d.image_size = (32, 32)
    assert c.MODEL_2D.UNetResNet34.pretrained

    models, _ = trainer_mod.build_models(c, output_all=False)
    batch = device_batch(next(iter(build_dataloader(c, "train", "source"))))
    state = trainer_mod.create_train_state(c, models, batch)

    got = np.asarray(state.params_2d["net_2d"]["conv1"]["kernel"])
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(state.batch_stats_2d["net_2d"]["bn1"]["mean"])
    np.testing.assert_allclose(got_bn, sd["bn1.running_mean"].numpy(), rtol=1e-6)
