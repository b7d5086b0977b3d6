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


@pytest.mark.slow
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


@pytest.mark.slow
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
    # the synthetic smoke config disables pretrained (no weights in CI);
    # this test exercises the real-data default, so re-enable it
    c.MODEL_2D.UNetResNet34.pretrained = True

    models, _ = trainer_mod.build_models(c, output_all=False)
    batch = device_batch(next(iter(build_dataloader(c, "train", "source"))))
    state = trainer_mod.create_train_state(c, models, batch)

    got = np.asarray(state.params_2d["net_2d"]["conv1"]["kernel"])
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(state.batch_stats_2d["net_2d"]["bn1"]["mean"])
    np.testing.assert_allclose(got_bn, sd["bn1.running_mean"].numpy(), rtol=1e-6)

    # the converted-npz path (tools/convert_resnet34.py output; loads with
    # numpy only) must produce identical parameters
    sys_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    import sys

    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    import convert_resnet34

    npz_path = tmp_path / "resnet34.npz"
    convert_resnet34.convert(str(weights_path), str(npz_path))
    c.TPU.RESNET34_WEIGHTS = str(npz_path)
    state_npz = trainer_mod.create_train_state(c, models, batch)
    np.testing.assert_allclose(
        np.asarray(state_npz.params_2d["net_2d"]["conv1"]["kernel"]), want,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_npz.batch_stats_2d["net_2d"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(), rtol=1e-6)


# --------------------------------------------------------------------------- #
# 3D: scn.Sequential[InputLayer, SubmanifoldConv, UNet, BNReLU, OutputLayer]
# --------------------------------------------------------------------------- #

class SCNConv(tnn.Module):
    """Parameter-registration surrogate of scn's convolutions: one ``weight``
    of shape (kernel_volume, nIn, nOut)."""

    def __init__(self, kv, cin, cout):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(kv, cin, cout) * 0.2)


def _scn_bn(c):
    bn = tnn.BatchNorm1d(c)
    bn.running_mean.data.normal_(0, 0.1)
    bn.running_var.data.uniform_(0.5, 1.5)
    bn.weight.data.normal_(1.0, 0.1)
    bn.bias.data.normal_(0, 0.1)
    return bn


def _build_scn_unet(planes):
    """scn.UNet(reps=1, VGG blocks) module tree with scn's exact child
    indices: [block, ConcatTable[Identity, Sequential[BN, Conv, U, BN,
    Deconv]], JoinTable, fuse-block] (SparseConvNet sparseconvnet/networks.py
    UNet / reference mopa/models/scn_unet.py:25-30)."""
    m = tnn.Sequential()
    p = planes[0]
    m.add_module("0", tnn.Sequential(_scn_bn(p), SCNConv(27, p, p)))
    if len(planes) > 1:
        q = planes[1]
        inner = tnn.Sequential(
            _scn_bn(p), SCNConv(8, p, q), _build_scn_unet(planes[1:]),
            _scn_bn(q), SCNConv(8, q, p))
        concat_table = tnn.Sequential()
        concat_table.add_module("0", tnn.Identity())
        concat_table.add_module("1", inner)
        m.add_module("1", concat_table)
        m.add_module("2", tnn.Identity())           # JoinTable (paramless)
        m.add_module("3", tnn.Sequential(_scn_bn(2 * p), SCNConv(27, 2 * p, p)))
    return m


class TUNetSCN(tnn.Module):
    def __init__(self, m, planes):
        super().__init__()
        self.sparseModel = tnn.Sequential()
        self.sparseModel.add_module("0", tnn.Identity())   # InputLayer
        self.sparseModel.add_module("1", SCNConv(27, 1, m))
        self.sparseModel.add_module("2", _build_scn_unet(planes))
        self.sparseModel.add_module("3", _scn_bn(m))       # BatchNormReLU
        self.sparseModel.add_module("4", tnn.Identity())   # OutputLayer


class TNet3DSeg(tnn.Module):
    def __init__(self, m, planes, num_classes):
        super().__init__()
        self.net_3d = TUNetSCN(m, planes)
        self.linear = tnn.Linear(m, num_classes)
        self.linear2 = tnn.Linear(m, num_classes)


def _np_bn(x, sd, pre):
    w, b = sd[pre + ".weight"], sd[pre + ".bias"]
    rm, rv = sd[pre + ".running_mean"], sd[pre + ".running_var"]
    return {k: np.maximum((v - rm) / np.sqrt(rv + 1e-4) * w + b, 0.0)
            for k, v in x.items()}


def _np_subconv(x, w, sites, offs27):
    out = {}
    for s in sites:
        acc = np.zeros(w.shape[-1], np.float32)
        for k in range(27):
            q = (s[0] + offs27[k][0], s[1] + offs27[k][1], s[2] + offs27[k][2])
            if q in x:
                acc = acc + x[q] @ w[k]
        out[s] = acc
    return out


def _np_unet(x, sites, planes, sd, prefix, offs27, offs8):
    x = _np_bn(x, sd, prefix + ".0.0")
    x = _np_subconv(x, sd[prefix + ".0.1.weight"], sites, offs27)
    if len(planes) > 1:
        skip = x
        y = _np_bn(x, sd, prefix + ".1.1.0")
        csites = sorted(set((s[0] // 2, s[1] // 2, s[2] // 2) for s in sites))
        w_down = sd[prefix + ".1.1.1.weight"]
        y2 = {}
        for c in csites:
            acc = np.zeros(w_down.shape[-1], np.float32)
            for oi, off in enumerate(offs8):
                f = (2 * c[0] + off[0], 2 * c[1] + off[1], 2 * c[2] + off[2])
                if f in y:
                    acc = acc + y[f] @ w_down[oi]
            y2[c] = acc
        y2 = _np_unet(y2, csites, planes[1:], sd, prefix + ".1.1.2",
                      offs27, offs8)
        y2 = _np_bn(y2, sd, prefix + ".1.1.3")
        w_up = sd[prefix + ".1.1.4.weight"]
        up = {s: y2[(s[0] // 2, s[1] // 2, s[2] // 2)]
              @ w_up[(s[0] % 2) * 4 + (s[1] % 2) * 2 + (s[2] % 2)]
              for s in sites}
        x = {s: np.concatenate([skip[s], up[s]]) for s in sites}
        x = _np_bn(x, sd, prefix + ".3.0")
        x = _np_subconv(x, sd[prefix + ".3.1.weight"], sites, offs27)
    return x


def _run_3d_import_parity(m, num_planes, ncls, scale, n_pts, seed=3,
                          rtol=1e-3, atol=1e-3):
    """import_reference_3d's depth-first walk of the scn state_dict maps every
    tensor onto the layer at the same graph position: outputs of the imported
    flax Net3DSeg match an independent numpy evaluation of the scn graph
    driven directly by the torch state_dict (eval mode)."""
    from mopa_tpu.models.torch_compat import import_reference_3d
    from mopa_tpu.models.xmuda_arch import Net3DSeg
    from mopa_tpu.models.scn_unet import build_unet_plan
    from mopa_tpu.ops.sparse_conv import kernel_offsets

    torch.manual_seed(seed)
    planes = [(i + 1) * m for i in range(num_planes)]
    tmodel = TNet3DSeg(m, planes, ncls)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    params_flat, stats_flat = import_reference_3d(sd, m=m,
                                                  num_planes=num_planes)
    # every conv/BN of the graph must be covered by the import
    n_bn = 4 * (num_planes - 1) + 2  # per level: bn1,bn_down,bn_up,bn2; +final
    n_conv = 4 * (num_planes - 1) + 2  # conv1,down,up,conv2; stem + top conv1
    assert len(stats_flat) == 2 * n_bn, sorted(stats_flat)
    n_conv_params = sum(1 for k in params_flat
                        if k.startswith("net_3d.") and k.endswith(("stem",))
                        or (k.startswith("net_3d.l") and "bn" not in k))
    assert n_conv_params == n_conv, sorted(params_flat)

    rng = np.random.default_rng(5)
    coords = np.unique(rng.integers(0, scale, size=(n_pts, 3)).astype(np.int32),
                       axis=0)
    n = coords.shape[0]
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    batch_idx = np.zeros(n, np.int32)
    valid = np.ones(n, bool)

    model = Net3DSeg(num_classes=ncls, dual_head=True, m=m,
                     num_planes=num_planes, full_scale=scale)
    # explicit overflow-free capacities: the default schedule follows the
    # LiDAR dedup curve, but random-uniform test coords barely dedup across
    # levels — parity requires that no voxel is capacity-dropped
    plan = jax.jit(lambda: build_unet_plan(
        jnp.asarray(coords), jnp.asarray(batch_idx), jnp.asarray(valid),
        num_levels=num_planes, capacities=[max(n, 128)] * num_planes))()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), plan,
                           train=False)
    params = unflatten_into(variables["params"], params_flat)
    batch_stats = unflatten_into(variables["batch_stats"], stats_flat)
    preds = model.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(feats), plan, train=False)

    # independent numpy evaluation of the scn graph
    offs27 = [tuple(o) for o in kernel_offsets(3)]
    offs8 = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    sites = [tuple(c) for c in coords]
    x = {tuple(c): f for c, f in zip(coords, feats)}
    x = _np_subconv(x, sd["net_3d.sparseModel.1.weight"], sites, offs27)
    x = _np_unet(x, sites, planes, sd, "net_3d.sparseModel.2", offs27, offs8)
    x = _np_bn(x, sd, "net_3d.sparseModel.3")
    feat_ref = np.stack([x[tuple(c)] for c in coords])
    logit_ref = feat_ref @ sd["linear.weight"].T + sd["linear.bias"]
    logit2_ref = feat_ref @ sd["linear2.weight"].T + sd["linear2.bias"]

    np.testing.assert_allclose(np.asarray(preds["feats"]), feat_ref,
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(preds["seg_logit"]), logit_ref,
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(preds["seg_logit2"]), logit2_ref,
                               rtol=rtol, atol=atol)


@pytest.mark.slow
def test_3d_checkpoint_import_output_parity():
    _run_3d_import_parity(m=2, num_planes=3, ncls=4, scale=8, n_pts=80)


@pytest.mark.slow
def test_3d_checkpoint_import_output_parity_production_shape():
    """Same parity at the SHIPPED config depth (MODEL_3D.SCN: m=16,
    num_planes=7, planes 16..112 — reference ``mopa/models/scn_unet.py:25-30``),
    proving the depth-first state-dict walk at the real recursion depth."""
    # fp32 accumulation noise grows with depth: logits reach O(1000) after
    # 7 levels, so the tolerance is relative-dominated with a small absolute
    # floor (observed max rel error ~2e-5, a 0.05% tail beyond 1e-3 abs)
    _run_3d_import_parity(m=16, num_planes=7, ncls=10, scale=256, n_pts=220,
                          seed=7, rtol=2e-3, atol=5e-2)
