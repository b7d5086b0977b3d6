"""Checkpoint name-mapping utilities: flax pytrees <-> flat torch-style dicts.

Checkpoints are stored as flat ``name -> numpy array`` dicts inside ``.pth``
files (reference checkpoint format, ``mopa/common/utils/checkpoint.py:39-58``),
so tooling that reads the reference's checkpoints keeps working.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def flatten_pytree(tree, prefix=""):
    """Flatten a pytree into {'a.b.c': np.ndarray}."""
    out = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, path + (str(k),))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(v, path + (str(i),))
        elif node is None:
            pass
        elif hasattr(node, "_fields"):  # NamedTuple (optax states)
            for k in node._fields:
                visit(getattr(node, k), path + (k,))
        else:
            out[".".join(path)] = np.asarray(node)

    visit(tree, tuple(prefix.split(".")) if prefix else tuple())
    return out


def _t_conv(w):
    """torch Conv2d (O, I, H, W) -> flax (H, W, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_tconv(w):
    """torch ConvTranspose2d (I, O, H, W) -> flax ConvTranspose (H, W, I, O).

    flax's ConvTranspose (transpose_kernel=False) applies the kernel without
    the spatial flip torch uses, so flip H and W.
    """
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def _t_linear(w):
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return np.transpose(np.asarray(w), (1, 0))


def import_reference_2d(state_dict, dual_head=True):
    """Map a reference Net2DSeg torch state_dict (UNetResNet34 backbone,
    reference ``mopa/models/xmuda_arch.py:22-79`` / ``resnet34_unet.py``)
    onto this framework's flax parameter names.

    Returns (params_flat, batch_stats_flat) as flat name->array dicts suitable
    for :func:`unflatten_into`.
    """
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}
    params = {}
    stats = {}

    def bn(src, dst):
        params[dst + ".scale"] = sd[src + ".weight"]
        params[dst + ".bias"] = sd[src + ".bias"]
        stats[dst + ".mean"] = sd[src + ".running_mean"]
        stats[dst + ".var"] = sd[src + ".running_var"]

    def conv(src, dst, bias=False):
        params[dst + ".kernel"] = _t_conv(sd[src + ".weight"])
        if bias:
            params[dst + ".bias"] = sd[src + ".bias"]

    net = "net_2d"
    conv("net_2d.conv1", net + ".conv1")
    bn("net_2d.bn1", net + ".bn1")
    blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for layer, n_blocks in blocks.items():
        for b in range(n_blocks):
            src = "net_2d.{}.{}".format(layer, b)
            dst = "{}.{}.block{}".format(net, layer, b)
            conv(src + ".conv1", dst + ".conv1")
            bn(src + ".bn1", dst + ".bn1")
            conv(src + ".conv2", dst + ".conv2")
            bn(src + ".bn2", dst + ".bn2")
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ".downsample_conv")
                bn(src + ".downsample.1", dst + ".downsample_bn")
    # decoder: Sequential(t_conv/conv, bn, relu)
    for name in ("dec_t_conv_stage5", "dec_t_conv_stage4", "dec_t_conv_stage3",
                 "dec_t_conv_stage2"):
        src = "net_2d." + name
        dst = "{}.{}".format(net, name)
        params[dst + ".tconv.kernel"] = _t_tconv(sd[src + ".0.weight"])
        params[dst + ".tconv.bias"] = sd[src + ".0.bias"]
        bn(src + ".1", dst + ".bn")
    for name in ("dec_conv_stage4", "dec_conv_stage3", "dec_conv_stage2"):
        src = "net_2d." + name
        dst = "{}.{}".format(net, name)
        params[dst + ".conv.kernel"] = _t_conv(sd[src + ".0.weight"])
        params[dst + ".conv.bias"] = sd[src + ".0.bias"]
        bn(src + ".1", dst + ".bn")
    params[net + ".dec_conv_stage1.kernel"] = _t_conv(sd["net_2d.dec_conv_stage1.weight"])
    params[net + ".dec_conv_stage1.bias"] = sd["net_2d.dec_conv_stage1.bias"]

    params["linear.kernel"] = _t_linear(sd["linear.weight"])
    params["linear.bias"] = sd["linear.bias"]
    if dual_head and "linear2.weight" in sd:
        params["linear2.kernel"] = _t_linear(sd["linear2.weight"])
        params["linear2.bias"] = sd["linear2.bias"]
    return params, stats


def load_resnet34_encoder(state_dict, prefix="net_2d"):
    """Map a torchvision ``resnet34`` state_dict onto the UNetResNet34
    ENCODER parameter names (decoder stays at its random initialisation,
    exactly like the reference, which builds the decoder fresh on top of
    ``torchvision.models.resnet34(pretrained=True)`` —
    ``mopa/models/resnet34_unet.py:92-110``).

    Accepts either bare torchvision names (``conv1.weight``, ``layer1.0...``)
    or the same under a ``net_2d.`` / ``module.`` prefix. ``fc.*`` and
    ``num_batches_tracked`` entries are ignored.

    Returns (params_flat, batch_stats_flat) for :func:`unflatten_into`.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        if k.startswith("net_2d."):
            k = k[len("net_2d."):]
        sd[k] = np.asarray(v)
    params = {}
    stats = {}

    def bn(src, dst):
        params[dst + ".scale"] = sd[src + ".weight"]
        params[dst + ".bias"] = sd[src + ".bias"]
        stats[dst + ".mean"] = sd[src + ".running_mean"]
        stats[dst + ".var"] = sd[src + ".running_var"]

    def conv(src, dst):
        params[dst + ".kernel"] = _t_conv(sd[src + ".weight"])

    conv("conv1", prefix + ".conv1")
    bn("bn1", prefix + ".bn1")
    blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for layer, n_blocks in blocks.items():
        for b in range(n_blocks):
            src = "{}.{}".format(layer, b)
            dst = "{}.{}.block{}".format(prefix, layer, b)
            conv(src + ".conv1", dst + ".conv1")
            bn(src + ".bn1", dst + ".bn1")
            conv(src + ".conv2", dst + ".conv2")
            bn(src + ".bn2", dst + ".bn2")
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ".downsample_conv")
                bn(src + ".downsample.1", dst + ".downsample_bn")
    return params, stats


def import_reference_3d(state_dict, m=16, num_planes=7, dual_head=True):
    """Map a reference Net3DSeg (SparseConvNet UNet) torch state_dict onto the
    flax SparseUNet names.

    SparseConvNet stores SubmanifoldConvolution weights as
    (kernel_volume, nIn, nOut) with offsets enumerated z-fastest and
    Convolution/Deconvolution (size-2) weights as (8, nIn, nOut); this matches
    our (K, Cin, Cout) layout with dz-fastest offsets (ops.sparse_conv
    kernel_offsets), so weights pass through untransposed. BN layers store
    weight/bias/running_mean/running_var.

    The reference's sparseModel is scn.Sequential: [InputLayer,
    SubmanifoldConvolution (stem), UNet, BatchNormReLU, OutputLayer]; the UNet
    recursion flattens into a module list whose linear order is depth-first
    (block, down-BN+conv, <recurse>, up-BN+deconv, join, fuse-block). This
    importer walks the same depth-first order.
    """
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}
    params = {}
    stats = {}

    # sorted keys belonging to the scn UNet, in torch's registration order
    def put_bn(src, dst):
        params[dst + ".scale"] = sd[src + ".weight"]
        params[dst + ".bias"] = sd[src + ".bias"]
        stats[dst + ".mean"] = sd[src + ".running_mean"]
        stats[dst + ".var"] = sd[src + ".running_var"]

    # stem conv: sparseModel.1.weight (kv*nIn, nOut) or (kv, nIn, nOut)
    def scn_w(key, k, cin, cout):
        w = sd[key]
        return w.reshape(k, cin, cout)

    prefix = "net_3d.sparseModel."
    params["net_3d.stem"] = scn_w(prefix + "1.weight", 27, 1, m)

    # the recursive UNet lives under sparseModel.2; enumerate its keys in
    # order and zip against our depth-first parameter names
    unet_keys = sorted(
        (k for k in sd if k.startswith(prefix + "2.")),
        key=lambda s: [int(p) if p.isdigit() else p for p in s.split(".")])

    # our depth-first name sequence
    def df_names(level, planes):
        p = planes[level]
        names = [("bn", "net_3d.l{}_bn1".format(level), p),
                 ("conv27", "net_3d.l{}_conv1".format(level), (p, p))]
        if level + 1 < len(planes):
            q = planes[level + 1]
            names += [("bn", "net_3d.l{}_bn_down".format(level), p),
                      ("conv8", "net_3d.l{}_down".format(level), (p, q))]
            names += df_names(level + 1, planes)
            names += [("bn", "net_3d.l{}_bn_up".format(level), q),
                      ("conv8", "net_3d.l{}_up".format(level), (q, p)),
                      ("bn", "net_3d.l{}_bn2".format(level), 2 * p),
                      ("conv27", "net_3d.l{}_conv2".format(level), (2 * p, p))]
        return names

    planes = [(i + 1) * m for i in range(num_planes)]
    seq = df_names(0, planes)

    # group torch keys by module path (strip trailing param name)
    module_order = []
    seen = set()
    for k in unet_keys:
        mod = k.rsplit(".", 1)[0]
        if mod not in seen:
            seen.add(mod)
            module_order.append(mod)

    si = 0
    for mod in module_order:
        if si >= len(seq):
            break
        kind, dst, shape = seq[si]
        if kind == "bn":
            if mod + ".running_mean" not in sd:
                continue
            put_bn(mod, dst)
            si += 1
        else:
            if mod + ".weight" not in sd or mod + ".running_mean" in sd:
                continue
            k = 27 if kind == "conv27" else 8
            cin, cout = shape
            params[dst] = scn_w(mod + ".weight", k, cin, cout)
            si += 1

    put_bn(prefix + "3", "net_3d.final_bn")
    params["linear.kernel"] = _t_linear(sd["linear.weight"])
    params["linear.bias"] = sd["linear.bias"]
    if dual_head and "linear2.weight" in sd:
        params["linear2.kernel"] = _t_linear(sd["linear2.weight"])
        params["linear2.bias"] = sd["linear2.bias"]
    return params, stats


def unflatten_into(template, flat):
    """Rebuild a pytree shaped like ``template`` from a flat name dict.

    Missing keys keep the template's value; shape mismatches raise.
    """
    leaves = dict(flat)

    def visit(node, path):
        if isinstance(node, dict):
            return {k: visit(v, path + (str(k),)) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[visit(getattr(node, k), path + (k,))
                                for k in node._fields])
        if isinstance(node, (list, tuple)):
            return type(node)(visit(v, path + (str(i),))
                              for i, v in enumerate(node))
        if node is None:
            return None
        key = ".".join(path)
        if key in leaves:
            val = np.asarray(leaves[key])
            if hasattr(node, "shape") and tuple(val.shape) != tuple(node.shape):
                raise ValueError(
                    "shape mismatch for {}: ckpt {} vs model {}".format(
                        key, val.shape, node.shape))
            return jnp.asarray(val, dtype=getattr(node, "dtype", None))
        return node

    return visit(template, tuple())
