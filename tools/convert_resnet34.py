#!/usr/bin/env python
"""Convert torchvision's ImageNet-pretrained resnet34 weights to a torch-free
``.npz`` this framework loads directly (``TPU.RESNET34_WEIGHTS`` /
``MOPA_RESNET34_WEIGHTS``).

Every published reference mIoU depends on the torchvision-pretrained encoder
(``mopa/models/resnet34_unet.py:92-94`` builds the 2D UNet on
``torchvision.models.resnet34(pretrained=True)``); this environment has no
network egress, so obtain the weights on any machine with internet access:

    curl -LO https://download.pytorch.org/models/resnet34-b627a593.pth
    python tools/convert_resnet34.py resnet34-b627a593.pth resnet34_imagenet.npz

then point the config at the converted file:

    TPU.RESNET34_WEIGHTS /path/to/resnet34_imagenet.npz

The npz stores the ENCODER parameters under flax names (``params.<name>`` /
``batch_stats.<name>``, matching
``mopa_tpu.models.torch_compat.load_resnet34_encoder`` output); the decoder
stays at random init, exactly like the reference. Loading the npz needs only
numpy — torch is not imported on the training hosts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def convert(src_pth, dst_npz):
    import torch

    from mopa_tpu.models.torch_compat import load_resnet34_encoder

    sd = torch.load(src_pth, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    p_flat, s_flat = load_resnet34_encoder(sd)
    out = {"params." + k: np.asarray(v) for k, v in p_flat.items()}
    out.update({"batch_stats." + k: np.asarray(v) for k, v in s_flat.items()})
    np.savez_compressed(dst_npz, **out)
    return len(p_flat), len(s_flat)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="torchvision resnet34 .pth state_dict")
    ap.add_argument("dst", help="output .npz path")
    args = ap.parse_args()
    n_p, n_s = convert(args.src, args.dst)
    print("wrote {}: {} param arrays, {} batch-stat arrays".format(
        args.dst, n_p, n_s))


if __name__ == "__main__":
    main()
