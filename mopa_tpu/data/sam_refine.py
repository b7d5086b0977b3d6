#!/usr/bin/env python
"""Offline SAM mask generation (reference ``mopa/data/sam_refine.py:42-248``).

Generates per-image mask-id maps for the SAM-consistency loss: masks from an
automatic mask generator are sorted by area (descending) and rasterised into
one uint8 id map written as ``.bin`` (largest masks first, so later/smaller
masks overwrite inside larger ones — reference ``single_mask_generator``).

The mask *generator* is pluggable: the reference used segment-anything's
``SamAutomaticMaskGenerator`` (PyTorch, vit-h weights). This module accepts
any callable ``image -> list[{'segmentation': HxW bool, 'area': int}]``;
``make_sam_generator`` builds one from segment-anything when that package and
a checkpoint are available (host-side offline dependency). Mask *consumption*
(the on-device mask-pooled consistency loss) lives in
``mopa_tpu.models.losses.mask_cons_loss``.
"""

import argparse
import glob
import os
import os.path as osp

import numpy as np
from PIL import Image


def rasterize_masks(masks, image_hw):
    """Sorted-by-area-descending rasterisation into one uint8 id map
    (reference sam_refine.py:127-152). id 255 = unassigned."""
    h, w = image_hw
    id_map = np.full((h, w), 255, np.uint8)
    masks = sorted(masks, key=lambda m: int(m["area"]), reverse=True)
    for new_id, m in enumerate(masks[:255]):
        id_map[np.asarray(m["segmentation"], bool)] = new_id
    return id_map


def single_mask_generator(generator, image_path, out_path):
    image = np.array(Image.open(image_path).convert("RGB"))
    masks = generator(image)
    id_map = rasterize_masks(masks, image.shape[:2])
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    id_map.tofile(out_path)
    return id_map


def make_sam_generator(checkpoint, model_type="vit_h", device="cpu"):
    """Build the segment-anything automatic generator (offline host dep)."""
    from segment_anything import (SamAutomaticMaskGenerator,
                                  sam_model_registry)

    sam = sam_model_registry[model_type](checkpoint=checkpoint)
    sam.to(device)
    gen = SamAutomaticMaskGenerator(sam)

    def run(image):
        return gen.generate(image)

    return run


def kitti_mask_generator(generator, root_dir, scenes, mask_dir="img_mask"):
    """Per-sequence driver (reference sam_refine.py:155-195)."""
    for scene in scenes:
        cam_paths = sorted(glob.glob(
            osp.join(root_dir, "dataset", "sequences", scene, "image_2", "*.png")))
        out_dir = osp.join(root_dir, mask_dir, scene)
        for cam_path in cam_paths:
            frame_id = osp.splitext(osp.basename(cam_path))[0]
            single_mask_generator(generator, cam_path,
                                  osp.join(out_dir, frame_id + ".bin"))
        print("SAM masks for sequence {} -> {}".format(scene, out_dir))


def nuscenes_mask_generator(generator, nuscenes_dir, pkl_file, split_name,
                            mask_dir="img_mask"):
    """Per-pkl driver (reference sam_refine.py:198-248)."""
    import pickle

    with open(pkl_file, "rb") as f:
        data_list = pickle.load(f)
    for data in data_list:
        cam_path = osp.join(nuscenes_dir, data["camera_path"])
        prefix, fname = data["camera_path"].split("/")[-2:]
        out_path = osp.join(nuscenes_dir, mask_dir, split_name, prefix,
                            fname.replace(".jpg", ".bin"))
        single_mask_generator(generator, cam_path, out_path)
    print("SAM masks for {} -> {}".format(pkl_file, mask_dir))


def main():
    parser = argparse.ArgumentParser(description="SAM mask generation")
    parser.add_argument("--dataset", choices=["kitti", "nuscenes"],
                        required=True)
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="segment-anything .pth checkpoint")
    parser.add_argument("--model_type", default="vit_h")
    parser.add_argument("--scenes", nargs="+", default=None)
    parser.add_argument("--pkl", default=None)
    parser.add_argument("--split", default=None)
    args = parser.parse_args()
    generator = make_sam_generator(args.checkpoint, args.model_type)
    if args.dataset == "kitti":
        from mopa_tpu.data.semantic_kitti import splits

        scenes = args.scenes or splits.train
        kitti_mask_generator(generator, args.root_dir, scenes)
    else:
        assert args.pkl and args.split
        nuscenes_mask_generator(generator, args.root_dir, args.pkl, args.split)


if __name__ == "__main__":
    main()
