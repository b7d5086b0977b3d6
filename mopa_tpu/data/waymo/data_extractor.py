#!/usr/bin/env python
"""Waymo Open Dataset scan extraction (reference
``mopa/data/waymo/data_extractor.py:19-135``): reads ``.tfrecord`` sequences,
keeps TOP-lidar first returns of frames that carry segmentation labels, and
writes per-frame ``bin/<n>.bin`` (x, y, z, tanh-squashed intensity float32)
plus ``label/<n>.npy`` semantic ids.

Requires ``waymo-open-dataset`` + TensorFlow (host-side preprocessing deps,
not in the TPU image — run where the raw data lives).
"""

import argparse
import glob
import os

import numpy as np


def extract_pc(seq_path, scen_dir):
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2 as open_dataset
    from waymo_open_dataset.utils import frame_utils

    def range_labels(frame, range_images, segmentation_labels, ri_index=0):
        calibrations = sorted(frame.context.laser_calibrations,
                              key=lambda c: c.name)
        point_labels = []
        for c in calibrations:
            range_image = range_images[c.name][ri_index]
            ri = tf.reshape(tf.convert_to_tensor(range_image.data),
                            range_image.shape.dims)
            mask = ri[..., 0] > 0
            if c.name in segmentation_labels:
                sl = segmentation_labels[c.name][ri_index]
                slt = tf.reshape(tf.convert_to_tensor(sl.data), sl.shape.dims)
                pts = tf.gather_nd(slt, tf.where(mask))
            else:
                n = tf.math.reduce_sum(tf.cast(mask, tf.int32))
                pts = tf.zeros([n, 2], dtype=tf.int32)
            point_labels.append(pts.numpy())
        return point_labels

    seq_data = tf.data.TFRecordDataset(seq_path, compression_type="")
    lidar_dir = os.path.join(scen_dir, "bin")
    label_dir = os.path.join(scen_dir, "label")
    os.makedirs(lidar_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)

    frame_num = 0
    for data in seq_data:
        frame = open_dataset.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        if not frame.lasers[0].ri_return1.segmentation_label_compressed:
            continue
        (range_images, camera_projections, segmentation_labels,
         range_image_top_pose) = \
            frame_utils.parse_range_image_and_camera_projection(frame)
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            keep_polar_features=True)
        # TOP lidar, (range, intensity, elongation, x, y, z) with polar feats
        pts = points[0]
        xyz_i = np.concatenate(
            [pts[:, 3:6], np.tanh(pts[:, 1]).reshape(-1, 1)], axis=1)
        labels = range_labels(frame, range_images, segmentation_labels)[0][:, 1]

        xyz_i.astype(np.float32).tofile(
            os.path.join(lidar_dir, "{:05d}.bin".format(frame_num)))
        np.save(os.path.join(label_dir, "{:05d}.npy".format(frame_num)), labels)
        frame_num += 1
    return frame_num


def main():
    parser = argparse.ArgumentParser(description="Waymo scan extraction")
    parser.add_argument("--src_dir", required=True,
                        help="directory of .tfrecord sequences")
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()
    for seq_path in sorted(glob.glob(os.path.join(args.src_dir, "*.tfrecord"))):
        name = os.path.splitext(os.path.basename(seq_path))[0]
        scen_dir = os.path.join(args.out_dir, name)
        n = extract_pc(seq_path, scen_dir)
        print("{}: {} labeled frames".format(name, n))


if __name__ == "__main__":
    main()
