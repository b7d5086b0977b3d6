"""MoPA-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the MoPA multi-modal
unsupervised domain adaptation framework for 3D semantic segmentation.

Reference: AronCao49/MoPA (ICRA'24). The compute path (2D ResNet34-UNet, 3D
submanifold sparse-conv UNet, cross-modal losses, VGI rare-object insertion,
SAM mask consistency) is re-designed for TPU: static shapes, fixed-capacity
voxel hash tables, gather-GEMM-scatter sparse convolutions, and a
``shard_map``-based data-parallel training step.
"""

__version__ = "0.1.0"
