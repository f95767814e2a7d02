"""LCR-Net TPU: a TPU-native JAX/Pallas framework for LiDAR loop closing and
relocalization.

Re-designed from scratch for TPU (reference capability surface:
nubot-nudt/LCR-Net — see SURVEY.md). The compute path is pure JAX/XLA/Pallas
with static shapes, dense padded layouts and masks; the host runtime (data
loading, voxel pre-downsampling) has a native C++ path.

Top-level layout:
  lcrnet_tpu.ops       — point-cloud ops library (subsample, radius search,
                         partition, NMS, Sinkhorn, Procrustes, SE(3))
  lcrnet_tpu.models    — flax modules (KPConv backbone, 3D-RoFormer, NetVLAD,
                         matching heads) and the LCRNet model family
  lcrnet_tpu.data      — datasets (KITTI & friends), augmentation, host loader
  lcrnet_tpu.parallel  — mesh / sharding utilities (dp + mp axes)
  lcrnet_tpu.engine    — trainer/tester, checkpointing, logging, optimizers
  lcrnet_tpu.utils     — metrics, retrieval database, numpy SE(3) helpers
"""

__version__ = "0.1.0"
