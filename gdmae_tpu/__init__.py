"""gdmae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) LiDAR 3D detection framework.

Re-implements the capabilities of Nightmare-n/GD-MAE (CVPR 2023) with a
TPU-first design: fixed-capacity padded token sets + validity masks instead of
ragged sparse tensors, segment/scatter and Pallas kernels instead of CUDA ops,
and a pjit mesh instead of NCCL DDP — while preserving the OpenPCDet-style
YAML config schema, batch-dict stage pipeline, and dataset/eval protocols.
"""

__version__ = "0.1.0"
