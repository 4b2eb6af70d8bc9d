"""partner_tpu — a TPU-native JAX framework for polar LiDAR 3D detection.

Re-engineers the capabilities of the det3d/PolarStream/PARTNER stack
(reference: fudan-zvg/PARTNER) as an idiomatic JAX/XLA/Pallas framework:

- polar (cylindrical) voxelization, on host (numpy) and on device (segment ops)
- a capacity-bounded gather/scatter sparse 3D backbone replacing spconv
- PARTNER's global re-alignment attention (SetBlock) and instance-aware
  vote-conditioned Swin head (E2ESWVoteHead) as fused window-attention modules
- CenterPoint-style heads, rotated IoU/NMS on device, Hungarian set matching
- pjit/shard_map training over a (data, model, azimuth) device mesh

Public API mirrors det3d's entry points (``build_detector``, python-module
configs with registry ``type`` strings) so reference configs port with
minimal edits.
"""

__version__ = "0.1.0"
