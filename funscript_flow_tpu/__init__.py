"""funscript_flow_tpu — TPU-native video-to-motion-script framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ConwayBeyond/Funscript-Flow (reference mounted at /root/reference): decode a
video on the host, stream fixed-size grayscale frame-pair batches into HBM,
run pyramidal dense optical flow plus all per-pair reductions as one compiled
device program, then a vectorized 1-D signal chain, and emit a ``.funscript``
JSON motion file.

Layering (host -> device):
  io/        host decode, device feed, funscript JSON
  ops/       flow + signal numerics (JAX), pallas/ fused TPU kernels
  models/    the end-to-end per-chunk device program ("flow pipeline")
  parallel/  mesh construction + sharding rules (batch axis, time halo)
  utils/     params, logging, progress
  cli        headless entry point (argparse-compatible with the reference)
"""

__version__ = "0.1.0"
