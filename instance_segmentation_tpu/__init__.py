"""instance_segmentation_tpu — a TPU-native (JAX/XLA/Pallas) instance-segmentation framework.

A from-scratch rebuild of the capabilities of the reference single-stage
instance segmenter "EfficientSeg" (aspirantll/instance-segmentation):
EfficientNet backbone -> BiFPN -> anchor box/class heads, plus a U-Net
per-pixel decoder with three dense heads (boundary-keypoint heatmap `kp`,
spatial-embedding+sigma field `ae`, boundary-tangent field `tan`), with
instance masks recovered by grouping boundary keypoints to detected object
centers via Gaussian embedding affinity.

Design stance (TPU-first, not a port):
  * static shapes everywhere (padded instances/vertices/boundary points),
  * target generation and losses fully on-device (the reference renders
    targets in per-instance numpy/cv2 loops on host every training step),
  * decode (NMS, peak selection, affinity grouping, polygon assembly)
    on-device with fixed-size buffers,
  * NHWC layout, bf16-friendly compute, cross-replica BatchNorm via global
    reductions under GSPMD, data/spatial parallelism via jax.sharding.Mesh.

Reference parity notes cite file:line into /root/reference throughout.
"""

__version__ = "0.1.0"
