"""desenet_tpu — a TPU-native (JAX/XLA/Pallas) detection+segmentation framework.

A from-scratch rebuild of the capabilities of splwany/DeSeNet (YOLOv5s CSP
backbone + PANet neck + joint Detect & semantic-segmentation heads), designed
TPU-first:

- functional core: params/batch_stats as pytrees, pure ``apply`` (flax.linen)
- NHWC layouts, bf16 compute / fp32 params & stats
- everything between host preprocessing and final boxes/masks is ONE jitted
  function (forward + Detect decode + fixed-shape NMS + seg argmax)
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding; XLA emits the
  collectives (no hand-written comm layer)
- host-side cv2/numpy input pipeline with double-buffered device prefetch

Reference behavior citations point into the upstream repo (read-only mount at
/root/reference) as ``file:line``.
"""

__version__ = "0.1.0"
