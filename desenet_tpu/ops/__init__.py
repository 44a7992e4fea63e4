from desenet_tpu.ops.boxes import (
    xyxy2xywh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywhn,
    xyn2xy,
    box_iou,
    bbox_iou,
    wh_iou,
    bbox_ioa,
    clip_coords,
    scale_coords,
)
from desenet_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
    adaptive_avg_pool,
    max_pool_same,
)
from desenet_tpu.ops.nms import non_max_suppression, batched_nms

__all__ = [
    "xyxy2xywh",
    "xywh2xyxy",
    "xywhn2xyxy",
    "xyxy2xywhn",
    "xyn2xy",
    "box_iou",
    "bbox_iou",
    "wh_iou",
    "bbox_ioa",
    "clip_coords",
    "scale_coords",
    "resize_bilinear",
    "resize_nearest",
    "upsample_nearest",
    "adaptive_avg_pool",
    "max_pool_same",
    "non_max_suppression",
    "batched_nms",
]
