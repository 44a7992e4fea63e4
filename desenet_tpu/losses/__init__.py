from desenet_tpu.losses.detection import DetectionLoss, smooth_bce
from desenet_tpu.losses.segmentation import segmentation_loss

__all__ = ["DetectionLoss", "smooth_bce", "segmentation_loss"]
