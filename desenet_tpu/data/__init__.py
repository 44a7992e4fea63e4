from desenet_tpu.data.dataset import MixedDataset, pad_det_targets
from desenet_tpu.data.loader import DataLoader, create_mixed_dataloader
from desenet_tpu.data.augment import letterbox

__all__ = [
    "MixedDataset",
    "pad_det_targets",
    "DataLoader",
    "create_mixed_dataloader",
    "letterbox",
]
