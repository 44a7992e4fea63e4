from desenet_tpu.eval.validator import Validator, seg_validation

__all__ = ["Validator", "seg_validation"]
