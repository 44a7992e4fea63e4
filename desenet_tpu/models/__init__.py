import os

from desenet_tpu.models.build import DeSeNet, ModelSpec, build_model, init_model, parse_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def config_path(name: str) -> str:
    """Resolve a bundled model config by name (e.g. 'yolov5s_seg')."""
    if os.path.exists(name):
        return name
    p = os.path.join(CONFIG_DIR, name if name.endswith(".yaml") else name + ".yaml")
    if not os.path.exists(p):
        raise FileNotFoundError(f"model config {name!r} not found (looked in {CONFIG_DIR})")
    return p


__all__ = [
    "DeSeNet",
    "ModelSpec",
    "build_model",
    "init_model",
    "parse_config",
    "config_path",
]
