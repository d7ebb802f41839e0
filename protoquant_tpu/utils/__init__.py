from .config import EngineConfig, MeshConfig, ModelConfig, QuantConfig, from_json, to_json

__all__ = [
    "QuantConfig",
    "ModelConfig",
    "MeshConfig",
    "EngineConfig",
    "to_json",
    "from_json",
]
