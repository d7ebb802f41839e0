from ..utils.config import EngineConfig
from .engine import Engine, Request
from .sampling import sample

__all__ = ["Engine", "EngineConfig", "Request", "sample"]
