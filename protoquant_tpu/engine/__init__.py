from ..utils.config import EngineConfig
from .engine import Engine, Request
from .recovery import (
    RequestJournal,
    journaled_add_request,
    replay_unfinished,
    serve_until_peer_failure,
)
from .sampling import sample

__all__ = [
    "Engine", "EngineConfig", "Request", "sample",
    "RequestJournal", "journaled_add_request", "replay_unfinished",
    "serve_until_peer_failure",
]
