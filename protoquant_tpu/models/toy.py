"""Toy 2-layer d=512 transformer (acceptance config 2, BASELINE.json:8).

A named alias over the Llama architecture at ModelConfig.tiny() scale, with
every projection routed through QLinear — the minimum end-to-end slice of
the north-star data path (SURVEY.md §8.2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import ModelConfig
from .llama import LlamaModel


def toy_transformer(
    mode: str = "dynamic", vocab_size: int = 256, dtype=jnp.float32
) -> LlamaModel:
    return LlamaModel(ModelConfig.tiny(vocab_size=vocab_size), mode=mode, dtype=dtype)
