from .generate import greedy_generate, perplexity, score_tokens
from .hf_import import import_hf_llama
from .kv_cache import BF16KVCache, Int8KVCache
from .eagle import EagleDraft, init_eagle, quantize_eagle, train_eagle
from .medusa import (
    HydraHeads,
    MedusaHeads,
    init_hydra,
    init_medusa,
    quantize_medusa,
    train_medusa_heads,
)
from .speculative import speculative_generate
from .llama import LlamaModel, init_cache

__all__ = [
    "LlamaModel",
    "BF16KVCache",
    "Int8KVCache",
    "init_cache",
    "greedy_generate",
    "perplexity",
    "score_tokens",
    "import_hf_llama",
    "speculative_generate",
    "MedusaHeads",
    "init_medusa",
    "train_medusa_heads",
    "EagleDraft",
    "init_eagle",
    "quantize_eagle",
    "train_eagle",
]
