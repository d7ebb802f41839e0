"""Speculative decoding: greedy spec-decode must EXACTLY match target-only
greedy decoding (the defining property), for any draft model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel, greedy_generate
from protoquant_tpu.models.speculative import speculative_generate
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

TARGET_CFG = ModelConfig(
    vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)
DRAFT_CFG = ModelConfig(
    vocab_size=96, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
    num_attention_heads=2, num_key_value_heads=1, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def models():
    target = LlamaModel(TARGET_CFG, mode="fp", dtype=jnp.float32)
    draft = LlamaModel(DRAFT_CFG, mode="fp", dtype=jnp.float32)
    tp = target.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    dp = draft.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    return target, tp, draft, dp


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_speculative_matches_target_greedy(models, gamma):
    target, tp, draft, dp = models
    prompt = jnp.asarray([[5, 9, 2, 7, 1]], jnp.int32)
    N = 20
    ref = np.asarray(greedy_generate(target, tp, prompt, N, 128, kv_dtype=jnp.float32))

    out, stats = speculative_generate(
        target, tp, draft, dp, prompt, N, gamma=gamma
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats["proposed"] > 0
    # The target must have run fewer forwards than tokens generated whenever
    # anything was accepted.
    if stats["accepted"] > 0:
        assert stats["target_calls"] < N + 1


def test_speculative_self_draft_accepts_everything(models):
    """Target as its own draft: every proposal must be accepted (exercises
    the all-gamma-accepted cache-alignment path)."""
    target, tp, _, _ = models
    prompt = jnp.asarray([[3, 14, 15, 9]], jnp.int32)
    N = 16
    ref = np.asarray(greedy_generate(target, tp, prompt, N, 128, kv_dtype=jnp.float32))
    out, stats = speculative_generate(target, tp, target, tp, prompt, N, gamma=4)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats["acceptance_rate"] == 1.0
    assert stats["target_calls"] <= 2 + N // 5 + 1  # ~N/(gamma+1) target calls
