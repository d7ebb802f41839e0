"""Failure detection, fault injection, and quant-quality observability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.engine.health import (
    EngineHealthError,
    Heartbeat,
    StepWatchdog,
    check_finite,
    inject_nan,
)
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig
from protoquant_tpu.utils.debug import sqnr_db, sqnr_report

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_heartbeat(tmp_path):
    hb = Heartbeat(str(tmp_path / "hb"), interval_s=0.05)
    hb.start()
    import time

    time.sleep(0.15)
    assert Heartbeat.is_alive(hb.path, stale_after_s=5)
    hb.stop()
    assert not Heartbeat.is_alive(str(tmp_path / "missing"))


def test_watchdog_fires():
    wd = StepWatchdog(budget_s=0.01)
    wd.observe(0.001)
    with pytest.raises(EngineHealthError):
        wd.observe(1.0)
    fired = []
    wd2 = StepWatchdog(budget_s=0.01, on_timeout=fired.append)
    wd2.observe(1.0)
    assert fired and wd2.timeouts == 1


def test_watchdog_adaptive():
    # Adaptive mode (budget_s=None): no budget until min_obs steps seen, so
    # compile-dominated early steps can't false-fire...
    wd = StepWatchdog(budget_s=None, floor_s=1.0, multiplier=30.0, min_obs=16)
    wd.observe(100.0)  # first-step compile: huge, tolerated
    assert wd.current_budget() is None and wd.timeouts == 0
    for _ in range(40):
        wd.observe(0.005)
    # ...then the budget tightens to max(floor, 30 x median) of the regime.
    assert wd.current_budget() == pytest.approx(1.0)
    wd.observe(0.9)  # a slow-but-under-floor step (late bucket compile): ok
    with pytest.raises(EngineHealthError):
        wd.observe(1.5)  # a real hang relative to the serving regime
    assert wd.timeouts == 1


def test_check_finite():
    check_finite("ok", jnp.ones((4,)))
    with pytest.raises(EngineHealthError):
        check_finite("bad", jnp.asarray([1.0, np.nan]))


def test_engine_detects_injected_fault(model_and_params):
    """Poison one layer's cache mid-flight; debug mode must catch it."""
    model, params = model_and_params
    cfg = EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=16,
                       max_new_tokens=8, temperature=0.0)
    eng = Engine(model, params, cfg, kv_dtype=jnp.float32, debug_checks=True)
    eng.add_request([1, 2, 3], 8)
    eng.step()  # healthy step
    eng.caches = inject_nan(eng.caches, layer=0)
    with pytest.raises(EngineHealthError):
        for _ in range(4):
            eng.step()


@pytest.mark.slow
def test_sqnr_report(model_and_params):
    model, params = model_and_params
    q_model = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 16)), jnp.int32
    )
    report = sqnr_report(model, params, q_model, quantize_params(params), tokens)
    assert report, "no layers captured"
    # int8 dynamic quantization should give healthy SQNR everywhere.
    assert all(v > 20 for v in report.values()), report


def test_sqnr_db_basic():
    a = np.ones(100)
    assert sqnr_db(a, a) == float("inf")
    assert 19 < sqnr_db(a, a + 0.1) < 21
