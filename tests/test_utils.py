"""Configs, checkpointing, logging, CLI plumbing."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.utils.config import (
    EngineConfig,
    MeshConfig,
    ModelConfig,
    QuantConfig,
    from_json,
    to_json,
)


def test_config_json_roundtrip():
    for cfg in (
        QuantConfig(mode="weight_only", skip_patterns=("lm_head",)),
        ModelConfig.tiny(),
        MeshConfig(dp=2, tp=4),
        EngineConfig(max_batch_size=16),
    ):
        s = to_json(cfg)
        back = from_json(type(cfg), s)
        assert back == cfg


def test_quant_config_validation():
    with pytest.raises(ValueError):
        QuantConfig(mode="int4")
    with pytest.raises(ValueError):
        QuantConfig(kv_bits=3)
    assert QuantConfig(kv_bits=4).kv_bits == 4


def test_model_config_presets():
    assert ModelConfig.llama2_7b().num_hidden_layers == 32
    c70 = ModelConfig.llama2_70b()
    assert c70.num_key_value_heads == 8 and c70.head_dim == 128
    assert ModelConfig.tiny().hidden_size == 512


def test_checkpoint_roundtrip(tmp_path):
    from protoquant_tpu.nn import QLinear, quantize_params
    from protoquant_tpu.utils.checkpoint import load_config, restore_checkpoint, save_checkpoint

    layer = QLinear(features=16, mode="fp", dtype=jnp.float32)
    fp = layer.init(jax.random.PRNGKey(0), jnp.ones((2, 8)))
    q = quantize_params(fp)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, q, json.dumps({"hello": 1}))
    assert load_config(path) == {"hello": 1}

    restored = restore_checkpoint(path, q)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["qkernel"].data),
        np.asarray(q["params"]["qkernel"].data),
    )
    np.testing.assert_allclose(
        np.asarray(restored["params"]["qkernel"].scale),
        np.asarray(q["params"]["qkernel"].scale),
    )
    assert restored["params"]["qkernel"].axis == 0


def test_json_logger(capsys):
    from protoquant_tpu.utils.logging import get_logger

    lg = get_logger("pq_test", json_format=True)
    lg.info("hi")
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["msg"] == "hi" and rec["level"] == "INFO"


def test_step_timer():
    from protoquant_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        with t.measure():
            pass
    s = t.summary_ms()
    assert s["n"] == 5 and s["p99"] >= 0
