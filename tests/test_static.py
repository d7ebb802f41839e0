"""W8A8-STATIC activation quantization (nn/static.py, QLinear mode
"static" — round 4, the prefill-gap line of attack).

1. Numerics: the static op equals its reference formulation exactly.
2. Calibration: act_scale = amax/127 of the fp model's real per-linear
   inputs; an uncalibrated (scale=1) tree clips and calibration fixes it.
3. Model quality: static tracks dynamic closely on the fp model's logits.
4. Serving: the engine decodes a static checkpoint; CLI convert --mode
   static round-trips.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params, static_quantize
from protoquant_tpu.utils.config import ModelConfig, QuantConfig

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def setup():
    fp = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 12)), jnp.int32
    )
    params = fp.init(jax.random.PRNGKey(0), toks)
    return fp, params, toks


def test_static_op_matches_reference():
    from protoquant_tpu.ops import static_qlinear_xla

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (16, 8), dtype=np.int8))
    sw = jnp.asarray(rng.uniform(0.01, 0.05, (8,)), jnp.float32)
    s_act = jnp.float32(0.02)
    got = np.asarray(
        static_qlinear_xla(x, w8, sw, s_act, out_dtype=jnp.float32)
    )
    xq = np.clip(np.round(np.asarray(x) / 0.02), -127, 127)
    ref = (xq @ np.asarray(w8, np.float64)) * 0.02 * np.asarray(sw)[None, :]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_calibration_fills_scales_and_beats_identity(setup):
    fp, params, toks = setup
    qp = static_quantize(fp, params, toks)
    scales = []

    def walk(t):
        if isinstance(t, dict):
            if "act_scale" in t:
                scales.append(float(t["act_scale"]))
            for v in t.values():
                if isinstance(v, dict):
                    walk(v)

    walk(qp["params"])
    assert scales and all(0 < s < 1.0 for s in scales), scales
    assert len(set(np.round(scales, 9))) > 1  # per-linear, not global

    sm = LlamaModel(CFG, mode="static", dtype=jnp.float32)
    ref = np.asarray(fp.apply(params, toks))

    def cos(p):
        out = np.asarray(sm.apply(p, toks))
        return float(
            (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
        )

    # Uncalibrated act_scale=1.0 clips everything to tiny integers.
    qp_id = quantize_params(params, QuantConfig(mode="static"))
    assert cos(qp) > 0.995
    assert cos(qp) > cos(qp_id) + 0.05, (cos(qp), cos(qp_id))


def test_static_tracks_dynamic(setup):
    fp, params, toks = setup
    ref = np.asarray(fp.apply(params, toks))

    qp_s = static_quantize(fp, params, toks)
    out_s = np.asarray(
        LlamaModel(CFG, mode="static", dtype=jnp.float32).apply(qp_s, toks)
    )
    qp_d = quantize_params(params, QuantConfig(mode="dynamic"))
    out_d = np.asarray(
        LlamaModel(CFG, mode="dynamic", dtype=jnp.float32).apply(qp_d, toks)
    )

    def cos(a):
        return float(
            (ref * a).sum() / (np.linalg.norm(ref) * np.linalg.norm(a))
        )

    # Static pays a small premium vs per-token dynamic, bounded on the
    # calibration distribution.
    assert cos(out_s) > 0.99
    assert cos(out_s) > cos(out_d) - 0.01, (cos(out_s), cos(out_d))


def test_static_engine_serves(setup):
    from protoquant_tpu.engine import Engine, EngineConfig

    fp, params, toks = setup
    qp = static_quantize(fp, params, toks)
    model = LlamaModel(CFG, mode="static", dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    eng = Engine(model, qp, ecfg, kv_dtype=jnp.int8)
    rid = eng.add_request([5, 9, 2, 7], 8)
    out = eng.run()[rid]
    assert len(out) == 8 and all(0 <= t < 64 for t in out)
    # Determinism across a re-run.
    eng2 = Engine(model, qp, ecfg, kv_dtype=jnp.int8)
    rid2 = eng2.add_request([5, 9, 2, 7], 8)
    assert eng2.run()[rid2] == out


# CLI convert --mode static e2e lives in tests/test_cli.py (shared
# weights_and_config fixture).


def test_static_tp_matches_single_device(setup):
    """mode='static' under a TP mesh: act_scale replicates; row-parallel
    shards quantize their K-slice with the same scalar (exact — the
    epilogue is linear and rides the psum). Logits match single-device."""
    import pytest

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    from protoquant_tpu.parallel import (
        build_tp_score,
        make_mesh,
        shard_params,
        tp_model,
    )
    from protoquant_tpu.utils.config import MeshConfig

    fp, params, toks = setup
    qp = static_quantize(fp, params, toks)
    single = LlamaModel(CFG, mode="static", dtype=jnp.float32)
    ref = np.asarray(single.apply(qp, toks))

    # tp=2: CFG has 2 kv heads (tp=4 would shard them to zero).
    mesh = make_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    model_tp = tp_model(CFG, "static", mesh, dtype=jnp.float32)
    sq = shard_params(qp, mesh)
    with mesh:
        out = np.asarray(build_tp_score(model_tp, mesh, qp)(sq, toks))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
