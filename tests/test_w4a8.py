"""W4A8 (dynamic_int4): int4 group-wise weights x dynamic int8 activations
on the int8 MXU — ops/w4a8_matmul.py vs the pure-jnp contract
(core.numerics.dynamic_int4_linear_ref), plus the QLinear / convert /
engine / CLI surfaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import numerics
from protoquant_tpu.ops.w4a8_matmul import w4a8_matmul

pytestmark = pytest.mark.slow


def _mk(m, k, n, group, seed=0, bias=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    q, s = numerics.quantize_groupwise_int4(w, group=group)
    packed = numerics.pack_int4(q, group)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32) if bias else None
    return x, packed, s, b


@pytest.mark.parametrize(
    "m,k,n,group",
    [(8, 256, 128, 128), (33, 384, 200, 128), (128, 256, 384, 64),
     (1, 128, 128, 128)],
)
def test_w4a8_matches_reference(m, k, n, group):
    """Kernel vs the jnp reference across padding/odd shapes: the integer
    dots are exact; only the f32 group accumulation order differs."""
    x, packed, s, b = _mk(m, k, n, group, seed=m + n, bias=(m % 2 == 0))
    ref = numerics.dynamic_int4_linear_ref(
        x, packed, s, group, bias=b, out_dtype=jnp.float32
    )
    xq, sx = numerics.quantize_rowwise(x)
    got = w4a8_matmul(
        xq, sx, packed, s, group=group, bias=b, out_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_w4a8_single_group_exact():
    """One quantization group: a single int32 dot and one f32 scale — the
    kernel and reference agree to the last float."""
    x, packed, s, _ = _mk(16, 128, 128, 128, seed=3)
    xq, sx = numerics.quantize_rowwise(x)
    ref = numerics.dynamic_int4_linear_ref(
        x, packed, s, 128, out_dtype=jnp.float32
    )
    got = w4a8_matmul(xq, sx, packed, s, group=128, out_dtype=jnp.float32,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def _two_level_ref(x, packed, s, group, bias=None):
    """Emulated two-level semantics (the kernel's exact contract): nibbles
    requantize to int8 against the column's max group scale, ONE integer
    dot, rank-1 x rank-1 epilogue."""
    xq, sx = numerics.quantize_rowwise(x)
    q = numerics.unpack_int4(packed, group).astype(np.float32)  # [K, N]
    s_np = np.asarray(s, np.float32)
    scol = s_np.max(axis=0)  # [N]
    r16 = s_np * np.where(scol > 0, 16.0 / scol, 0.0)  # [G, N]
    k, n = q.shape
    w8 = np.asarray(
        np.round(np.asarray(q) * np.repeat(r16, group, axis=0)), np.int32
    )
    acc = np.asarray(xq, np.int32) @ w8
    y = acc.astype(np.float32) * np.asarray(sx)[:, None] * (scol / 16.0)
    if bias is not None:
        y = y + np.asarray(bias, np.float32)
    return y


@pytest.mark.parametrize(
    "m,k,n,group",
    [(8, 256, 128, 128), (33, 384, 200, 128), (128, 256, 384, 64)],
)
def test_w4a8_two_level_matches_its_contract(m, k, n, group):
    """formulation='two_level' vs the emulated requant reference: the
    integer dot and the round() are both exact, so agreement is to f32
    epilogue rounding."""
    x, packed, s, b = _mk(m, k, n, group, seed=m + n, bias=(m % 2 == 0))
    ref = _two_level_ref(x, packed, s, group, bias=b)
    xq, sx = numerics.quantize_rowwise(x)
    got = w4a8_matmul(
        xq, sx, packed, s, group=group, bias=b, out_dtype=jnp.float32,
        formulation="two_level", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_w4a8_two_level_close_to_group_formulation():
    """The requant adds <= 0.5/16 of a column-scale unit per weight: the
    two formulations agree to ~1% relative on well-scaled weights (the
    ladder measures the model-level cost)."""
    x, packed, s, _ = _mk(32, 512, 256, 128, seed=9)
    xq, sx = numerics.quantize_rowwise(x)
    a = np.asarray(w4a8_matmul(xq, sx, packed, s, group=128,
                               out_dtype=jnp.float32, interpret=True))
    b = np.asarray(w4a8_matmul(xq, sx, packed, s, group=128,
                               out_dtype=jnp.float32,
                               formulation="two_level", interpret=True))
    denom = np.abs(a).mean() + 1e-9
    assert np.abs(a - b).mean() / denom < 0.02, np.abs(a - b).mean() / denom


def test_w4a8_qlinear_mode_quality():
    """QLinear(mode='dynamic_int4') end-to-end: output tracks the fp layer
    (int4 weight noise + int8 activation noise)."""
    from protoquant_tpu.nn import QLinear, quantize_params
    from protoquant_tpu.utils.config import QuantConfig

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((32, 256)) * 0.5, jnp.float32)
    fp_layer = QLinear(features=384, mode="fp", dtype=jnp.float32)
    fp = fp_layer.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(fp_layer.apply(fp, x))

    q = quantize_params(fp, QuantConfig(mode="dynamic_int4", int4_group=64))
    layer = QLinear(features=384, mode="dynamic_int4", dtype=jnp.float32,
                    int4_group=64)
    got = np.asarray(layer.apply(q, x))
    cos = (got * ref).sum() / (
        np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12
    )
    assert cos > 0.995, cos


def test_w4a8_model_engine_and_cli(tmp_path, capsys):
    """dynamic_int4 through quantize_params + the Engine (batched ==
    sequential) and the CLI convert->generate round trip."""
    import json

    from protoquant_tpu.cli import main
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    fp = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    model = LlamaModel(cfg, mode="dynamic_int4", dtype=jnp.float32,
                       int4_group=32)
    params = quantize_params(fp, QuantConfig(mode="dynamic_int4",
                                             int4_group=32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    prompts = [[5, 9, 2, 7], [1, 2, 3]]
    seq = []
    for p in prompts:
        e = Engine(model, params, ecfg, kv_dtype=jnp.int8)
        rid = e.add_request(p, 8)
        seq.append(e.run()[rid])
    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for ref, rid in zip(seq, rids):
        assert outs[rid] == ref

    # CLI round trip with --mode dynamic_int4.
    rng = np.random.default_rng(0)
    D, I, V, kvh, H = 64, 128, 64, 2, 4
    kv = kvh * (D // H)
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32),
    }
    for i in range(2):
        pre = f"model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{pre}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for nme, shp in (("self_attn.q_proj", (D, D)), ("self_attn.k_proj", (kv, D)),
                         ("self_attn.v_proj", (kv, D)), ("self_attn.o_proj", (D, D)),
                         ("mlp.gate_proj", (I, D)), ("mlp.up_proj", (I, D)),
                         ("mlp.down_proj", (D, I))):
            sd[f"{pre}.{nme}.weight"] = 0.05 * rng.standard_normal(shp).astype(np.float32)
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **sd)
    cpath = tmp_path / "c.json"
    cpath.write_text(json.dumps({
        "vocab_size": V, "hidden_size": D, "intermediate_size": I,
        "num_hidden_layers": 2, "num_attention_heads": H,
        "num_key_value_heads": kvh, "max_position_embeddings": 128}))
    out = str(tmp_path / "ck_w4a8")
    main(["convert", "--weights", str(wpath), "--config", str(cpath),
          "--mode", "dynamic_int4", "--int4-group", "32", "--out", out])
    capsys.readouterr()
    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
