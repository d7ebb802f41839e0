"""Mixture-of-experts (Mixtral-family) + expert parallelism.

Covers: routing/dispatch exactness vs an explicit per-token dense mixture,
capacity-overflow (dropped-token) semantics, quantized expert numerics,
EP shard_map == single-device, and LlamaModel integration (decode + cache).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.models.moe import MoEMLP, dispatch_combine, expert_capacity
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig, QuantConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=128, hidden_size=32, intermediate_size=48,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, num_local_experts=4, num_experts_per_tok=2,
    # Capacity >= k*N for the exactness tests: nothing is ever dropped.
    expert_capacity_factor=8.0,
)


def _mk_x(key, b=2, t=8):
    return jax.random.normal(key, (b, t, CFG.hidden_size), jnp.float32)


def _dense_mixture_reference(params, x, cfg):
    """Per-token explicit mixture: sum_k gate_val * SwiGLU_expert(x_token)."""
    p = params["params"]
    wg = np.asarray(p["gate"]["kernel"])  # [d, E]
    w1 = np.asarray(p["w1"]["kernel"])  # [E, d, I]
    w2 = np.asarray(p["w2"]["kernel"])  # [E, I, d]
    w3 = np.asarray(p["w3"]["kernel"])
    b, t, d = x.shape
    xf = np.asarray(x).reshape(-1, d)
    logits = xf @ wg
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    k = cfg.num_experts_per_tok
    out = np.zeros_like(xf)
    for n in range(xf.shape[0]):
        top = np.argsort(-probs[n])[:k]
        gv = probs[n][top] / probs[n][top].sum()
        for gval, e in zip(gv, top):
            h = xf[n] @ w1[e]
            silu = h / (1.0 + np.exp(-h))
            y = (silu * (xf[n] @ w3[e])) @ w2[e]
            out[n] += gval * y
    return out.reshape(b, t, d)


def test_moe_fp_matches_dense_mixture():
    m = MoEMLP(CFG, mode="fp", dtype=jnp.float32)
    x = _mk_x(jax.random.PRNGKey(1))
    params = m.init(jax.random.PRNGKey(0), x)
    got = np.asarray(m.apply(params, x))
    want = _dense_mixture_reference(params, x, CFG)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_capacity_overflow_drops_to_zero():
    """With capacity 1, an expert serves only the highest-priority token;
    every dropped (token, choice) contributes exactly 0 to the output."""
    n, e, k, c = 6, 2, 1, 1
    # All tokens pick expert 0; only the first fits.
    gi = jnp.zeros((n, k), jnp.int32)
    gv = jnp.ones((n, k), jnp.float32)
    dispatch, combine = dispatch_combine(gi, gv, e, c)
    assert float(dispatch.sum()) == 1.0
    assert float(dispatch[0, 0, 0]) == 1.0
    assert float(combine[1:].sum()) == 0.0


def test_moe_capacity_is_static():
    assert expert_capacity(16, CFG) == int(np.ceil(2 * 16 / 4 * 8.0))


@pytest.mark.parametrize("mode", ["dynamic", "weight_only",
                                  "weight_only_int4"])
def test_moe_quantized_close_to_fp(mode):
    m_fp = MoEMLP(CFG, mode="fp", dtype=jnp.float32)
    x = _mk_x(jax.random.PRNGKey(2))
    params = m_fp.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m_fp.apply(params, x))
    qp = quantize_params(params, QuantConfig(mode=mode))
    # Router must have stayed fp (structural skip) — same routing decisions.
    assert "kernel" in qp["params"]["gate"]
    got = np.asarray(MoEMLP(CFG, mode=mode, dtype=jnp.float32).apply(qp, x))
    cos = float((ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > (0.99 if mode == "weight_only_int4" else 0.999), cos
    qk = qp["params"]["w1"]["qkernel"]
    if mode == "weight_only_int4":
        # Group-packed stacked experts: [E, K/2, N] nibbles, [E, K/g, N]
        # scales (g = pick_int4_group(32, 128) = 32 -> one group).
        assert qk.data.shape == (4, 16, 48) and qk.scale.shape == (4, 1, 48)
    else:
        # Stacked experts quantized per-expert per-channel: scales [E, N].
        assert qk.data.shape == (4, 32, 48) and qk.scale.shape == (4, 48)


def test_moe_int4_matches_dequant_reference():
    """Stacked int4 experts compute exactly the mixture the DEQUANTIZED
    weights would: replace each packed expert with its unpacked*scales fp
    tensor and run mode='fp' — outputs agree to matmul tolerance."""
    from protoquant_tpu.core import numerics

    x = _mk_x(jax.random.PRNGKey(4))
    fp_params = MoEMLP(CFG, mode="fp", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x
    )
    qp = quantize_params(fp_params, QuantConfig(mode="weight_only_int4"))
    got = np.asarray(
        MoEMLP(CFG, mode="weight_only_int4", dtype=jnp.float32).apply(qp, x)
    )

    deq = {"params": dict(fp_params["params"])}
    for name in ("w1", "w2", "w3"):
        qk = qp["params"][name]["qkernel"]
        ws = []
        for e in range(qk.data.shape[0]):
            q = numerics.unpack_int4(qk.data[e], qk.group).astype(np.float32)
            s = np.repeat(np.asarray(qk.scale[e]), qk.group, axis=0)
            ws.append(q * s)
        deq["params"][name] = {"kernel": jnp.asarray(np.stack(ws))}
    ref = np.asarray(MoEMLP(CFG, mode="fp", dtype=jnp.float32).apply(deq, x))
    # The wo4 split kernel runs bf16-MXU lanes (activations round to bf16
    # inside the kernel); the fp reference einsum is f32 — bf16-level bound.
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2)


@pytest.mark.parametrize("mode", ["fp", "dynamic", "weight_only_int4"])
def test_moe_expert_parallel_matches_single_device(mode):
    """EP over a 4-way mesh axis == the unsharded MoE, exactly (fp) or to
    f32-reduction tolerance (dynamic: psum order differs from a local sum;
    int4: the per-expert group-packed kernel runs on each shard's slice)."""
    from jax.sharding import Mesh, PartitionSpec as P

    try:
        from jax import shard_map  # check_vma lives on the new API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("model",))

    x = _mk_x(jax.random.PRNGKey(3))
    m_ref = MoEMLP(CFG, mode=mode, dtype=jnp.float32)
    params = (
        m_ref.init(jax.random.PRNGKey(0), x)
        if mode == "fp"
        else quantize_params(
            MoEMLP(CFG, mode="fp", dtype=jnp.float32).init(jax.random.PRNGKey(0), x),
            QuantConfig(mode=mode),
        )
    )
    ref = np.asarray(m_ref.apply(params, x))

    m_ep = MoEMLP(CFG, mode=mode, dtype=jnp.float32, ep=4, ep_axis="model")

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if any(n in ("w1", "w2", "w3") for n in names):
            return P("model", *([None] * (leaf.ndim - 1)))  # expert axis
        return P()  # router + anything else replicated

    in_specs = jax.tree_util.tree_map_with_path(spec_for, params)

    @jax.jit
    def run(p, xx):
        f = shard_map(
            lambda pp, xv: m_ep.apply(pp, xv),
            mesh=mesh,
            in_specs=(in_specs, P()),
            out_specs=P(),
            check_vma=False,  # pallas calls (int4 experts) have no vma info
        )
        return f(p, xx)

    got = np.asarray(run(params, x))
    # psum reduces over the ring in a different order than the local einsum's
    # sum over E — f32-exactness up to reduction order only.
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_moe_llama_model_decode_with_cache():
    """MoE layers compose with the incremental KV-cache path: scoring a
    prompt then decoding step-by-step matches whole-sequence scoring."""
    from protoquant_tpu.models import init_cache

    model = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 9)), jnp.int32
    )
    fp_params = LlamaModel(CFG, mode="fp", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), toks
    )
    params = quantize_params(fp_params)

    full = np.asarray(model.apply(params, toks))  # no-cache scoring

    # f32 cache: KV round-trips exactly, so any cache-vs-scoring divergence
    # would be a routing/dispatch bug (bf16/int8 caches perturb attention
    # enough to flip near-tied router top-k on random weights).
    caches = init_cache(CFG, 1, 32, kv_dtype=jnp.float32)
    logits = None
    for i in range(toks.shape[1]):
        logits, caches = model.apply(
            params, toks[:, i : i + 1], jnp.asarray([[i]], jnp.int32), caches
        )
    np.testing.assert_allclose(
        logits[0, -1], full[0, -1], rtol=1e-4, atol=1e-4
    )
    assert int(np.argmax(logits[0, -1])) == int(np.argmax(full[0, -1]))


def test_hf_import_mixtral_layout():
    """Mixtral HF state dict (gate router + experts.{e}.w1/w2/w3) imports,
    matches init-param shapes, runs fp and quantized."""
    from protoquant_tpu.models.hf_import import import_hf_llama

    cfg = CFG
    rng = np.random.default_rng(7)
    d, i_sz, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    e = cfg.num_local_experts
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((v, d)).astype(np.float32),
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": rng.standard_normal((v, d)).astype(np.float32),
    }
    for li in range(cfg.num_hidden_layers):
        pre = f"model.layers.{li}"
        sd[f"{pre}.input_layernorm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.post_attention_layernorm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.self_attn.q_proj.weight"] = 0.05 * rng.standard_normal((d, d)).astype(np.float32)
        sd[f"{pre}.self_attn.k_proj.weight"] = 0.05 * rng.standard_normal((kv, d)).astype(np.float32)
        sd[f"{pre}.self_attn.v_proj.weight"] = 0.05 * rng.standard_normal((kv, d)).astype(np.float32)
        sd[f"{pre}.self_attn.o_proj.weight"] = 0.05 * rng.standard_normal((d, d)).astype(np.float32)
        sd[f"{pre}.block_sparse_moe.gate.weight"] = 0.05 * rng.standard_normal((e, d)).astype(np.float32)
        for ei in range(e):
            sd[f"{pre}.block_sparse_moe.experts.{ei}.w1.weight"] = 0.05 * rng.standard_normal((i_sz, d)).astype(np.float32)
            sd[f"{pre}.block_sparse_moe.experts.{ei}.w2.weight"] = 0.05 * rng.standard_normal((d, i_sz)).astype(np.float32)
            sd[f"{pre}.block_sparse_moe.experts.{ei}.w3.weight"] = 0.05 * rng.standard_normal((i_sz, d)).astype(np.float32)

    params = import_hf_llama(sd, cfg)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    # Shapes line up with a fresh init of the same config.
    ref_shapes = jax.tree_util.tree_map(
        lambda a: a.shape,
        model.init(jax.random.PRNGKey(0), jnp.asarray([[1, 2]], jnp.int32)),
    )
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    assert model.apply(params, toks).shape == (1, 3, v)
    qlogits = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32).apply(
        quantize_params(params), toks
    )
    assert np.all(np.isfinite(np.asarray(qlogits)))


def test_moe_engine_batched_equals_sequential():
    """Continuous batching over a Mixtral-style model: the engine's batched
    stream equals per-request greedy generation (int8 KV, chunked prefill)."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import greedy_generate

    model = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    fp_params = LlamaModel(CFG, mode="fp", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)
    )
    params = quantize_params(fp_params)
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=3, max_seq_len=32, prefill_chunk=8,
                     max_new_tokens=6, temperature=0.0),
        kv_dtype=jnp.int8,
    )
    prompts = [[3, 17, 5], [1, 2, 3, 4, 5], [9, 8]]
    rids = [eng.add_request(p, 6) for p in prompts]
    outs = eng.run()
    for rid, p in zip(rids, prompts):
        ref = list(
            np.asarray(
                greedy_generate(model, params, jnp.asarray([p], jnp.int32), 6,
                                32, kv_dtype=jnp.int8)
            )[0]
        )
        assert outs[rid] == ref, (outs[rid], ref)


def test_moe_tp_model_matches_unsharded():
    """Mixtral under tp_model: attention TP + expert-parallel MoE over a
    (1,4) mesh — scoring matches the unsharded model, and a cached TP decode
    step runs. Expert specs: stacked [E,K,N] shard on E (shardings.py)."""
    from protoquant_tpu.parallel import (
        build_tp_score, build_tp_step, make_mesh, make_tp_caches, shard_params,
        tp_model,
    )
    from protoquant_tpu.utils.config import MeshConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, num_local_experts=4, num_experts_per_tok=2,
        expert_capacity_factor=8.0,
    )
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, 128, (2, 8)), jnp.int32
    )
    fp_params = LlamaModel(cfg, mode="fp", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), toks
    )
    # Sharpen the routers: random-init router logits are near-tied, so the
    # psum reduction-order noise of the TP attention (1e-7 relative) flips
    # top-k choices and the comparison measures routing luck, not math.
    # 10x router weights give decisive margins; the comparison is then exact.
    for li in range(cfg.num_hidden_layers):
        g = fp_params["params"][f"layers_{li}"]["block_sparse_moe"]["gate"]
        g["kernel"] = g["kernel"] * 10.0
    params = quantize_params(fp_params, QuantConfig(mode="weight_only"))
    ref = np.asarray(
        LlamaModel(cfg, mode="weight_only", dtype=jnp.float32).apply(params, toks)
    )

    # weight_only is the exact-under-TP mode (dynamic re-derives per-token
    # scales over each shard's LOCAL contraction slice, so TP-dynamic differs
    # from unsharded by design — the dense TP tests pin that with cosine).
    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model = tp_model(cfg, "weight_only", mesh, dtype=jnp.float32)
    sp = shard_params(params, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model, mesh, params)(sp, toks))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # Decode step with int8 KV under the same mesh.
    caches = make_tp_caches(cfg, mesh, 2, 32, jnp.int8)
    step = build_tp_step(model, mesh, params, caches)
    with mesh:
        logits, caches = step(
            sp, toks[:, :4],
            jnp.broadcast_to(jnp.arange(4)[None], (2, 4)),
            caches, jnp.full((2,), 4, jnp.int32),
        )
    assert logits.shape == (2, 4, 128)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.parametrize("mode", ["fp", "dynamic"])
def test_moe_token_sharded_alltoall_matches_unsharded(mode):
    """Pod-scale EP: tokens sharded over the mesh axis, dispatched rows move
    to expert owners via all_to_all (int8 on the wire in dynamic mode), and
    the combine is local. With ample capacity this must match the unsharded
    MoE on the same global token set (dynamic is exact up to f32 reduction
    order: rowquant is per-row, so quantize-then-move == move-then-quantize)."""
    from jax.sharding import Mesh, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("model",))

    x = _mk_x(jax.random.PRNGKey(5), b=4, t=8)  # batch 4: one row per shard
    m_ref = MoEMLP(CFG, mode=mode, dtype=jnp.float32)
    fp_params = MoEMLP(CFG, mode="fp", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x
    )
    params = (
        fp_params if mode == "fp"
        else quantize_params(fp_params, QuantConfig(mode="dynamic"))
    )
    ref = np.asarray(m_ref.apply(params, x))

    m_ep = MoEMLP(
        CFG, mode=mode, dtype=jnp.float32, ep=4, ep_axis="model",
        token_sharded=True,
    )

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if any(n in ("w1", "w2", "w3") for n in names):
            return P("model", *([None] * (leaf.ndim - 1)))
        return P()

    in_specs = jax.tree_util.tree_map_with_path(spec_for, params)

    @jax.jit
    def run(p, xx):
        f = shard_map(
            lambda pp, xv: m_ep.apply(pp, xv),
            mesh=mesh,
            in_specs=(in_specs, P("model", None, None)),  # tokens sharded
            out_specs=P("model", None, None),
            check_vma=False,
        )
        return f(p, xx)

    got = np.asarray(run(params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_moe_engine_under_mesh_matches_single_device():
    """MoE model served by the continuous-batching engine on a dp=2 x tp=2
    mesh (experts sharded over the model axis = EP): token streams equal
    the single-device MoE engine exactly."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=4,
        num_experts_per_tok=2, expert_capacity_factor=8.0,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=32, prefill_chunk=16,
                        max_new_tokens=6, temperature=0.0)
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    ref_eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    ref_rids = [ref_eng.add_request(p, 6) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(cfg, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])
