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


@pytest.mark.parametrize("mode", ["dynamic", "weight_only"])
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
    assert cos > 0.999, cos
    # Stacked experts quantized per-expert per-channel: scales [E, N].
    qk = qp["params"]["w1"]["qkernel"]
    assert qk.data.shape == (4, 32, 48) and qk.scale.shape == (4, 48)


@pytest.mark.parametrize("mode", ["fp", "dynamic"])
def test_moe_expert_parallel_matches_single_device(mode):
    """EP over a 4-way mesh axis == the unsharded MoE, exactly (fp) or to
    f32-reduction tolerance (dynamic: psum order differs from a local sum)."""
    from jax.sharding import Mesh, PartitionSpec as P
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
            QuantConfig(mode="dynamic"),
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
