"""Quickstart: the whole INT8 data path on a toy model, end to end.

Covers the reference's user journey (SURVEY.md §3.1-§3.4) in one script:
  1. QTensor        — quantize a weight, inspect payload/scales
  2. dynamic linear — rowquant + int8 matmul + fused dequant epilogue
  3. quantize_params — convert a whole model tree
  4. Engine         — continuous-batching generation over int8 KV

Runs anywhere (CPU included): `python examples/quickstart.py`
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from protoquant_tpu import QLinear, QTensor, quantize
from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig

rng = np.random.default_rng(0)

# 1. QTensor: per-channel symmetric int8 weight quantization ---------------
w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
qt = QTensor.quantize(w, axis=0)  # scale per output channel
err = float(jnp.max(jnp.abs(qt.dequantize() - w)))
print(f"QTensor: int8 payload {qt.data.shape} {qt.data.dtype}, "
      f"scales {qt.scale.shape}, max |dequant err| = {err:.4f}")

# 2. One dynamic-int8 linear (the reference's QLinear.forward path) --------
x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
xq = quantize(x, axis=-1)  # dynamic per-token activation quant (QTensor)
print(f"activation QTensor: payload {xq.data.shape}, per-token scales {xq.scale.shape}")
lin = QLinear(features=128, mode="dynamic")
params = lin.init(jax.random.PRNGKey(0), x)
y_q = lin.apply(params, x)  # rowquant -> int8 matmul -> fused epilogue
w_fp = params["params"]["qkernel"].dequantize()  # the layer's own weight
y_fp = x @ w_fp
cos = float(jnp.vdot(y_fp, y_q) / (jnp.linalg.norm(y_fp) * jnp.linalg.norm(y_q)))
print(f"QLinear(dynamic) vs fp matmul of the same weight: cosine = {cos:.6f}")

# 3. Convert a whole model (qlinear_from_linear analogue) ------------------
cfg = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128,
)
fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
fp_params = fp_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
q_params = quantize_params(fp_params)  # every projection -> QTensor
q_model = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
print("quantize_params: converted", cfg.num_hidden_layers, "layers")

# 4. Serve it: continuous batching with int8 KV ----------------------------
eng = Engine(
    q_model, q_params,
    EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                 max_new_tokens=12),
    kv_dtype=jnp.int8,
)
rids = [eng.add_request(list(p), 12) for p in ([5, 9, 2], [7, 7, 1, 3], [11])]
outputs = eng.run()
for rid in rids:
    print(f"request {rid}: {outputs[rid]}")
print("metrics:", {k: v for k, v in eng.metrics().items()
                   if k in ("tokens_generated", "steps", "prefills")})
