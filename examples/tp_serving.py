"""Tensor-parallel int8 serving on a device mesh — runnable without a pod.

Demonstrates the distribution tier (SURVEY.md §2.2): a (data=1, model=N)
mesh, Megatron column/row-parallel QLinears with int8 payload + scale
sharding, int8 KV sharded on the head axis, and the continuous-batching
engine stepping inside shard_map.

On a real slice the same code spans hosts (jax.distributed.initialize);
here it runs on 8 simulated CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/tp_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# Default to the simulated CPU mesh (this demo is about the sharding, not
# the silicon); set EXAMPLE_PLATFORM=tpu to run on a real slice instead.
if os.environ.get("EXAMPLE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
from protoquant_tpu.utils.config import MeshConfig, ModelConfig

tp = min(4, len(jax.devices()))
mesh = make_mesh(MeshConfig(dp=1, tp=tp), jax.devices()[:tp])
print(f"mesh: {mesh.shape} over {len(jax.devices())} {jax.devices()[0].platform} devices")

cfg = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=128,
)

# Build fp params once, quantize, then shard payloads+scales over the mesh.
fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
params = quantize_params(fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)))
model = tp_model(cfg, "dynamic", mesh, dtype=jnp.float32)
params = shard_params(params, mesh)

with mesh:
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=10),
        kv_dtype=jnp.int8,
        mesh=mesh,
    )
    rids = [eng.add_request(p, 10) for p in ([5, 9, 2], [8, 1, 1, 4])]
    out = eng.run()
for rid in rids:
    print(f"request {rid}: {out[rid]}")
