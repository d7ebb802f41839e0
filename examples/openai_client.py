"""OpenAI-compatible serving, end to end — no OpenAI SDK required.

Starts an in-process EngineServer over a toy int8 model, then talks to it
exactly the way an OpenAI client would:

  1. GET  /v1/models            — discovery
  2. POST /v1/completions       — prompt (token ids here), n, seed, logprobs
  3. POST /v1/chat/completions  — messages through the chat template
  4. streaming                  — SSE chunks ending in `data: [DONE]`

Point any OpenAI client at `base_url=f"http://127.0.0.1:{port}/v1"` with a
dummy api key; production serving is `python -m protoquant_tpu.cli serve
--ckpt ckpt/ --tokenizer tokenizer.json --model-name my-model`.

Runs anywhere (CPU included): `python examples/openai_client.py`
"""

import json
import os
import sys
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.engine.server import EngineServer
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig


def main():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = quantize_params(
        fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    )
    model = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=16, temperature=0.0),
        kv_dtype=jnp.int8,
    )
    srv = EngineServer(eng, port=0, model_name="toy-int8").start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return json.load(r)

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.load(r)

    try:
        print("models:", [m["id"] for m in get("/v1/models")["data"]])

        # Completions: token-id prompt (no tokenizer on this toy server),
        # 2 seeded samples, 2 logprob alternatives per position.
        r = post("/v1/completions", {
            "prompt": [3, 17, 5, 9], "max_tokens": 6, "n": 2,
            "temperature": 0.8, "seed": 7, "logprobs": 2,
        })
        for c in r["choices"]:
            print(f"choice {c['index']}: tokens={c['tokens']} "
                  f"finish={c['finish_reason']}")
        print("usage:", r["usage"])

        # Chat (string content needs a tokenizer in production; the toy
        # server rejects it honestly).
        try:
            post("/v1/chat/completions",
                 {"messages": [{"role": "user", "content": "hi"}]})
        except urllib.error.HTTPError as e:
            print("chat without tokenizer ->", e.code,
                  json.load(e)["error"][:40], "...")

        # Streaming: SSE chunks, then [DONE].
        req = urllib.request.Request(
            base + "/v1/completions",
            data=json.dumps({"prompt": [1, 2, 3], "max_tokens": 5,
                             "stream": True}).encode(),
        )
        pieces = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            for raw in resp:
                line = raw.decode().strip()
                if line.startswith("data: ") and line != "data: [DONE]":
                    ev = json.loads(line[6:])
                    pieces.append(ev["choices"][0].get("text", ""))
        print("streamed pieces:", pieces)
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
