"""Multi-host SPMD correctness: 2 OS processes, jax.distributed, one global
mesh (SURVEY.md §4.2 item 4 — the multi-process half). Each process owns 4
virtual CPU devices; the global (2 data x 4 model) mesh spans both. The TP
forward must match a single-process reference on every host's shards."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from protoquant_tpu.parallel import init_multihost

    init_multihost(f"localhost:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.parallel import build_tp_score, shard_params, tp_model
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=32,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (4, 8)), jnp.int32
    )
    params = fp_model.init(jax.random.PRNGKey(0), tokens)  # same seed on all hosts
    ref = np.asarray(fp_model.apply(params, tokens))  # local single-dev reference

    devs = jax.devices()
    assert len(devs) == 4 * nproc
    mesh = Mesh(np.asarray(devs).reshape(nproc, 4), ("data", "model"))
    model_tp = tp_model(cfg, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    tok_sharded = jax.device_put(
        tokens, NamedSharding(mesh, P("data", None))
    )
    with mesh:
        logits = build_tp_score(model_tp, mesh, params)(sparams, tok_sharded)

    # Compare every locally-addressable shard against the reference.
    for shard in logits.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    print(f"proc{pid} OK", flush=True)
    """
)


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") == "1", reason="CPU-mesh test")
def test_two_process_tp_forward(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    port = "9923"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out
