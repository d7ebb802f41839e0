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


FAIL_WORKER = textwrap.dedent(
    """
    import os, sys, time
    pid, nproc, port, hb_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from protoquant_tpu.parallel import init_multihost
    from protoquant_tpu.engine.health import Heartbeat

    init_multihost(f"localhost:{port}", nproc, pid)

    hb = Heartbeat(os.path.join(hb_dir, f"hb_{pid}"), interval_s=0.1)
    hb.start()
    # Barrier so both heartbeats exist before the fault is injected.
    while not all(
        os.path.exists(os.path.join(hb_dir, f"hb_{p}")) for p in range(nproc)
    ):
        time.sleep(0.05)

    if pid == 1:
        # Simulated host crash mid-serving: hard exit, no cleanup, heartbeat
        # thread dies with the process so the file goes stale.
        os._exit(17)

    # Survivor: watch the peer heartbeat; detection must fire once the peer
    # misses its beats (stale_after_s >> interval_s rules out jitter).
    peer = os.path.join(hb_dir, "hb_1")
    deadline = time.time() + 30
    while time.time() < deadline:
        if not Heartbeat.is_alive(peer, stale_after_s=1.0):
            print("proc0 DETECTED peer death", flush=True)
            hb.stop()
            # Hard exit: jax.distributed's shutdown barrier can never
            # complete with a dead peer (the coordination service would
            # fatal-kill us at interpreter exit). Real recovery re-execs
            # and re-inits over the remaining slice (ARCHITECTURE.md).
            os._exit(0)
        time.sleep(0.1)
    print("proc0 TIMEOUT without detection", flush=True)
    os._exit(1)
    """
)


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") == "1", reason="CPU-mesh test")
def test_two_process_peer_death_detected(tmp_path):
    """Failure path (SURVEY.md §5.3): one host of a 2-host slice dies mid-run;
    the surviving host's heartbeat monitor must detect it (the trigger for
    the re-init + replay-from-checkpoint recovery policy in ARCHITECTURE.md)."""
    script = tmp_path / "fail_worker.py"
    script.write_text(FAIL_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", "9931", str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert procs[1].returncode == 17, f"faulty proc:\n{outs[1][-2000:]}"
    assert procs[0].returncode == 0, f"survivor:\n{outs[0][-3000:]}"
    assert "DETECTED peer death" in outs[0]


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
