"""Multi-host SPMD correctness: 2 OS processes, jax.distributed, one global
mesh (SURVEY.md §4.2 item 4 — the multi-process half). Each process owns 4
virtual CPU devices; the global (2 data x 4 model) mesh spans both. The TP
forward must match a single-process reference on every host's shards."""

import os
import subprocess
import sys
import textwrap

import pytest

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

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


# -- engine-level multi-process serving (VERDICT r2 item 4) -------------------

ENGINE_CFG_SRC = """
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    PROMPTS = [[3, 17, 5, 9], [7, 8, 9, 10, 11]]
"""

ENGINE_WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from protoquant_tpu.parallel import init_multihost

    init_multihost(f"localhost:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.parallel import shard_params, tp_model
    from protoquant_tpu.utils.config import ModelConfig
%s
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(1, 4 * nproc), ("data", "model"))
    model_tp = tp_model(cfg, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 8) for p in PROMPTS]
        outs = eng.run()
    print("RESULT " + json.dumps([outs[r] for r in rids]), flush=True)
    print(f"proc{pid} OK", flush=True)
    """ % ENGINE_CFG_SRC
)


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") == "1", reason="CPU-mesh test")
def test_two_process_engine_serving(tmp_path):
    """The FULL continuous-batching Engine under jax.distributed: a tp=8
    mesh spanning 2 OS processes serves the same requests as a single-device
    engine, token-for-token, on both hosts."""
    script = tmp_path / "engine_worker.py"
    script.write_text(ENGINE_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", "9941"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out

    # Single-process reference with the same seed/config.
    import json

    import jax
    import jax.numpy as jnp

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 8) for p in [[3, 17, 5, 9], [7, 8, 9, 10, 11]]]
    ref = [eng.run()[r] for r in rids]

    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        got = json.loads(line[len("RESULT "):])
        assert got == ref, (pid, got, ref)


RECOVERY_WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    mode = sys.argv[1]  # "serve" | "recover"
    pid, nproc, port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    hb_dir, journal, ckpt, out_path = sys.argv[5:9]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from protoquant_tpu.engine import (
        Engine, EngineConfig, RequestJournal, journaled_add_request,
        replay_unfinished, serve_until_peer_failure,
    )
    from protoquant_tpu.engine.health import Heartbeat
    from protoquant_tpu.engine.recovery import wait_for_peers
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.checkpoint import restore_checkpoint
    from protoquant_tpu.utils.config import ModelConfig
%s
    if mode == "serve":
        # MUST precede any jax computation (backend init) in this process.
        from protoquant_tpu.parallel import init_multihost

        init_multihost(f"localhost:{port}", nproc, pid)

    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    example = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    if mode == "recover":
        # Survivor slice (1 host): orbax restore + journal replay. Greedy
        # decode reproduces the exact stream the dead slice would have made.
        params = restore_checkpoint(ckpt, example)
        eng = Engine(fp_model, params, ecfg, kv_dtype=jnp.float32)
        mapping = replay_unfinished(eng, journal)
        assert mapping, "nothing to replay - peer died after completion?"
        outs = eng.run()
        json.dump({str(o): outs[n] for o, n in mapping.items()},
                  open(out_path, "w"))
        print("RECOVERED", flush=True)
        sys.exit(0)

    # mode == "serve": 2-host slice, proc1 dies mid-generation.
    from jax.sharding import Mesh

    from protoquant_tpu.parallel import shard_params, tp_model

    hb = Heartbeat(os.path.join(hb_dir, f"hb_{pid}"), interval_s=0.1)
    hb.start()
    wait_for_peers(hb_dir, nproc)

    # Restore on-host (numpy) so shard_params device_puts each process's
    # LOCAL copy onto the global mesh (no cross-host transfer needed).
    params = jax.tree_util.tree_map(
        np.asarray, restore_checkpoint(ckpt, example)
    )
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(1, 4 * nproc), ("data", "model"))
    model_tp = tp_model(cfg, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)

    jl = RequestJournal(journal) if pid == 0 else None
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        seen = {"n": 0}

        def crash_cb(rid, tok):
            # Injected fault: proc1 hard-exits mid-generation (4 tokens into
            # the first request), heartbeat goes stale, collectives die.
            seen["n"] += 1
            if pid == 1 and seen["n"] >= 4:
                os._exit(17)

        for p in PROMPTS:
            if jl is not None:
                journaled_add_request(eng, jl, p, 8)
            else:
                eng.add_request(p, 8, on_token=crash_cb)
        status, info = serve_until_peer_failure(
            eng, [os.path.join(hb_dir, f"hb_{q}") for q in range(nproc)
                  if q != pid],
            stale_after_s=5.0,
        )
    if status == "peer_died":
        print("PEER_DIED " + json.dumps(info), flush=True)
        # jax.distributed cannot be re-entered over a half-dead slice:
        # hard-exit; the supervisor re-execs us into the recovery path.
        os._exit(3)
    print("COMPLETED " + json.dumps(info), flush=True)
    os._exit(0)
    """ % ENGINE_CFG_SRC
)


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") == "1", reason="CPU-mesh test")
def test_engine_recovery_after_peer_death(tmp_path):
    """SURVEY §5.3 end-to-end: one of two serving hosts dies mid-generation;
    the survivor DETECTS (stale heartbeat), aborts, and the supervisor
    re-launches it as a 1-host slice that restores the orbax checkpoint and
    REPLAYS the journaled unfinished requests — producing exactly the tokens
    the uninterrupted run would have."""
    import json

    import jax
    import jax.numpy as jnp

    from protoquant_tpu.engine import Engine, EngineConfig, RequestJournal
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.checkpoint import save_checkpoint
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    prompts = [[3, 17, 5, 9], [7, 8, 9, 10, 11]]

    # The checkpoint every slice (re)starts from.
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, params)

    # Uninterrupted reference.
    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 8) for p in prompts]
    ref_outs = eng.run()
    ref = {str(i): ref_outs[r] for i, r in enumerate(rids)}

    script = tmp_path / "recovery_worker.py"
    script.write_text(RECOVERY_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    journal = str(tmp_path / "journal.jsonl")
    out_path = str(tmp_path / "recovered.json")
    common = [str(tmp_path), journal, ckpt, out_path]

    # Phase 1: 2-host serving; proc1 crashes mid-generation.
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), "serve", str(pid), "2", "9951",
             *common],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert procs[1].returncode == 17, f"faulty proc:\n{outs[1][-2000:]}"
    assert procs[0].returncode == 3, f"survivor:\n{outs[0][-3000:]}"
    assert "PEER_DIED" in outs[0]

    # The journal recorded the admissions and partial progress.
    unfinished = RequestJournal.unfinished(journal)
    assert len(unfinished) >= 1, unfinished

    # Phase 2: supervisor re-execs the survivor as a 1-host slice.
    rec = subprocess.Popen(
        [sys.executable, str(script), "recover", "0", "1", "9951", *common],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo",
    )
    rout = rec.communicate(timeout=300)[0].decode()
    assert rec.returncode == 0, f"recovery:\n{rout[-3000:]}"
    assert "RECOVERED" in rout

    # Replayed outputs == the uninterrupted reference, token-for-token.
    recovered = json.load(open(out_path))
    for old_rid, toks in recovered.items():
        assert toks == ref[old_rid], (old_rid, toks, ref[old_rid])
